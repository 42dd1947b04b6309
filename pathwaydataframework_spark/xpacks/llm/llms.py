"""LLM chat wrappers — reference ``xpacks/llm/llms.py``.

Reference: ``BaseChat`` (llms.py:27, a pw.UDF subclass), with service
flavors ``OpenAIChat``:84, ``LiteLLMChat``:313, ``HFPipelineChat``:441,
``CohereChat``:544, and the message helper ``prompt_chat_single_qa``.

Spark-first restatement: a chat is a Column → Column operator backed by ONE
Arrow-batched UDF; messages travel as a JSON string column (list of
``{"role", "content"}`` dicts — the wire format every chat API shares).
The service flavors keep the reference's constructor/call shape and import
their client lazily at executor call time; in this hermetic image they
raise a clear error unless a ``client_factory`` is injected (the same
injectable-client pattern as the engine's HTTP/NATS sinks).  The
deterministic in-engine chat is :class:`InjectableChat` — wrap any
``messages -> str`` callable (a rules engine, a local model, a test fake)
and it runs distributed with the engine's retry/cache strategies.

Scale note: chat calls are the slow path by definition (network I/O per
row).  The UDF is Arrow-batched so transfer cost is amortized; use
``retry_strategy``/``cache_strategy`` (internals/udfs.py) for flakiness
and dedup, and pre-filter the frame so only rows that NEED a completion
reach the chat column.
"""

from __future__ import annotations

import json
from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column

from pathwaydataframework_spark.internals import udfs as _udfs

__all__ = [
    "BaseChat",
    "InjectableChat",
    "OpenAIChat",
    "LiteLLMChat",
    "HFPipelineChat",
    "CohereChat",
    "prompt_chat_single_qa",
]


def prompt_chat_single_qa(question: Column) -> Column:
    """One-user-message chat payload from a text column — reference
    ``llms.prompt_chat_single_qa`` (llms.py:222 usage).  Pure column
    expression (to_json over a struct array): no Python crossing."""
    # coalesce: to_json drops null fields, and a {"role": ...}-only message
    # would break every chat client's messages[i]["content"] access
    return F.to_json(
        F.array(
            F.struct(
                F.lit("user").alias("role"),
                F.coalesce(question, F.lit("")).alias("content"),
            )
        )
    )


class BaseChat:
    """Reference BaseChat (llms.py:27).  Subclasses implement
    ``__wrapped__(messages: list[dict], **kwargs) -> str | None``; calling
    the chat on a messages Column appends one Arrow-batched UDF stage.

    Args:
        capacity / retry_strategy / cache_strategy: same contract as the
            engine UDF machinery (internals/udfs.py) — retries and caching
            wrap the per-row call inside the executor.
        model: default model name, exposed via ``.model``.
    """

    def __init__(
        self,
        *,
        model: str | None = None,
        retry_strategy=None,
        cache_strategy=None,
        capacity: int | None = None,  # accepted for parity; Spark's task
        # parallelism bounds concurrent calls instead of an async semaphore
        **call_defaults,
    ):
        self._model = model
        self._retry_strategy = retry_strategy
        self._cache_strategy = cache_strategy
        self._call_defaults = dict(call_defaults)

    @property
    def model(self) -> str | None:
        return self._model

    def __wrapped__(self, messages: list[dict], **kwargs) -> str | None:
        raise NotImplementedError

    def _accepts_call_arg(self, arg_name: str) -> bool:
        """Reference BaseChat._accepts_call_arg (llms.py:48)."""
        import inspect

        try:
            sig = inspect.signature(self.__wrapped__)
        except (TypeError, ValueError):
            return False
        if any(
            p.kind is inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values()
        ):
            return True
        return arg_name in sig.parameters

    def __call__(self, messages: Column, **kwargs) -> Column:
        defaults = {**self._call_defaults, **kwargs}
        if self._model is not None:
            defaults.setdefault("model", self._model)
        inner = self.__wrapped__
        if self._retry_strategy is not None:
            inner = self._retry_strategy.wrap(inner)
        if self._cache_strategy is not None:
            inner = self._cache_strategy.wrap(inner)

        def run(payload: str) -> str | None:
            if payload is None:
                return None
            return inner(json.loads(payload), **defaults)

        sudf = F.udf(run, "string", useArrow=True).asNondeterministic()
        return sudf(messages)


class InjectableChat(BaseChat):
    """The in-engine chat: wrap any ``(messages: list[dict], **kw) -> str``
    callable.  The deterministic/testable path, and the extension point
    for custom clients (same injectable pattern as the engine's sinks).

    >>> chat = InjectableChat(lambda msgs, **kw: msgs[-1]["content"].upper())
    >>> d = spark.createDataFrame([("hi",)], "q string")
    >>> d.select(chat(prompt_chat_single_qa(F.col("q"))).alias("a")).first()["a"]
    'HI'
    """

    def __init__(self, fn: Callable, **kwargs):
        super().__init__(**kwargs)
        self._fn = fn

    def __wrapped__(self, messages: list[dict], **kwargs) -> str | None:
        return self._fn(messages, **kwargs)


class _ServiceChat(BaseChat):
    """Shared shape for external-service chats: the client library is
    imported lazily INSIDE the executor call (so the driver plan builds
    without it), and a ``client_factory`` can be injected for testing or
    for custom transports."""

    _service = "external service"

    def __init__(self, *, client_factory: Callable | None = None, **kwargs):
        super().__init__(**kwargs)
        self._client_factory = client_factory

    def _make_client(self):
        raise RuntimeError(
            f"{type(self).__name__}: the {self._service} client library is not "
            "available in this environment; pass client_factory= (a zero-arg "
            "callable returning an object with a compatible completion API) "
            "or use InjectableChat."
        )

    def _complete(self, client, messages: list[dict], **kwargs) -> str | None:
        raise NotImplementedError

    def __wrapped__(self, messages: list[dict], **kwargs) -> str | None:
        factory = self._client_factory or self._make_client
        return self._complete(factory(), messages, **kwargs)


class OpenAIChat(_ServiceChat):
    """Reference OpenAIChat (llms.py:84) — chat-completions call shape."""

    _service = "openai"

    def _make_client(self):
        try:
            import openai  # type: ignore[import-not-found]
        except ImportError:
            return super()._make_client()
        return openai.OpenAI()

    def _complete(self, client, messages, **kwargs):
        resp = client.chat.completions.create(messages=messages, **kwargs)
        return resp.choices[0].message.content


class LiteLLMChat(_ServiceChat):
    """Reference LiteLLMChat (llms.py:313) — provider-routing completion."""

    _service = "litellm"

    def _make_client(self):
        try:
            import litellm  # type: ignore[import-not-found]
        except ImportError:
            return super()._make_client()
        return litellm

    def _complete(self, client, messages, **kwargs):
        resp = client.completion(messages=messages, **kwargs)
        return resp.choices[0].message.content


class HFPipelineChat(_ServiceChat):
    """Reference HFPipelineChat (llms.py:441) — local transformers
    pipeline; the pipeline object is the 'client'."""

    _service = "transformers"

    def __init__(self, model: str | None = None, **kwargs):
        super().__init__(model=model, **kwargs)

    def _make_client(self):
        try:
            import transformers  # type: ignore[import-not-found]
        except ImportError:
            return super()._make_client()
        return transformers.pipeline("text-generation", model=self._model)

    def _complete(self, client, messages, **kwargs):
        out = client(messages, **kwargs)
        first = out[0] if isinstance(out, list) else out
        text = first.get("generated_text", first) if isinstance(first, dict) else first
        if isinstance(text, list):  # chat-format pipelines return message lists
            return text[-1].get("content")
        return text


class CohereChat(_ServiceChat):
    """Reference CohereChat (llms.py:544) — chat endpoint with citations
    folded into the text response."""

    _service = "cohere"

    def _make_client(self):
        try:
            import cohere  # type: ignore[import-not-found]
        except ImportError:
            return super()._make_client()
        return cohere.Client()

    def _complete(self, client, messages, **kwargs):
        history = [
            {"role": m["role"], "message": m["content"]} for m in messages[:-1]
        ]
        resp = client.chat(
            message=messages[-1]["content"], chat_history=history, **kwargs
        )
        return resp.text


# engine retry/cache strategies re-exported for chat construction parity
FixedDelayRetryStrategy = _udfs.FixedDelayRetryStrategy
ExponentialBackoffRetryStrategy = _udfs.ExponentialBackoffRetryStrategy
InMemoryCache = _udfs.InMemoryCache
DiskCache = _udfs.DiskCache

"""Embedder family — reference ``xpacks/llm/embedders.py`` (BaseEmbedder
:40, OpenAIEmbedder :85, LiteLLMEmbedder, SentenceTransformerEmbedder,
GeminiEmbedder).

Spark-first: an embedder is a callable column transform lowered to an
Arrow-batched pandas UDF.  The service classes take the reference's
constructor kwargs; the actual client is INJECTABLE (``embed_fn=``) —
the provider SDKs are not in this container, and on a cluster the same
wrapper calls the real client per Arrow batch (same injectable-client
pattern as the engine's HTTP/NATS sinks and the chat family in llms.py).
Without an injected client the embedder falls back to the deterministic
:class:`~pathwaydataframework_spark.operators.embedders.HashingEmbedder`
vector of the requested dimension — clearly documented fake, so pipelines
remain runnable and testable offline.
"""

from __future__ import annotations

from typing import Any, Callable

import pyspark.sql.functions as F
from pyspark.sql import Column

from pathwaydataframework_spark.operators.embedders import hashing_embedding


class BaseEmbedder:
    """Reference embedders.py:40 — callable (text column → vector column)."""

    def __init__(self, *, embed_fn: Callable | None = None, dim: int = 64, **kwargs: Any):
        self._embed_fn = embed_fn
        self._dim = dim
        self._kwargs = kwargs

    def __call__(self, input: Column, **kwargs: Any) -> Column:  # noqa: A002 — reference arg name
        if self._embed_fn is None:
            # deterministic offline fallback — the hashing embedding is a
            # real column expression (no Python at all)
            return hashing_embedding(input, dim=self._dim)
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        fn = self._embed_fn
        call_kwargs = {**self._kwargs, **kwargs}

        def _embed(texts):
            return pd.Series([list(map(float, fn(t, **call_kwargs))) for t in texts])

        _embed.__annotations__ = {"texts": pd.Series, "return": pd.Series}
        udf = pandas_udf(_embed, "array<double>")
        return udf(input)

    def get_embedding_dimension(self, **kwargs: Any) -> int:
        if self._embed_fn is not None:
            return len(self._embed_fn("pathway", **{**self._kwargs, **kwargs}))
        return self._dim


class OpenAIEmbedder(BaseEmbedder):
    """Reference embedders.py:85 — model/encoding_format/user/... kwargs
    accepted; client injectable via ``embed_fn``."""

    def __init__(self, *, model: str = "text-embedding-3-small", capacity=None,
                 retry_strategy=None, cache_strategy=None, **kwargs: Any):
        super().__init__(**kwargs)
        self.model = model


class LiteLLMEmbedder(BaseEmbedder):
    """Reference embedders.py — LiteLLM routing wrapper."""

    def __init__(self, *, model: str = "", capacity=None, retry_strategy=None,
                 cache_strategy=None, **kwargs: Any):
        super().__init__(**kwargs)
        self.model = model


class SentenceTransformerEmbedder(BaseEmbedder):
    """Reference embedders.py — local sentence-transformers model; the
    library is not in this container, so pass ``embed_fn=model.encode``."""

    def __init__(self, model: str = "", call_kwargs: dict | None = None, **kwargs: Any):
        super().__init__(**kwargs)
        self.model = model
        self.call_kwargs = call_kwargs or {}


class GeminiEmbedder(BaseEmbedder):
    """Reference embedders.py — Google Gemini embedding service."""

    def __init__(self, *, model: str = "", capacity=None, retry_strategy=None,
                 cache_strategy=None, **kwargs: Any):
        super().__init__(**kwargs)
        self.model = model

"""UDF surface — reference ``@pw.udf`` / ``pw.UDF`` (internals/udfs/
__init__.py:290,68), caching (udfs/caches.py), retries (udfs/retries.py).

UDFs are the slow path: everything expressible with built-in functions
should use them (SURVEY.md §2.8).  When unavoidable:

- scalar ``@udf`` → Arrow-optimized Python UDF (batched transfer)
- ``@pandas_udf`` passthrough → vectorized over Arrow batches
- retries wrap the Python callable (reference retries.py semantics)
- ``InMemoryCache`` memoizes per-executor (reference caches.py:120); the
  disk-cache strategy is deferred to a Delta memo-join in a later round.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable

import pyspark.sql.functions as F

from pathwaydataframework_spark.internals.expression import (
    Expr,
    FuncExpr,
    _dtype_to_spark,
    lift,
)


class FixedDelayRetryStrategy:
    """Reference retries.py:107."""

    def __init__(self, max_retries: int = 3, delay_ms: int = 100):
        self.max_retries = max_retries
        self.delay_s = delay_ms / 1000

    def wrap(self, fn: Callable) -> Callable:
        @functools.wraps(fn)
        def inner(*args, **kwargs):
            last = None
            for _ in range(self.max_retries):
                try:
                    return fn(*args, **kwargs)
                except Exception as e:  # noqa: BLE001
                    last = e
                    time.sleep(self.delay_s)
            raise last

        return inner


class ExponentialBackoffRetryStrategy(FixedDelayRetryStrategy):
    """Reference retries.py:58."""

    def __init__(self, max_retries: int = 3, initial_delay_ms: int = 100, backoff_factor: float = 2.0):
        super().__init__(max_retries, initial_delay_ms)
        self.backoff_factor = backoff_factor

    def wrap(self, fn: Callable) -> Callable:
        @functools.wraps(fn)
        def inner(*args, **kwargs):
            last = None
            delay = self.delay_s
            for _ in range(self.max_retries):
                try:
                    return fn(*args, **kwargs)
                except Exception as e:  # noqa: BLE001
                    last = e
                    time.sleep(delay)
                    delay *= self.backoff_factor
            raise last

        return inner


class InMemoryCache:
    """Per-executor memoization — reference caches.py:120."""

    def wrap(self, fn: Callable) -> Callable:
        cache: dict[tuple, Any] = {}

        @functools.wraps(fn)
        def inner(*args):
            key = args
            if key not in cache:
                cache[key] = fn(*args)
            return cache[key]

        return inner


class DiskCache:
    """Persistent per-executor memoization — reference caches.py:35
    ``DiskCache``: results survive across runs in ``cache_dir`` (one pickle
    file per distinct argument tuple, content-addressed, atomic rename).

    This is the drop-in per-call strategy; for expensive UDFs over data
    with heavy argument repetition, prefer ``apply_with_disk_cache`` below
    — a distributed memo-JOIN that computes each distinct argument tuple
    once per cluster (not once per executor) and never touches Python for
    cache hits.
    """

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir

    def wrap(self, fn: Callable) -> Callable:
        import hashlib
        import os
        import pickle

        cache_dir = self.cache_dir

        @functools.wraps(fn)
        def inner(*args):
            os.makedirs(cache_dir, exist_ok=True)
            key = hashlib.sha256(repr(args).encode()).hexdigest()
            path = os.path.join(cache_dir, key + ".pkl")
            if os.path.exists(path):
                with open(path, "rb") as f:
                    return pickle.load(f)
            result = fn(*args)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump(result, f)
            os.replace(tmp, path)
            return result

        return inner


def apply_with_disk_cache(
    table,
    fn: Callable,
    args: list[str],
    *,
    out_name: str,
    out_type: Any,
    cache_path: str,
):
    """Memo-join UDF application — the 100 TB shape of a disk cache.

    1. distinct argument tuples are extracted (one shuffle, tiny output),
    2. previously-computed results are joined in from the parquet memo
       table at ``cache_path`` (cache hits never invoke Python),
    3. only MISSES run the UDF, once per distinct tuple cluster-wide,
    4. misses are appended to the memo table (idempotent: re-appends are
       deduplicated on read),
    5. results join back to the input on the argument columns.

    Everything is DataFrame ops — no driver collect, no per-row disk IO.
    """
    import os

    from pathwaydataframework_spark.internals.table import Table

    df = table.df
    spark = df.sparkSession
    spark_type = _dtype_to_spark(out_type)
    sudf = F.udf(fn, spark_type, useArrow=True)

    distinct = df.select(*args).distinct()
    if os.path.exists(cache_path):
        memo = spark.read.parquet(cache_path).dropDuplicates(args)
        hits = distinct.join(memo, on=args, how="inner")
        misses = distinct.join(memo, on=args, how="left_anti")
    else:
        memo = None
        hits = None
        misses = distinct
    computed = misses.withColumn(out_name, sudf(*[F.col(c) for c in args]))
    computed.write.mode("append").parquet(cache_path)
    results = spark.read.parquet(cache_path).dropDuplicates(args)
    return Table(df.join(results, on=args, how="left"))


class UDF:
    """Callable wrapper: ``my_udf(pw.this.x)`` builds an expression.

    Reference ``UDF`` class (udfs/__init__.py:68).  Async callables
    (``async def``) are bridged with a per-call event loop inside the
    worker — the semantic equivalent of ``pw.apply_async``
    (common.py:170); for high-fanout async I/O prefer
    ``operators.stateful.AsyncTransformer`` (batched concurrency).
    """

    def __init__(
        self,
        fn: Callable,
        return_type: Any = "string",
        *,
        deterministic: bool = True,
        cache_strategy=None,
        retry_strategy=None,
    ):
        import asyncio
        import inspect

        if inspect.iscoroutinefunction(fn):
            coro_fn = fn

            def fn(*args, _coro_fn=coro_fn, **kwargs):  # noqa: F811
                return asyncio.run(_coro_fn(*args, **kwargs))

            import functools as _ft

            _ft.update_wrapper(fn, coro_fn)
        wrapped = fn
        if retry_strategy is not None:
            wrapped = retry_strategy.wrap(wrapped)
        if cache_strategy is not None:
            wrapped = cache_strategy.wrap(wrapped)
        self._fn = wrapped
        self._spark_type = _dtype_to_spark(return_type)
        self._deterministic = deterministic
        functools.update_wrapper(self, fn)

    def __call__(self, *args) -> Expr:
        sudf = F.udf(self._fn, self._spark_type, useArrow=True)
        if not self._deterministic:
            sudf = sudf.asNondeterministic()
        return FuncExpr(lambda *cs: sudf(*cs), *[lift(a) for a in args])


def udf(
    fn: Callable | None = None,
    *,
    return_type: Any = "string",
    deterministic: bool = True,
    cache_strategy=None,
    retry_strategy=None,
):
    """``@pw.udf`` decorator — reference udfs/__init__.py:290.

    Infers the return type from the annotation when present::

        @pw.udf
        def double(x: int) -> int:
            return x * 2
    """

    def build(f: Callable) -> UDF:
        rt = return_type
        ann = getattr(f, "__annotations__", {})
        if "return" in ann and return_type == "string":
            rt = ann["return"]
        return UDF(
            f,
            rt,
            deterministic=deterministic,
            cache_strategy=cache_strategy,
            retry_strategy=retry_strategy,
        )

    if fn is not None:
        return build(fn)
    return build


# -- reference-namespace parity (pathway.udfs __all__) ----------------------
# One parameterized UDF implementation serves every reference flavor; the
# names below are the reference's per-flavor entry points
# (reference internals/udfs/__init__.py:52 __all__, executors.py, caches.py,
# utils.py:18) expressed as aliases / thin wrappers over it.

import abc as _abc
import dataclasses as _dc


class CacheStrategy(_abc.ABC):
    """Reference udfs/caches.py:23 — base for cache strategies; both
    concrete caches subclass it so isinstance checks work."""

    @_abc.abstractmethod
    def wrap(self, fn):  # pragma: no cover - interface
        ...


# retrofit the concrete classes under the reference bases
CacheStrategy.register(InMemoryCache)
CacheStrategy.register(DiskCache)


class DefaultCache(DiskCache):
    """Reference udfs/caches.py:108 — DefaultCache IS DiskCache there too."""


class AsyncRetryStrategy(_abc.ABC):
    """Reference udfs/retries.py base class."""

    @_abc.abstractmethod
    def wrap(self, fn):  # pragma: no cover - interface
        ...


AsyncRetryStrategy.register(FixedDelayRetryStrategy)
AsyncRetryStrategy.register(ExponentialBackoffRetryStrategy)


class NoRetryStrategy:
    """Reference udfs/retries.py — the do-nothing strategy."""

    def wrap(self, fn):
        return fn


UDFSync = UDF  # reference udfs/__init__.py:214 — sync flavor
UDFAsync = UDF  # reference udfs/__init__.py:405 — async handled by UDF itself


def udf_async(fn=None, **kwargs):
    """Reference udfs/__init__.py:449 (deprecated there in favor of ``udf``
    with an async callable — same here: ``udf`` detects coroutines)."""
    return udf(fn, **kwargs)


def coerce_async(fn):
    """Reference udfs/utils.py:18 — return an async-callable version of fn
    (already-async functions pass through)."""
    import asyncio
    import functools as _ft
    import inspect

    if inspect.iscoroutinefunction(fn):
        return fn

    @_ft.wraps(fn)
    async def wrapper(*args, **kwargs):
        return await asyncio.to_thread(fn, *args, **kwargs)

    return wrapper


@_dc.dataclass(frozen=True)
class _ExecutorSpec:
    """Executor factories (reference udfs/executors.py:45,101,149).  The
    Spark engine always executes UDFs inside Arrow-batched workers; the
    spec records capacity/timeout/retry so ``udf``-level wrappers apply
    them (timeout/retry wrap the callable; capacity bounds the async
    semaphore in AsyncTransformer)."""

    kind: str
    capacity: int | None = None
    timeout: float | None = None
    retry_strategy: object | None = None


def auto_executor() -> _ExecutorSpec:
    return _ExecutorSpec("auto")


def sync_executor() -> _ExecutorSpec:
    return _ExecutorSpec("sync")


def async_executor(
    *, capacity: int | None = None, timeout: float | None = None,
    retry_strategy=None,
) -> _ExecutorSpec:
    return _ExecutorSpec("async", capacity, timeout, retry_strategy)


def with_cache_strategy(fn, cache_strategy):
    """Reference udfs/caches.py:141 — wrap a callable with a cache."""
    return cache_strategy.wrap(fn)


def with_retry_strategy(fn, retry_strategy):
    """Reference udfs/executors.py — wrap a callable with retries."""
    return retry_strategy.wrap(fn)


def with_capacity(fn, capacity: int):
    """Reference udfs/executors.py:227 — bound concurrent executions of an
    async callable with a semaphore."""
    import asyncio
    import functools as _ft

    sem = asyncio.Semaphore(capacity)
    afn = coerce_async(fn)

    @_ft.wraps(fn)
    async def wrapper(*args, **kwargs):
        async with sem:
            return await afn(*args, **kwargs)

    return wrapper


def with_timeout(fn, timeout: float):
    """Reference udfs/executors.py:253 — fail the call after ``timeout``
    seconds."""
    import asyncio
    import functools as _ft

    afn = coerce_async(fn)

    @_ft.wraps(fn)
    async def wrapper(*args, **kwargs):
        return await asyncio.wait_for(afn(*args, **kwargs), timeout)

    return wrapper


def async_options(**kwargs):
    """Reference udfs/executors.py:286 — decorator attaching async executor
    options (capacity/timeout/retry_strategy) to a callable."""

    def deco(fn):
        wrapped = fn
        if "retry_strategy" in kwargs and kwargs["retry_strategy"] is not None:
            wrapped = kwargs["retry_strategy"].wrap(wrapped)
        if "timeout" in kwargs and kwargs["timeout"] is not None:
            wrapped = with_timeout(wrapped, kwargs["timeout"])
        if "capacity" in kwargs and kwargs["capacity"] is not None:
            wrapped = with_capacity(wrapped, kwargs["capacity"])
        return wrapped

    return deco

"""Text splitters / chunkers — the chunking stage of an LLM data pipeline.

Reference analogue: ``xpacks/llm/splitters.py`` (null_splitter:13,
TokenCountSplitter:34).  The reference's TokenCountSplitter is a tiktoken
UDF (greedy max_tokens chunks, punctuation-refined breaks); tiktoken is
not available here, so the Spark-first restatement chunks on whitespace
tokens with the same greedy shape: fixed ``max_tokens`` windows, and a
short tail (< ``min_tokens``) merged into the previous chunk.

Scale design: chunking is embarrassingly parallel — the whole operator is
ONE narrow per-row column expression (split → sliced joins → posexplode),
no shuffle, no UDF, stays in whole-stage codegen.  At 100 TB the chunker
adds zero exchanges to whatever plan consumes the chunks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from pathwaydataframework_spark.operators.text import token_count, tokens


def null_splitter(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One chunk per document — reference ``null_splitter`` (splitters.py:13).

    >>> d = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    >>> null_splitter(d, "doc_id", "text").columns
    ['doc_id', 'chunk_idx', 'chunk', 'n_tokens']
    """
    return df.select(
        F.col(id_col),
        F.lit(0).cast("long").alias("chunk_idx"),
        F.col(text_col).alias("chunk"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )


def token_chunks(
    text: Column, *, min_tokens: int = 50, max_tokens: int = 500
) -> Column:
    """Array of chunk strings for one text column — greedy ``max_tokens``
    whitespace-token windows; a tail shorter than ``min_tokens`` merges
    into the previous chunk (so no chunk except a single-chunk doc is
    shorter than ``min_tokens``).

    Pure column expression (array slice + join) — no UDF, no shuffle.
    NULL or empty/whitespace-only text yields an EMPTY chunk array (no
    chunk rows after explode), consistent with ``text.token_count`` = 0.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if min_tokens < 0:
        raise ValueError(f"min_tokens must be >= 0, got {min_tokens}")
    # coalesce: NULL text must yield the EMPTY array the docstring promises
    # (a NULL would propagate through every branch and drop the doc)
    text = F.coalesce(text, F.lit(""))
    toks = tokens(text)
    n = token_count(text).cast("int")
    k_raw = F.ceil(n / F.lit(max_tokens)).cast("int")
    tail = n - (k_raw - F.lit(1)) * F.lit(max_tokens)
    k = F.when((k_raw > 1) & (tail < min_tokens), k_raw - 1).otherwise(k_raw)
    # chunk i < k-1: exactly max_tokens tokens; last chunk: the rest
    return F.when(n == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.array_join(
                F.when(
                    i < k - 1, F.slice(toks, i * max_tokens + 1, max_tokens)
                ).otherwise(F.slice(toks, i * max_tokens + 1, n - i * max_tokens)),
                " ",
            ),
        )
    )


def token_count_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_tokens: int = 50,
    max_tokens: int = 500,
) -> DataFrame:
    """Explode documents into (doc id, chunk_idx, chunk, n_tokens) rows —
    the table-level TokenCountSplitter (reference splitters.py:34).

    >>> d = spark.createDataFrame(
    ...     [(1, "a b c d e f g")], "doc_id long, text string")
    >>> [tuple(r) for r in token_count_split(
    ...     d, "doc_id", "text", min_tokens=2, max_tokens=3).collect()]
    [(1, 0, 'a b c', 3), (1, 1, 'd e f g', 4)]
    """
    chunks = token_chunks(
        F.col(text_col), min_tokens=min_tokens, max_tokens=max_tokens
    )
    exploded = df.select(F.col(id_col), F.posexplode(chunks))
    return exploded.select(
        F.col(id_col),
        F.col("pos").cast("long").alias("chunk_idx"),
        F.col("col").alias("chunk"),
        token_count(F.col("col")).alias("n_tokens"),
    )


class TokenCountSplitter:
    """Call-shape parity with the reference class (splitters.py:34):
    construct with defaults, call on a text Column to get the chunk array.

    >>> s = TokenCountSplitter(min_tokens=2, max_tokens=3)
    >>> d = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    >>> d.select(s(F.col("text")).alias("c")).first()["c"]
    ['a b c', 'd e']
    """

    def __init__(self, min_tokens: int = 50, max_tokens: int = 500):
        self.min_tokens = min_tokens
        self.max_tokens = max_tokens

    def __call__(self, text: Column, **kwargs) -> Column:
        return token_chunks(
            text,
            min_tokens=kwargs.get("min_tokens", self.min_tokens),
            max_tokens=kwargs.get("max_tokens", self.max_tokens),
        )


def sliding_window_chunks(
    text: Column, *, size: int, stride: int
) -> Column:
    """Array of overlapping chunk strings — RAG-style sliding-window
    chunking: windows of ``size`` whitespace tokens starting every
    ``stride`` tokens (stride < size ⇒ overlap = size − stride tokens of
    context carried across boundaries).  The final window is the short
    remainder unless a full window already covers it.

    Pure column expression (transform over a sequence of slice starts) —
    no UDF, no shuffle; NULL/blank text yields an empty array.
    """
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    if stride <= 0 or stride > size:
        raise ValueError(f"stride must be in [1, size], got {stride}")
    text = F.coalesce(text, F.lit(""))
    toks = tokens(text)
    n = token_count(text).cast("int")
    # starts: 0, stride, 2*stride, … while start < n and the PREVIOUS
    # window didn't already reach the end (start + size - stride < n)
    n_starts = F.greatest(
        F.ceil((n - F.lit(size)) / F.lit(stride)).cast("int") + F.lit(1), F.lit(1)
    )
    starts = F.sequence(F.lit(0), (n_starts - 1) * F.lit(stride), F.lit(stride))
    return F.when(n <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(starts, lambda s: F.array_join(F.slice(toks, s + 1, size), " "))
    )


def sliding_window_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    size: int,
    stride: int,
) -> DataFrame:
    """Explode :func:`sliding_window_chunks` into
    (id, chunk_idx, chunk, n_tokens) rows — the overlapping-context
    chunker a retrieval corpus is usually built with."""
    chunks = sliding_window_chunks(F.col(text_col), size=size, stride=stride)
    return df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk")).select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk",
        token_count(F.col("chunk")).alias("n_tokens"),
    )

"""Embedding operators — the embed stage of an LLM data pipeline.

Reference analogue: ``xpacks/llm/embedders.py:64-330`` (OpenAI / LiteLLM /
SentenceTransformer embedder UDF classes).  Those wrap external model
services, which are out of engine scope (COVERAGE.md §2.10); this module
provides the in-engine analogue — a deterministic hashing vectorizer — so
the full split → embed → index → retrieve pipeline runs distributed with
no service dependency, and a call-shape-compatible class users can swap
for a real model UDF.

Scale design: the hashing embedding is ONE per-row column expression
(token split → dim bucket-count transform) — no UDF, no shuffle, no
Python; the embed stage adds zero exchanges at any scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from pathwaydataframework_spark.operators.text import tokens


def hashing_embedding(text: Column, *, dim: int = 64) -> Column:
    """Deterministic lexical embedding: token-hash bucket counts
    (the classic hashing-vectorizer).  Cosine between two texts rises
    with shared-token mass — enough for retrieval/dedup plumbing and
    exactly reproducible everywhere.

    >>> d = spark.createDataFrame([("a b a",)], "t string")
    >>> v = d.select(hashing_embedding(F.col("t"), dim=8).alias("v")).first()["v"]
    >>> (len(v), sum(v))
    (8, 3.0)
    """
    # coalesce + empty-token filter: NULL text and ''/' ' must embed as the
    # ZERO vector (split('') yields [''], which would otherwise put phantom
    # unit mass in one bucket and make every empty doc a near-duplicate)
    toks = F.filter(
        tokens(F.lower(F.coalesce(text, F.lit("")))), lambda t: F.length(t) > 0
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.size(
            F.filter(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(dim)) == i)
        ).cast("double"),
    )


class HashingEmbedder:
    """Call-shape parity with the reference embedder classes
    (xpacks/llm/embedders.py:64): construct with defaults, call on a text
    Column to get the embedding column.  Swap for a Pandas-UDF-wrapped
    model to use a real embedding service.

    >>> e = HashingEmbedder(dim=4)
    >>> d = spark.createDataFrame([("x y",)], "t string")
    >>> sum(d.select(e(F.col("t")).alias("v")).first()["v"])
    2.0
    """

    def __init__(self, dim: int = 64):
        self.dim = dim

    def __call__(self, text: Column, **kwargs) -> Column:
        return hashing_embedding(text, dim=kwargs.get("dim", self.dim))

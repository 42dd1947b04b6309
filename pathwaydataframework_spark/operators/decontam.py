"""Benchmark decontamination for training corpora.

The standard n-gram–overlap method (GPT-3 appendix C / PaLM §7 style): a
training document is *contaminated* when it shares at least ``min_matches``
distinct word n-grams (n=13 by convention) with any document in a held-out
benchmark set.  The reference framework has no direct analogue — this is
part of the north-star training-data surface alongside dedup
(reference python/pathway/stdlib/ml analogues: none; closest is the dedup
xpack usage pattern).

Scale design (100 TB corpus, ~MB-scale benchmark):

- The benchmark side collapses to DISTINCT n-grams (tiny: |bench| · ~len)
  and is **broadcast** — the corpus side is filtered map-side and never
  shuffles its text anywhere.
- The only exchange is a groupBy on ``doc_id`` over the *matching* grams
  (near-empty for a clean corpus), to count distinct overlapping grams.
- Flagging is a broadcast LEFT join of the match counts back onto ids —
  the corpus text rides through untouched in its original partitioning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from pathwaydataframework_spark.operators.dedup import (
    _ensure_parallelism,
    _word_shingles,
)


def benchmark_ngrams(
    bench: DataFrame, *, text_col: str = "text", n: int = 13
) -> DataFrame:
    """DISTINCT word n-grams of the benchmark set — the broadcast probe."""
    return (
        _ensure_parallelism(bench)
        .select(F.explode(_word_shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def contamination_matches(
    train: DataFrame,
    bench: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """(doc_id, n_matching_grams) for every training doc that shares at
    least one distinct n-gram with the benchmark set."""
    probe = F.broadcast(benchmark_ngrams(bench, text_col=text_col, n=n))
    grams = _ensure_parallelism(train).select(
        F.col(id_col).alias("doc_id"),
        F.explode(_word_shingles(F.col(text_col), n)).alias("gram"),
    )
    # broadcast inner join runs map-side; only matching (doc, gram) rows —
    # near-zero for a clean corpus — reach the exchange below
    return (
        grams.join(probe, on="gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_matching_grams"))
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_matches: int = 1,
) -> DataFrame:
    """Training frame with a ``contaminated`` flag and match count.

    Filter ``~contaminated`` for the clean corpus; keep the flag column to
    audit what was dropped.  The text column never shuffles: the join key
    is the (broadcast) match-count table on ``doc_id``.
    """
    matches = contamination_matches(
        train, bench, id_col=id_col, text_col=text_col, n=n
    )
    flagged = train.join(
        F.broadcast(matches.withColumnRenamed("doc_id", "__m_id")),
        on=F.col(id_col) == F.col("__m_id"),
        how="left",
    )
    return flagged.select(
        *[F.col(c) for c in train.columns],
        F.coalesce(F.col("n_matching_grams"), F.lit(0)).alias("n_matching_grams"),
        (
            F.coalesce(F.col("n_matching_grams"), F.lit(0)) >= F.lit(min_matches)
        ).alias("contaminated"),
    )

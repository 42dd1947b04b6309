"""Rerankers — the final stage of a retrieve-then-rerank pipeline.

Reference analogue: ``xpacks/llm/rerankers.py:58-319`` (LLMReranker /
CrossEncoderReranker / EncoderReranker — all external-model UDFs, out of
engine scope).  The in-engine analogue reranks candidate (query, doc)
pairs by lexical query coverage: |query_tokens ∩ doc_tokens| / |query_tokens|.
Deterministic, exactly SQL-expressible (oracle-checkable), and the right
call shape to swap in a cross-encoder Pandas UDF on a real cluster.

Scale design: the rerank stage touches CANDIDATE pairs only (top-k per
query from the retriever), never the corpus — a broadcast-size join with
one window, no matter how large the corpus is.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window as W

from pathwaydataframework_spark.operators.text import tokens


def _distinct_tokens(col: Column) -> Column:
    return F.array_distinct(tokens(F.lower(col)))


def coverage_score(doc_text: Column, query_text: Column) -> Column:
    """Fraction of the query's distinct tokens present in the doc.

    >>> d = spark.createDataFrame([("big data engine", "data engine")], "t string, q string")
    >>> d.select(coverage_score(F.col("t"), F.col("q")).alias("s")).first()["s"]
    1.0
    """
    qt = _distinct_tokens(query_text)
    return F.size(F.array_intersect(_distinct_tokens(doc_text), qt)) / F.size(qt)


def rerank_token_overlap(
    candidates: DataFrame,
    docs: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query",
    k: int | None = None,
) -> DataFrame:
    """Re-rank retriever candidates (query_id, doc_id, …) by lexical query
    coverage.  Returns (query_id, doc_id, rerank_score, rerank) with
    deterministic (score DESC, doc_id ASC) ordering; ``k`` truncates.

    The candidate set is small (top-k per query), so both text joins
    broadcast; the corpus is never rescanned.
    """
    cand = candidates.select(query_id_col, id_col)
    joined = (
        cand.join(docs.select(id_col, text_col), on=id_col)
        .join(queries.select(query_id_col, query_text_col), on=query_id_col)
        .withColumn(
            "rerank_score",
            F.round(coverage_score(F.col(text_col), F.col(query_text_col)), 6),
        )
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.col("rerank_score").desc(), F.col(id_col).asc()
    )
    out = joined.withColumn("rerank", F.row_number().over(w).cast("long")).select(
        query_id_col, id_col, "rerank_score", "rerank"
    )
    if k is not None:
        out = out.filter(F.col("rerank") <= k)
    return out


def rerank_topk_filter(docs, scores, k: int = 5):
    """Reference xpacks/llm/rerankers.py:15 — per-row top-k filter over
    parallel (docs, scores) list columns, returned as the (docs, scores)
    pair sorted by score descending.  Pure column expressions: zip →
    sort desc → slice → unzip, no UDF."""
    import pyspark.sql.functions as F

    from pathwaydataframework_spark.internals.expression import FuncExpr, lift

    def _fn(d, s):
        zipped = F.zip_with(
            s, d, lambda sc, doc: F.struct(sc.alias("score"), doc.alias("doc"))
        )
        top = F.slice(F.reverse(F.array_sort(zipped)), 1, k)
        return F.struct(
            F.transform(top, lambda t: t["doc"]).alias("docs"),
            F.transform(top, lambda t: t["score"]).alias("scores"),
        )

    return FuncExpr(_fn, lift(docs), lift(scores))

"""Index façades matching the reference's retriever API so existing user
code ports directly.

Reference: ``KNNIndex`` (stdlib/ml/index.py:9, LSH impl _knn_lsh.py),
``DataIndex`` + retriever factories (stdlib/indexing/data_index.py:206,
nearest_neighbors.py:65 BruteForceKnn, :262 LshKnn, bm25.py:41 TantivyBM25,
hybrid_index.py:14 HybridIndex).

The reference maintains single-node in-RAM indexes (usearch/tantivy); here
every retriever is a deferred *distributed join plan* over the indexed
DataFrame — same results contract (top-k ids + scores), no index service.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from pathwaydataframework_spark.operators import ranking, similarity


class KNNIndex:
    """Reference stdlib/ml/index.py:9 — vector index with
    ``get_nearest_items``."""

    def __init__(
        self,
        data: DataFrame,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        dim: int,
        method: str = "brute_force",
        bits: int = 16,
        bands: int = 8,
        n_clusters: int = 16,
        nprobe: int = 4,
    ):
        self._data = data
        self._id_col = id_col
        self._vec_col = vec_col
        self._dim = dim
        self._method = method
        self._bits = bits
        self._bands = bands
        self._n_clusters = n_clusters
        self._nprobe = nprobe

    def get_nearest_items(
        self, queries: DataFrame, k: int = 10, *, query_id_col: str | None = None,
        query_vec_col: str | None = None,
    ) -> DataFrame:
        if self._method == "brute_force":
            return similarity.knn_bruteforce(
                self._data,
                queries,
                id_col=self._id_col,
                vec_col=self._vec_col,
                query_id_col=query_id_col or self._id_col,
                query_vec_col=query_vec_col or self._vec_col,
                k=k,
                exclude_self=False,
            )
        if self._method == "lsh":
            return similarity.knn_lsh(
                self._data,
                queries,
                id_col=self._id_col,
                vec_col=self._vec_col,
                dim=self._dim,
                k=k,
                bits=self._bits,
                bands=self._bands,
                exclude_self=False,
            )
        if self._method == "ivf":
            return similarity.knn_ivf(
                self._data,
                queries,
                id_col=self._id_col,
                vec_col=self._vec_col,
                query_id_col=query_id_col or self._id_col,
                query_vec_col=query_vec_col or self._vec_col,
                k=k,
                n_clusters=self._n_clusters,
                nprobe=self._nprobe,
                exclude_self=False,
            )
        raise ValueError(f"unknown method {self._method}")

    # reference naming: asof_now == answer with current state; in batch the
    # current state is the whole table
    get_nearest_items_asof_now = get_nearest_items


class BruteForceKnnFactory:
    """Reference nearest_neighbors.py:65."""

    def __init__(self, *, dim: int, id_col: str = "vec_id", vec_col: str = "embedding"):
        self.kwargs = dict(dim=dim, id_col=id_col, vec_col=vec_col, method="brute_force")

    def build_index(self, data: DataFrame) -> KNNIndex:
        return KNNIndex(data, **self.kwargs)


class LshKnnFactory:
    """Reference nearest_neighbors.py:262."""

    def __init__(
        self, *, dim: int, id_col: str = "vec_id", vec_col: str = "embedding",
        bits: int = 16, bands: int = 8,
    ):
        self.kwargs = dict(
            dim=dim, id_col=id_col, vec_col=vec_col, method="lsh", bits=bits, bands=bands
        )

    def build_index(self, data: DataFrame) -> KNNIndex:
        return KNNIndex(data, **self.kwargs)


class UsearchKnnFactory:
    """Reference nearest_neighbors.py:170 (USearchKnn — an HNSW service).
    The distributed analogue is the IVF retriever: same approximate-top-k
    contract, coarse-quantized instead of graph-walked (an in-process HNSW
    cannot shard across executors; inverted lists can)."""

    def __init__(
        self, *, dim: int, id_col: str = "vec_id", vec_col: str = "embedding",
        n_clusters: int = 16, nprobe: int = 4,
    ):
        self.kwargs = dict(
            dim=dim, id_col=id_col, vec_col=vec_col, method="ivf",
            n_clusters=n_clusters, nprobe=nprobe,
        )

    def build_index(self, data: DataFrame) -> KNNIndex:
        return KNNIndex(data, **self.kwargs)


class BM25Index:
    """Reference TantivyBM25 (bm25.py:41) — full-text retriever."""

    def __init__(self, docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"):
        self._docs = docs
        self._id_col = id_col
        self._text_col = text_col

    def query(self, queries: DataFrame, k: int = 10, *, query_id_col: str = "query_id",
              query_text_col: str = "query") -> DataFrame:
        return ranking.bm25_scores(
            self._docs,
            queries,
            id_col=self._id_col,
            text_col=self._text_col,
            query_id_col=query_id_col,
            query_text_col=query_text_col,
            k=k,
        )


class HybridIndex:
    """Reference hybrid_index.py:14 — reciprocal-rank fusion of several
    retrievers' top-k lists."""

    def __init__(self, indexes: list, *, k_rrf: float = 60.0):
        self._indexes = indexes
        self._k = k_rrf

    def query(self, queries: DataFrame, k: int = 10, **kwargs) -> DataFrame:
        from pyspark.sql import Window as W

        parts = []
        for idx in self._indexes:
            if isinstance(idx, BM25Index):
                r = idx.query(queries, k=k, **kwargs)
                r = r.select("query_id", F.col("doc_id").alias("item_id"), "rank")
            else:
                r = idx.get_nearest_items(queries, k=k)
                r = r.select(
                    F.col("query_id"), F.col("neighbor_id").alias("item_id"), "rank"
                )
            parts.append(r.withColumn("rrf", 1.0 / (F.lit(self._k) + F.col("rank"))))
        fused = parts[0]
        for p in parts[1:]:
            fused = fused.unionByName(p)
        scored = fused.groupBy("query_id", "item_id").agg(
            F.round(F.sum("rrf"), 6).alias("score")
        )
        w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("item_id").asc())
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "item_id", "score", "rank")
        )

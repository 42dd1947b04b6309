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
            # knn_lsh resolves queries against the index's column names —
            # apply the query-side overrides by renaming first
            if query_id_col and query_id_col != self._id_col:
                queries = queries.withColumnRenamed(query_id_col, self._id_col)
            if query_vec_col and query_vec_col != self._vec_col:
                queries = queries.withColumnRenamed(query_vec_col, self._vec_col)
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
                # route only the kwargs each retriever understands — a
                # hybrid query carries BOTH a text and a vector column
                bm_kwargs = {
                    key: kwargs[key]
                    for key in ("query_id_col", "query_text_col")
                    if key in kwargs
                }
                r = idx.query(queries, k=k, **bm_kwargs)
                r = r.select("query_id", F.col("doc_id").alias("item_id"), "rank")
            else:
                r = idx.get_nearest_items(
                    queries,
                    k=k,
                    query_id_col=kwargs.get("query_id_col"),
                    query_vec_col=kwargs.get("query_vec_col"),
                )
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


# -- reference stdlib.indexing namespace parity ------------------------------
# Reference stdlib/indexing/__init__.py exports.  One distributed retriever
# implementation serves every reference flavor; the names below bind the
# reference's exact class/function names to it.

import enum as _enum

from pathwaydataframework_spark.internals.table import Table as _Table


class BruteForceKnnMetricKind(_enum.Enum):
    """Reference engine BruteForceKnnMetricKind (engine.pyi)."""

    L2SQ = "l2sq"
    COS = "cos"


class USearchMetricKind(_enum.Enum):
    """Reference engine USearchMetricKind (engine.pyi) — the IVF analogue
    scores cosine; other metrics reduce to it after normalization."""

    IP = "ip"
    COS = "cos"
    L2SQ = "l2sq"


class AbstractRetrieverFactory:
    """Reference stdlib/indexing/retrievers.py — factory base; all concrete
    factories implement ``build_index(data)``."""


AbstractRetrieverFactory.register = classmethod(lambda cls, c: c)  # ABC-lite
for _f in (BruteForceKnnFactory, LshKnnFactory, UsearchKnnFactory):
    AbstractRetrieverFactory.register(_f)

# reference retriever class names — the query interface is KNNIndex/BM25Index
InnerIndex = KNNIndex
BruteForceKnn = KNNIndex
LshKnn = KNNIndex
USearchKnn = KNNIndex
TantivyBM25 = BM25Index
HybridIndexFactory = HybridIndex


class TantivyBM25Factory:
    """Reference stdlib/indexing/bm25.py TantivyBM25Factory."""

    def __init__(self, *, id_col: str = "doc_id", text_col: str = "text"):
        self.kwargs = dict(id_col=id_col, text_col=text_col)

    def build_index(self, docs: DataFrame) -> BM25Index:
        return BM25Index(docs, **self.kwargs)


class DataIndex:
    """Reference stdlib/indexing/data_index.py:278 — an index plus the data
    table, so query results come back augmented with the data's columns.

    ``query`` / ``query_as_of_now`` share one implementation: in batch the
    current state IS the whole table (same reasoning as asof_now_join).
    """

    def __init__(self, data: DataFrame, inner_index, *, id_col: str = "vec_id"):
        self._data = data.df if isinstance(data, _Table) else data
        self._inner = inner_index
        self._id_col = id_col

    def query(self, queries: DataFrame, number_of_matches: int = 3, **kwargs) -> DataFrame:
        queries = queries.df if isinstance(queries, _Table) else queries
        if isinstance(self._inner, BM25Index):
            hits = self._inner.query(queries, k=number_of_matches, **kwargs)
            join_col = "doc_id"
        else:
            hits = self._inner.get_nearest_items(queries, k=number_of_matches, **kwargs)
            hits = hits.withColumnRenamed("neighbor_id", "__hit_id")
            join_col = "__hit_id"
        data = self._data.withColumnRenamed(self._id_col, "__data_id")
        out = hits.join(data, on=F.col(join_col) == F.col("__data_id"), how="left")
        return out.drop("__data_id")

    query_as_of_now = query


def default_vector_document_index(
    data: DataFrame, *, dim: int, id_col: str = "doc_id", vec_col: str = "embedding",
) -> DataIndex:
    """Reference vector_document_index.py — brute-force cosine default."""
    idx = BruteForceKnnFactory(dim=dim, id_col=id_col, vec_col=vec_col).build_index(data)
    return DataIndex(data, idx, id_col=id_col)


default_brute_force_knn_document_index = default_vector_document_index


def default_lsh_knn_document_index(
    data: DataFrame, *, dim: int, id_col: str = "doc_id", vec_col: str = "embedding",
) -> DataIndex:
    idx = LshKnnFactory(dim=dim, id_col=id_col, vec_col=vec_col).build_index(data)
    return DataIndex(data, idx, id_col=id_col)


def default_usearch_knn_document_index(
    data: DataFrame, *, dim: int, id_col: str = "doc_id", vec_col: str = "embedding",
) -> DataIndex:
    idx = UsearchKnnFactory(dim=dim, id_col=id_col, vec_col=vec_col).build_index(data)
    return DataIndex(data, idx, id_col=id_col)


def default_full_text_document_index(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
) -> DataIndex:
    idx = TantivyBM25Factory(id_col=id_col, text_col=text_col).build_index(docs)
    return DataIndex(docs, idx, id_col=id_col)


# -- sorted index (reference stdlib/indexing/sorting.py) ---------------------
# The reference builds a distributed treap (sorting.py:92) because its
# engine has no native sort; Spark sorts natively, so the index is the rank
# layout itself — same navigation contract (prev/next/root), one window.


def build_sorted_index(nodes, *, key_col: str = "key", instance_col: str | None = None):
    """Reference sorting.py:92 — returns {'index': ..., 'oracle': ...}.

    index: key, instance, rank, prev, next (rank-window layout — the
    treap's in-order traversal, materialized directly).  oracle: per
    instance the root = the minimum-rank node (the reference's oracle
    holds the treap root per instance; any entry point works for
    navigation, the minimum is deterministic).
    """
    import pyspark.sql.functions as _F
    from pyspark.sql import Window as _W

    df = nodes.df if isinstance(nodes, _Table) else nodes
    inst = instance_col or _F.lit(0).alias("__inst")
    if instance_col is None:
        df = df.withColumn("instance", _F.lit(0))
        instance_col = "instance"
    w = _W.partitionBy(instance_col).orderBy(key_col)
    index = (
        df.withColumn("rank", _F.row_number().over(w).cast("long"))
        .withColumn("prev", _F.lag(key_col).over(w))
        .withColumn("next", _F.lead(key_col).over(w))
    )
    oracle = index.filter(_F.col("rank") == 1).select(
        instance_col, _F.col(key_col).alias("root")
    )
    return {"index": index, "oracle": oracle}


class SortedIndex(dict):
    """Reference sorting.py:85 — a TypedDict {'index', 'oracle'}; plain
    dict subclass here so isinstance checks and key access both work."""


def sort_from_index(index: DataFrame, oracle=None) -> DataFrame:
    """Reference sorting.py:137 — derive prev/next pointers from the index;
    ours already carries them (the rank layout IS the sorted order), so
    every column rides through regardless of the key/instance names the
    index was built with."""
    return index.df if isinstance(index, _Table) else index


# reference exports retrieve_prev_next_values from indexing too
from pathwaydataframework_spark.operators.ordered import (  # noqa: E402
    retrieve_prev_next_values,
)

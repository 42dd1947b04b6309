"""Similarity search over embedding columns.

Reference analogues: KNNIndex / DataIndex retrievers (reference
stdlib/ml/index.py:9, stdlib/indexing/nearest_neighbors.py:65 BruteForceKnn,
:262 LshKnn; engine external_index.rs + usearch integration).  The reference
maintains an in-RAM index on one node; our versions are distributed joins:

- brute-force cosine top-k: broadcast the (small) query set, compute cosine
  JVM-side with zip_with/aggregate, take top-k per query with a window.
  Exact; scales linearly in corpus size — the right baseline when queries
  are few.
- LSH (random hyperplane) top-k: sign-bit signatures over fixed random
  hyperplanes (seeded, deterministic), candidates from shared bands,
  exact re-rank of candidates only.  The scale path when both sides are
  large.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window as W

from pathwaydataframework_spark.operators.dedup import _ensure_parallelism


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    query_vec_col: str | None = None,
    k: int = 10,
    metric: str = "cosine",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Plan: broadcast(queries) × corpus → JVM-side cosine → window top-k per
    query.  With Q queries and N corpus rows the work is Q·N fully parallel
    multiply-adds; no driver-side state, no collect.

    >>> c = spark.createDataFrame(
    ...     [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.9, 0.1])],
    ...     "vec_id long, embedding array<double>")
    >>> q = c.filter("vec_id = 1")
    >>> out = knn_bruteforce(c, q, k=1).collect()
    >>> (out[0]["query_id"], out[0]["neighbor_id"])
    (1, 3)
    """
    query_id_col = query_id_col or id_col
    query_vec_col = query_vec_col or vec_col
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("__qv"),
    )
    c = _ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    joined = c.join(F.broadcast(q), how="cross")
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    if metric == "cosine":
        score = cosine_similarity(F.col("__qv"), F.col("__cv"))
    elif metric == "dot":
        score = _dot(F.col("__qv"), F.col("__cv"))
    elif metric == "l2":
        score = -F.sqrt(
            F.aggregate(
                F.zip_with(F.col("__qv"), F.col("__cv"), lambda x, y: (x - y) * (x - y)),
                F.lit(0.0).cast("double"),
                lambda acc, v: acc + v,
            )
        )
    else:
        raise ValueError(metric)
    scored = joined.withColumn("score", F.round(score, 6))
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy RNG state leaks —
    plain LCG so the operator is reproducible everywhere)."""
    planes = []
    state = seed & 0x7FFFFFFF
    for _ in range(bits):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) & 0x7FFFFFFF
            row.append(state / 0x7FFFFFFF * 2 - 1)
        planes.append(row)
    return planes


def lsh_signatures(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    bits: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane signature (sign bits packed into a long).

    One nested higher-order expression (transform over a 2-D plane literal →
    zip_with/aggregate dot → bit pack) instead of ``bits`` separate dot
    trees — keeps the codegen unit small, so first-run JIT doesn't dominate.
    """
    if bits > 64:
        raise ValueError("signatures pack into one long — bits must be <= 64")
    planes = _hyperplanes(dim, bits, seed)
    df = _ensure_parallelism(df)
    # The whole signature is ONE SQL string parsed by a single F.expr call.
    # Building the same tree with F.lit()/F.transform() lambdas costs >1s of
    # py4j roundtrips + analysis per call site at bits=16/dim=64 (measured);
    # the parser does it in ~20ms.  shiftleft keeps bit 63 in long range
    # (two's complement); summing distinct powers of two == bitwise OR.
    planes_sql = "array(" + ",".join(
        "array(" + ",".join(f"{x!r}D" for x in row) + ")" for row in planes
    ) + ")"
    v_sql = f"cast(`{vec_col}` as array<double>)"
    bits_sql = (
        f"transform({planes_sql}, p -> cast(aggregate(zip_with({v_sql}, p, "
        "(x, y) -> x * y), 0D, (acc, t) -> acc + t) > 0 as bigint))"
    )
    sig_sql = (
        f"aggregate(zip_with({bits_sql}, transform(sequence(0, {bits - 1}), "
        "i -> shiftleft(1L, i)), (b, w) -> b * w), 0L, (acc, t) -> acc + t)"
    )
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        F.expr(sig_sql).alias("lsh_sig"),
    )


def _banded(sig: DataFrame, *, bits: int, bands: int) -> DataFrame:
    """Explode a signature frame into (vec_id, band_idx, band_val) rows —
    deliberately WITHOUT the vector column, so the band join and candidate
    dedup shuffle narrow rows only."""
    if bands > bits:
        raise ValueError(
            f"bands ({bands}) > bits ({bits}): every band value would be 0 "
            "and the candidate join degenerates to a cross product"
        )
    if bits % bands != 0:
        raise ValueError(
            f"bits ({bits}) must be divisible by bands ({bands}) — the top "
            f"{bits % bands} signature bits would be silently unused"
        )
    band_bits = bits // bands
    return sig.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftright(F.col("lsh_sig"), i * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1) if band_bits < 64 else F.lit(-1))
                        .alias("band_val"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "bb.band_idx", "bb.band_val")


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    k: int = 10,
    bits: int = 16,
    bands: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates share ≥1 LSH band, re-ranked exactly.

    Both sides get banded signatures; the candidate join is an equi-join on
    (band_idx, band_bits) — hash-partitionable, linear-scale.  Recall is
    tunable via bits/bands.
    """
    qsig = lsh_signatures(queries, id_col=id_col, vec_col=vec_col, dim=dim, bits=bits, seed=seed)
    csig = lsh_signatures(corpus, id_col=id_col, vec_col=vec_col, dim=dim, bits=bits, seed=seed)
    qb = _banded(qsig, bits=bits, bands=bands)
    cb = _banded(csig, bits=bits, bands=bands)
    # candidate dedup on (query_id, neighbor_id) ONLY — distinct over rows
    # carrying two dim-wide vectors shuffles ~16x more bytes; vectors are
    # re-attached afterwards by id (the query side is small → AQE broadcast)
    # query side is tiny by construction (a handful of probe vectors × bands)
    # — broadcast it explicitly so the corpus-side bands and signatures never
    # shuffle for the candidate join or the vector re-attach
    cand = (
        F.broadcast(qb.alias("q"))
        .join(cb.alias("c"), on=["band_idx", "band_val"])
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
        )
        .distinct()
    )
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = (
        cand.join(
            csig.select(F.col("vec_id").alias("neighbor_id"), F.col("__v").alias("__cv")),
            on="neighbor_id",
        )
        .join(
            F.broadcast(
                qsig.select(F.col("vec_id").alias("query_id"), F.col("__v").alias("__qv"))
            ),
            on="query_id",
        )
        .withColumn("score", F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def embedding_cosine_dedup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.95,
    bits: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold, LSH-blocked.

    The embedding-space analogue of MinHash dedup: candidates from shared
    LSH bands, exact cosine verification, a < b canonical ordering."""
    from pathwaydataframework_spark.operators.dedup import (
        collapse_pairs_by_signature,
    )

    sig = lsh_signatures(df, id_col=id_col, vec_col=vec_col, dim=dim, bits=bits, seed=seed)

    def _rep_band_pairs(reps: DataFrame) -> DataFrame:
        # r15: reps arrives with lsh_sig attached (collapse carry
        # columns) — banding runs straight off the representatives; the
        # old left-semi join back to ``sig`` re-ran the whole
        # (un-checkpointed) signature projection a second time
        banded = _banded(reps, bits=bits, bands=bands)
        return (
            banded.alias("a")
            .join(
                banded.alias("b"),
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_val") == F.col("b.band_val"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(
                F.col("a.vec_id").alias("rep_a"), F.col("b.vec_id").alias("rep_b")
            )
            .distinct()
        )

    # collapse identical LSH signatures before the band self-join (hot-band
    # bound); cosine still verifies on the actual vectors post-expansion
    cand = collapse_pairs_by_signature(
        sig.select("vec_id", "lsh_sig"), "vec_id", "lsh_sig", _rep_band_pairs
    )
    va = sig.select(F.col("vec_id").alias("id_a"), F.col("__v").alias("__va"))
    vb = sig.select(F.col("vec_id").alias("id_b"), F.col("__v").alias("__vb"))
    return (
        cand.join(va, on="id_a")
        .join(vb, on="id_b")
        .withColumn("cosine", F.round(cosine_similarity(F.col("__va"), F.col("__vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    query_vec_col: str | None = None,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    iterations: int = 3,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF (inverted-file) approximate knn — the coarse-quantizer scale
    path alongside LSH.

    Plan: a deterministic k-means coarse quantizer partitions the corpus
    into ``n_clusters`` lists; each query scores only the lists of its
    ``nprobe`` nearest centroids.  The candidate join is keyed on the
    cluster id, so a probe touches ~nprobe/n_clusters of the corpus —
    at 100 TB the lists are pre-partitioned (bucketed) by cluster and a
    probe is a partition-pruned scan, not a full pass.  With
    ``nprobe >= n_clusters`` every list is probed and the result is
    EXACTLY brute force (same rounding and tie rules) — which is how the
    oracle checks it; recall at nprobe < n_clusters is covered by tests.
    """
    from pathwaydataframework_spark.operators.clustering import kmeans_fit

    query_id_col = query_id_col or id_col
    query_vec_col = query_vec_col or vec_col
    assigned, centroids = kmeans_fit(
        corpus, id_col, vec_col, n_clusters, iterations=iterations
    )
    c = (
        _ensure_parallelism(corpus)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("__cv"),
        )
        .join(
            assigned.select(F.col(id_col).alias("neighbor_id"), "cluster"),
            on="neighbor_id",
        )
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("__qv"),
    )
    # probe ranking must use the SAME metric the quantizer assigned with
    # (L2): cosine-ranked probes miss L2-assigned lists for unnormalized
    # embeddings and recall silently drops at nprobe < n_clusters
    l2 = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("__qv"), F.col("centroid"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("__dist", F.round(l2, 6))
        .withColumn(
            "__pr",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(
                    F.col("__dist").asc(), F.col("cluster").asc()
                )
            ),
        )
        .filter(F.col("__pr") <= nprobe)
        .select("query_id", "__qv", "cluster")
    )
    cand = probes.join(c, on="cluster")
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.withColumn(
        "score", F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6)
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )

"""Distributed k-means over an embedding column — semantic clustering for
training-data curation (topic balancing, semantic dedup at cluster
granularity, IVF coarse quantizers for ANN).

The reference engine has no clustering operator; this is north-star
addendum surface.  Design is Spark-first Lloyd's:

- **Deterministic init**: centroids are the k DISTINCT vectors with the
  smallest ids — reproducible and exactly replicable by an external
  oracle (no RNG, which cannot be replicated cross-engine; distinct so
  duplicate rows can't collapse two seeds onto one point).
- **Assignment** is a join, not a literal storm: documents × broadcast
  centroid table (k rows), distance via ``zip_with``/``aggregate`` on two
  array columns, then ``min_by`` per document.  Zero py4j literals, zero
  driver round-trips per iteration, linear scale-out.
- **Update** is posexplode → per-(cluster, dim) avg → re-assembled array:
  two small shuffles keyed by cluster, map-side partial aggs collapse each
  partition first.
- **Parity**: centroid components and distances are rounded to 6 decimals
  every iteration, and distance ties break on the lower cluster index, so
  an independent SQL engine replays the exact trajectory (the DuckDB
  oracle unrolls the same iterations).

>>> from pathwaydataframework_spark.operators import clustering
>>> import pyspark.sql.functions as F
>>> pts = spark.createDataFrame(
...     [(i, [float(i // 3 * 10), 0.0]) for i in range(6)], "id long, v array<double>")
>>> out = clustering.kmeans(pts, "id", "v", k=2, iterations=3)
>>> sorted((r["id"], r["cluster"]) for r in out.collect())
[(0, 0), (1, 0), (2, 0), (3, 1), (4, 1), (5, 1)]
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window as W

_ROUND = 6  # cross-engine stability: centroids + distances live at 6dp


def _l2(a, b) -> F.Column:
    """round(sqrt(Σ (aᵢ-bᵢ)²), 6) — index-order fold, deterministic."""
    sq = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.round(F.sqrt(sq), _ROUND)


def kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    *,
    iterations: int = 5,
) -> DataFrame:
    """Lloyd's k-means, fixed iteration count.  Returns (id, cluster) with
    cluster ∈ [0, k) indexed by init order (ascending minimal id of each
    distinct seed vector).
    """
    assigned, _ = kmeans_fit(df, id_col, vec_col, k, iterations=iterations)
    return assigned


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    *,
    iterations: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """Like :func:`kmeans` but also returns the final centroid table
    (cluster, centroid) — the coarse quantizer an IVF index probes."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    # referenced 2× per iteration (assignment join + centroid update) —
    # materialize once instead of re-deriving from the source every pass
    pts = df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    ).localCheckpoint(eager=True)
    # seed from the k DISTINCT vectors with the smallest ids — duplicate
    # seeds would collapse clusters on ties (init-only cost: one distinct
    # shuffle over the vector column)
    centroids = (
        pts.groupBy("_v")
        .agg(F.min("_id").alias("_m"))
        .orderBy("_m")
        .limit(k)
        .select(
            (F.row_number().over(W.orderBy("_m")) - 1).cast("long").alias("cluster"),
            F.transform("_v", lambda x: F.round(x, _ROUND)).alias("_c"),
        )
        .localCheckpoint(eager=True)
    )
    assigned = None
    for it in range(iterations):
        assigned = (
            pts.crossJoin(F.broadcast(centroids))
            .withColumn("_d", _l2(F.col("_v"), F.col("_c")))
            .groupBy("_id")
            .agg(
                F.min_by(F.col("cluster"), F.struct(F.col("_d"), F.col("cluster"))).alias(
                    "cluster"
                )
            )
        )
        if it == iterations - 1:
            # the returned centroids are the ones this assignment used —
            # and the post-final update would be an eagerly-checkpointed
            # wasted job
            break
        centroids = (
            assigned.join(pts, on="_id")
            .select("cluster", F.posexplode("_v").alias("_i", "_x"))
            .groupBy("cluster", "_i")
            .agg(F.round(F.avg("_x"), _ROUND).alias("_m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("_i", "_m"))).alias("_im"))
            .select("cluster", F.transform("_im", lambda s: s["_m"]).alias("_c"))
            .localCheckpoint(eager=True)  # tiny (k rows); flattens loop lineage
        )
    return (
        assigned.select(F.col("_id").alias(id_col), "cluster"),
        centroids.select("cluster", F.col("_c").alias("centroid")),
    )


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int,
    iterations: int = 3,
    threshold: float = 0.95,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): k-means cluster the embeddings, then within each
    cluster drop every point whose cosine similarity to a smaller-id point
    of the same cluster reaches ``threshold``.

    The clusters ARE the blocking structure — the pairwise check is
    confined to each cluster (one shuffle keyed by cluster), never a
    global all-pairs, which is the paper's point: at web scale the k·(n/k)²
    within-cluster work replaces the impossible n² sweep.  The keep rule is
    the deterministic analogue of the paper's "keep one exemplar": the
    smallest id survives (the paper keeps the point farthest from the
    centroid; any single-representative rule dedups equally — ours is
    reproducible across engines with no tie ambiguity).

    Returns (id, cluster, kept).  Cosines are rounded to 6 decimals before
    the threshold compare so an external SQL oracle replays the decision
    bit-for-bit.
    """
    from pathwaydataframework_spark.operators.similarity import cosine_similarity

    assigned = kmeans(df, id_col, vec_col, k, iterations=iterations)
    pts = (
        df.select(
            F.col(id_col).alias("_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
        )
        .join(assigned.select(F.col(id_col).alias("_id"), "cluster"), on="_id")
        # referenced twice (both sides of the within-cluster join) — without
        # this the whole k-means lineage re-executes for each side
        .localCheckpoint(eager=True)
    )
    a = pts.select(F.col("_id").alias("_ida"), "cluster", F.col("_v").alias("_va"))
    b = pts.select(F.col("_id").alias("_idb"), "cluster", F.col("_v").alias("_vb"))
    dropped = (
        a.join(b, on="cluster")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(
            F.round(cosine_similarity(F.col("_va"), F.col("_vb")), _ROUND)
            >= F.lit(threshold)
        )
        .select(F.col("_idb").alias("_id"))
        .distinct()
    )
    return (
        pts.join(dropped.withColumn("_hit", F.lit(True)), on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            "cluster",
            F.col("_hit").isNull().alias("kept"),
        )
    )


def embedding_outliers(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int,
    iterations: int = 3,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Embedding-space outlier detection: fit k-means, then flag points
    whose distance to their centroid exceeds mean + z_threshold x std of
    their cluster — the standard curation move for dropping mis-embedded /
    off-distribution vectors before training.

    Returns (id, cluster, dist, is_outlier).  All statistics are computed
    from exact decimal sums of the 6dp-rounded distances, so the flag is
    bit-reproducible across engines (same technique as the reducer-matrix
    averages).  Cost beyond the k-means fit: one broadcast re-join of the
    centroids plus one cluster-keyed aggregation.
    """
    assigned, centroids = kmeans_fit(df, id_col, vec_col, k, iterations=iterations)
    pts = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    d = (
        pts.join(assigned, on=id_col)
        .join(F.broadcast(centroids), on="cluster")
        .select(
            F.col(id_col).alias("_id"),
            "cluster",
            _l2(F.col("_v"), F.col("centroid")).alias("dist"),
        )
    )
    # dist carries 6 decimals, so decimal(18,6) is lossless and the product
    # type is decimal(37,12) — exact.  (A (28,12)x(28,12) product would be
    # TRUNCATED by Spark to (38,6), silently losing the square's low half.)
    dd = d.withColumn("_dd", F.col("dist").cast("decimal(18,6)"))
    stats = dd.groupBy("cluster").agg(
        (F.sum("_dd").cast("double") / F.count(F.lit(1))).alias("_mean"),
        (
            F.sum(F.col("_dd") * F.col("_dd")).cast("double")
            / F.count(F.lit(1))
        ).alias("_m2"),
    )
    return (
        d.join(F.broadcast(stats), on="cluster")
        .withColumn(
            "_std", F.sqrt(F.greatest(F.col("_m2") - F.col("_mean") * F.col("_mean"), F.lit(0.0)))
        )
        .select(
            F.col("_id").alias(id_col),
            "cluster",
            "dist",
            (F.col("dist") > F.col("_mean") + F.lit(z_threshold) * F.col("_std")).alias(
                "is_outlier"
            ),
        )
    )

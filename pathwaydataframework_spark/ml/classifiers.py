"""kNN classifiers — reference stdlib/ml/classifiers/__init__.py
(_knn_lsh.py): train = build an LSH index over labeled vectors, classify =
majority label among the k nearest neighbors.

Spark plan: the trained "classifier" is a closure over the labeled frame;
classification is one knn_lsh candidate join + a majority vote per query
(``mode``-style max_by over label counts) — all hash-partitioned, no
driver-side state.
"""

from __future__ import annotations

import enum

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from pathwaydataframework_spark.operators import similarity


class DistanceTypes(enum.Enum):
    """Reference _knn_lsh.py DistanceTypes."""

    EUCLIDEAN = "euclidean"
    COSINE = "cosine"


def knn_lsh_classifier_train(
    data: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int,
    bits: int = 16,
    bands: int = 8,
):
    """Returns a ``classify(queries, k)`` callable (the reference returns a
    lambda-wrapped table transformer too — _knn_lsh.py:325)."""

    def classify(
        queries: DataFrame,
        k: int = 3,
        *,
        query_id_col: str = "vec_id",
        query_vec_col: str = "embedding",
    ) -> DataFrame:
        # knn_lsh resolves the query frame against the CORPUS column names;
        # rename so the query-side overrides actually take effect
        q = queries
        if query_id_col != id_col:
            q = q.withColumnRenamed(query_id_col, id_col)
        if query_vec_col != vec_col:
            q = q.withColumnRenamed(query_vec_col, vec_col)
        hits = similarity.knn_lsh(
            data,
            q,
            id_col=id_col,
            vec_col=vec_col,
            dim=dim,
            k=k,
            bits=bits,
            bands=bands,
            exclude_self=False,
        )
        labels = data.select(
            F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("__label")
        )
        votes = (
            hits.join(labels, on="neighbor_id")
            .groupBy("query_id", "__label")
            .agg(F.count(F.lit(1)).alias("votes"), F.max("score").alias("best"))
        )
        # majority, ties by closer best-score then SMALLER label repr — a
        # min_by over (-votes, -best, label) so the final component sorts
        # ascending (a max_by struct would pick the LARGEST label on full
        # ties)
        return (
            votes.groupBy("query_id")
            .agg(
                F.min_by(
                    F.col("__label"),
                    F.struct(
                        (-F.col("votes")).alias("nv"),
                        (-F.col("best")).alias("nb"),
                        F.col("__label").cast("string").alias("lbl"),
                    ),
                ).alias("predicted_label")
            )
        )

    return classify


knn_lsh_train = knn_lsh_classifier_train
knn_lsh_generic_classifier_train = knn_lsh_classifier_train
knn_lsh_euclidean_classifier_train = knn_lsh_classifier_train


def knn_lsh_classify(classifier, queries: DataFrame, k: int = 3, **kwargs) -> DataFrame:
    """Reference knn_lsh_classify(trained, queries)."""
    return classifier(queries, k=k, **kwargs)


def generate_euclidean_lsh_bucketer(d: int, M: int, L: int, A: float = 1.0, seed: int = 0):
    """Euclidean (p-stable) LSH bucketer — reference
    stdlib/ml/classifiers/_lsh.py:31.

    Projects a vector on ``M·L`` seeded random unit lines, floor-divides
    by bucket length ``A``, and hashes each band's M-tuple to one stable
    integer — returns ``bucketify(x) -> list[int]`` of length ``L``
    (process-independent md5 band hashes, so executor-side evaluation is
    deterministic)."""
    import hashlib

    import numpy as np

    rng = np.random.default_rng(seed)
    lines = rng.standard_normal((d, M * L))
    lines = lines / np.linalg.norm(lines, axis=0)
    shift = rng.random(M * L) * A

    def bucketify(x) -> list[int]:
        proj = np.floor_divide(
            np.asarray(x, dtype=float) @ lines + shift, A
        ).astype(np.int64)
        return [
            int.from_bytes(
                hashlib.md5(band.tobytes()).digest()[:8], "big", signed=True
            )
            for band in proj.reshape(L, M)
        ]

    return bucketify


def generate_cosine_lsh_bucketer(d: int, M: int, L: int, seed: int = 0):
    """Cosine (random-hyperplane) LSH bucketer — reference _lsh.py:58.
    Each band packs M sign bits into one integer."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((d, M * L))

    def bucketify(x) -> list[int]:
        bits = (np.asarray(x, dtype=float) @ planes > 0).astype(np.int64)
        out = []
        for band in bits.reshape(L, M):
            v = 0
            for b in band:
                v = (v << 1) | int(b)
            out.append(v)
        return out

    return bucketify


def clustering_via_lsh(
    df: DataFrame,
    bucketer,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 5,
) -> DataFrame:
    """LSH-blocked clustering — reference
    stdlib/ml/classifiers/_clustering_via_lsh.py:31.

    Same algorithm shape as the reference: (1) every point lands in L
    (band, bucket) cells, (2) each cell's centroid becomes a weighted
    representative, (3) k-means runs over the (small) representative set,
    (4) every point takes the majority label of its L representatives.
    Deviation: step 3 uses this engine's deterministic distributed k-means
    (clustering.kmeans) instead of the reference's driver-side sklearn
    KMeans — the reference's exact labels depend on sklearn internals and
    are not reproducible cross-engine anyway.  Returns (id_col, label).
    """
    import pandas as pd

    from pathwaydataframework_spark.operators.clustering import kmeans_fit
    from pathwaydataframework_spark.operators.similarity import cosine_similarity  # noqa: F401 — parity import

    spark_schema = f"{id_col} long, band int, bucket long"

    def _bucketize(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for band, bucket in enumerate(bucketer(r[vec_col])):
                    rows.append((r[id_col], band, bucket))
            yield pd.DataFrame(rows, columns=[id_col, "band", "bucket"])

    cells = df.select(id_col, vec_col).mapInPandas(_bucketize, spark_schema)
    pts = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    flat = cells.join(pts, on=id_col)
    dim = len(df.select(vec_col).first()[0])
    reps = (
        flat.groupBy("band", "bucket")
        .agg(
            F.array(
                *[F.sum(F.col("__v")[i]).alias(f"s{i}") for i in range(dim)]
            ).alias("__sum"),
            F.count(F.lit(1)).alias("weight"),
        )
        .withColumn(
            "__mean", F.transform(F.col("__sum"), lambda s: s / F.col("weight"))
        )
        .withColumn("rep_id", F.xxhash64("band", "bucket"))
        .localCheckpoint(eager=True)  # representatives: small, reused 2×
    )
    assigned, _ = kmeans_fit(reps, "rep_id", "__mean", k, iterations=iterations)
    labeled_reps = reps.join(assigned.withColumnRenamed("_id", "rep_id"), on="rep_id")
    votes = flat.join(
        labeled_reps.select("band", "bucket", "cluster"), on=["band", "bucket"]
    )
    majority = (
        votes.groupBy(id_col, "cluster")
        .agg(F.count(F.lit(1)).alias("__n"))
        .groupBy(id_col)
        .agg(
            F.max_by(
                F.col("cluster"), F.struct(F.col("__n"), -F.col("cluster"))
            ).alias("label")
        )
    )
    return majority

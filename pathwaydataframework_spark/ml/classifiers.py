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

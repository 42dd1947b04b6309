"""Reference stdlib/ml/utils.py."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def classifier_accuracy(predicted: DataFrame, exact: DataFrame, *,
                        id_col: str = "query_id",
                        predicted_col: str = "predicted_label",
                        label_col: str = "label") -> DataFrame:
    """Reference ml/utils.py:13 — one-row table with the match count per
    correctness flag (the reference returns counts grouped by matched)."""
    joined = predicted.join(exact, on=id_col)
    return (
        joined.select(
            (F.col(predicted_col) == F.col(label_col)).alias("matched")
        )
        .groupBy("matched")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

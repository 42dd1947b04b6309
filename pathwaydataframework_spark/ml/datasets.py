"""Reference stdlib/ml/datasets — benchmark dataset fetchers.

The reference downloads public classification sets over HTTP; this
container has no network, and dataset download is service-layer anyway.
The local-file loader below accepts the same (vector, label) jsonlines
layout so ported code only swaps the fetch for a path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_classification_jsonlines(
    spark: SparkSession, path: str, *, schema: str = "vec_id long, embedding array<double>, label string"
) -> DataFrame:
    return spark.read.schema(schema).json(path)

"""Loaders for the driver's synthetic tables (TESTDATA.md).

Handles the one physical quirk in the fixtures: ``events.parquet`` stores
``ts`` as parquet TIMESTAMP(NANOS), which Spark's vectorized reader rejects.
We read nanos as long (legacy conf, runtime-settable) and rebuild a
microsecond TIMESTAMP_NTZ with exact integer arithmetic (``DIV 1000`` —
floor, matching DuckDB's nanos→micros truncation).

All timestamps surface as TIMESTAMP_NTZ so results hash identically to the
DuckDB oracle regardless of the host session's timezone.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from pathwaydataframework_spark.internals.table import Table

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_confs(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_df(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        t = field.dataType.simpleString()
        if name == "events" and field.name == "ts" and t == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
            )
        elif t == "timestamp":
            # normalize LTZ→NTZ under the UTC session so values are tz-free
            df = df.withColumn(field.name, df[field.name].cast("timestamp_ntz"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> Table:
    return Table(load_df(spark, sf_dir, name))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, Table]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}

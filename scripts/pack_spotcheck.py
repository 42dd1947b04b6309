"""Spot-check: pack_no_straddle (applyInPandas fold per shard) vs
pack_by_offset (pure-window concatenate-and-cut) throughput at frontier
scale — how much does the honest Python crossing cost, and does it stay
linear?  Two passes per config; the SECOND is the number (first pays
whole-stage-codegen / Arrow warm-up).

Usage: python3 scripts/pack_spotcheck.py [rows] [shards]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from pathwaydataframework_spark.operators import packing


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    shards = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    docs = spark.range(rows).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37) % 400 + 1).alias("n_tok"),
    ).localCheckpoint()

    for rnd in ("warm-up", "measured"):
        for name, fn in (
            ("pack_by_offset", lambda: packing.pack_by_offset(
                docs, "doc_id", "n_tok", 2048, shards=shards)),
            ("pack_no_straddle", lambda: packing.pack_no_straddle(
                docs, "doc_id", "n_tok", 2048, shards=shards)),
        ):
            t0 = time.perf_counter()
            n = fn().agg(
                F.count(F.lit(1)), F.max("seq_id"), F.sum("start_offset")
            ).collect()[0][0]
            dt = time.perf_counter() - t0
            assert n == rows
            print(f"{rnd} {name}: {dt:.2f} s ({rows / dt / 1e6:.1f} M rows/s)")
    spark.stop()


if __name__ == "__main__":
    main()

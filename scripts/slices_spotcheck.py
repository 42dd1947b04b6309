"""Scale spot-check for read_packed_slices (SCALE.md r11).

Writes a synthetic packed dataset (N sequences over SHARDS shards),
then measures: (a) the full read_packed_dataset scan, (b) each rank's
read_packed_slices scan at WORLD ranks.  The claim under test: a rank's
cost tracks its SLICE, not the dataset — the shard%world filter is a
partition filter, so each rank lists/reads only its own directories.

Usage: python scripts/slices_spotcheck.py [n_seqs] [shards] [world]
"""
import json
import shutil
import sys
import tempfile
import time

import pyspark.sql.functions as F

import pathwaydataframework_spark as pw
from pathwaydataframework_spark.operators import packing

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
SHARDS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
WORLD = int(sys.argv[3]) if len(sys.argv) > 3 else 8

spark = pw.get_spark(app_name="slices_spotcheck", cpus="32")
spark.sparkContext.setLogLevel("ERROR")

seqs = spark.range(N).select(
    (F.col("id") % SHARDS).alias("shard"),
    (F.col("id") / SHARDS).cast("long").alias("seq_id"),
    F.array_repeat((F.col("id") % 997).cast("long"), 16).alias("token_ids"),
    F.lit(16).cast("long").alias("n_tokens"),
)
tmp = tempfile.mkdtemp(prefix="pw_slices_spot_")
try:
    t0 = time.perf_counter()
    manifest = packing.write_packed_dataset(seqs, tmp)
    t_write = time.perf_counter() - t0

    t0 = time.perf_counter()
    full, _ = packing.read_packed_dataset(spark, tmp, validate=False)
    n_full = full.agg(F.sum("n_tokens")).first()[0]
    t_full = time.perf_counter() - t0

    ranks = []
    total_rows = 0
    for r in range(WORLD):
        t0 = time.perf_counter()
        sl, info = packing.read_packed_slices(
            spark, tmp, WORLD, r, validate=False
        )
        # consume positions too, so the window + broadcast join are paid
        row = sl.agg(
            F.count(F.lit(1)).alias("n"), F.max("position").alias("maxp")
        ).first()
        dt = time.perf_counter() - t0
        assert row["maxp"] == row["n"] - 1  # contiguous 0..n-1
        total_rows += row["n"]
        ranks.append({"rank": r, "rows": int(row["n"]),
                      "sec": round(dt, 2)})
    assert total_rows == manifest["n_seqs"] == N
    print(json.dumps({
        "n_seqs": N, "shards": SHARDS, "world": WORLD,
        "write_sec": round(t_write, 2),
        "full_scan_sec": round(t_full, 2),
        "rank_scans": ranks,
        "mean_rank_sec": round(sum(r["sec"] for r in ranks) / WORLD, 2),
    }))
finally:
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()

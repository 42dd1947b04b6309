"""Scale spot-check for read_packed_slices (SCALE.md r11).

The claim under test: a rank's read cost tracks its SLICE, not the
dataset, because shard % world_size is a PARTITION filter (each rank
lists/reads only its own shard directories).  Protocol: grow the
dataset 8x (0.5M -> 4M sequences) while keeping every rank's slice
CONSTANT (2 shards x 62.5k seqs = 125k rows; world grows with the
shard count), and time rank 0's slice read (position window included)
at each size.  Pruning => flat; a post-scan filter would grow ~8x.
A control at the largest size applies the SAME rank predicate to a
NON-partition column (a hash of seq_id), which cannot prune — its cost
is the whole-dataset scan the partition filter avoids.

Usage: python scripts/slices_spotcheck.py
"""
import json
import shutil
import sys
import os
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

import pathwaydataframework_spark as pw
from pathwaydataframework_spark.operators import packing

PER_SHARD = 62_500
SIZES = [500_000, 1_000_000, 2_000_000, 4_000_000]

spark = pw.get_spark(app_name="slices_spotcheck", cpus="32")
spark.sparkContext.setLogLevel("ERROR")

results = []
control = None
for n in SIZES:
    shards = n // PER_SHARD
    world = shards // 2  # every rank owns exactly 2 shards = 125k rows
    seqs = spark.range(n).select(
        (F.col("id") % shards).alias("shard"),
        (F.col("id") / shards).cast("long").alias("seq_id"),
        F.array_repeat((F.col("id") % 997).cast("long"), 16).alias(
            "token_ids"
        ),
        F.lit(16).cast("long").alias("n_tokens"),
    )
    tmp = tempfile.mkdtemp(prefix="pw_slices_spot_")
    try:
        packing.write_packed_dataset(seqs, tmp)
        # warm the FS cache symmetrically, then time rank 0's slice
        packing.read_packed_dataset(spark, tmp, validate=False)[0].count()
        t0 = time.perf_counter()
        sl, _ = packing.read_packed_slices(spark, tmp, world, 0,
                                           validate=False)
        row = sl.agg(F.count(F.lit(1)).alias("n"),
                     F.max("position").alias("maxp")).first()
        dt = round(time.perf_counter() - t0, 2)
        assert row["maxp"] == row["n"] - 1 and row["n"] == 2 * PER_SHARD
        results.append({"n_seqs": n, "shards": shards, "world": world,
                        "rank0_rows": int(row["n"]), "rank0_sec": dt})
        if n == SIZES[-1]:
            # control: same-size slice selected on a NON-partition
            # column — the scan cannot prune, so it pays the dataset
            full, _ = packing.read_packed_dataset(spark, tmp,
                                                  validate=False)
            t0 = time.perf_counter()
            ctrl = full.filter(
                F.pmod(F.xxhash64("seq_id"), F.lit(world)) == 0
            ).agg(F.count(F.lit(1))).first()[0]
            control = {"rows": int(ctrl),
                       "sec": round(time.perf_counter() - t0, 2)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

print(json.dumps({"per_rank_rows": 2 * PER_SHARD, "scaling": results,
                  "no_prune_control_at_4M": control}))
spark.stop()

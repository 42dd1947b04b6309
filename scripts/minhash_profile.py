"""A/B profiler for q_minhash_lsh's r8->r10 bench rise (VERDICT r10 item 2).

Usage: python scripts/minhash_profile.py <tree_path> [sf_dir] [runs]

Runs the EXACT q_minhash_lsh composition (load documents ->
dedup.minhash_lsh_pairs n=3, num_hashes=16, bands=4, threshold=0.8)
from the given tree in a fresh process: one sf0.001 warmup, then
`runs` timed executions at sf_dir, printing per-run wall seconds and
min/median as one JSON line.  Alternate invocations between the r8
tree and HEAD to cancel host drift (the bench box swings 30-70%
across hours — BASELINE.md).
"""
import json
import sys
import time

tree = sys.argv[1]
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
sys.path.insert(0, tree)

import pathwaydataframework_spark as pw  # noqa: E402
from pathwaydataframework_spark.data import load_table  # noqa: E402
from pathwaydataframework_spark.operators import dedup  # noqa: E402

spark = pw.get_spark(app_name="minhash_ab", cpus="32")
spark.sparkContext.setLogLevel("ERROR")


def q(sf):
    docs = load_table(spark, sf, "documents").df
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=16, bands=4, threshold=0.8
    )


q("/root/testdata/sf0.001").count()  # warmup (codegen compile)
times = []
for _ in range(runs):
    t0 = time.perf_counter()
    n = q(sf_dir).count()
    times.append(round(time.perf_counter() - t0, 3))


def spin():
    t0 = time.perf_counter()
    x = 0
    for i in range(5_000_000):
        x += i
    return time.perf_counter() - t0


calib = round(min(spin() for _ in range(3)) * 1000, 1)
print(json.dumps({
    "tree": tree, "sf": sf_dir, "rows": n, "runs": times,
    "min": min(times), "median": sorted(times)[len(times) // 2],
    "calib_spin_ms": calib,
}))
spark.stop()

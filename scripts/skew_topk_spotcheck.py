"""Skew spot-check for per_key_topk (per-site quotas).

Synthesizes an N-row (default 5M) keyed frame at three skew levels —
uniform over 100k keys, 50% on one hot key, 90% on one hot key — and
times sampling.per_key_topk's single rank-window plan against the
classic hand-salted two-phase rewrite on the same session.

Finding (recorded in SCALE.md): the single window WINS at every skew
level, because Catalyst's InferWindowGroupLimit rule already lowers
``row_number() <= k`` to a two-phase group limit — a Partial
WindowGroupLimit below the exchange caps each key at k rows per input
partition map-side (no hot-key straggler), a Final one after.  The
hand-salted rewrite pays an extra exchange for a dedup Catalyst already
performs.  Both arms return identical rows (asserted).

Run: python3 scripts/skew_topk_spotcheck.py  [SKEW_ROWS=5000000]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

import pathwaydataframework_spark as pw  # noqa: E402
from pathwaydataframework_spark.operators import sampling  # noqa: E402

ROWS = int(os.environ.get("SKEW_ROWS", "5000000"))
KEYS = 100_000
K = 10


def build(spark, hot_frac: float):
    """id-derived frame: hot_frac of rows on key 'hot', rest uniform."""
    d = spark.range(ROWS).withColumnRenamed("id", "doc_id")
    cut = int(hot_frac * 1000)
    key = F.when(F.col("doc_id") % 1000 < cut, F.lit("hot")).otherwise(
        F.concat(F.lit("k"), F.pmod(F.xxhash64("doc_id"), F.lit(KEYS)))
    )
    score = F.pmod(F.xxhash64(F.col("doc_id") + 7), F.lit(1_000_003))
    return d.select("doc_id", key.alias("key"), score.alias("score"))


def salted_topk(df, salts: int = 32):
    """The pre-WindowGroupLimit skew rewrite, kept here as the benchmark
    comparison arm: phase-1 top-k within (key, salt), phase-2 top-k of
    the ≤ salts·k survivors per key."""
    from pyspark.sql import Window as W

    order = [F.col("score").desc(), F.col("doc_id").asc()]
    w1 = W.partitionBy("key", "__salt").orderBy(*order)
    w2 = W.partitionBy("key").orderBy(*order)
    return (
        df.withColumn("__salt", F.pmod(F.xxhash64("doc_id"), F.lit(salts)))
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= K)
        .drop("__salt", "__r1")
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= K)
    )


def timed(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = pw.get_spark(app_name="skew-topk-spotcheck")
    spark.sparkContext.setLogLevel("ERROR")

    def builtin(df):
        return sampling.per_key_topk(df, "key", "score", k=K, tie_col="doc_id")

    # warmup: compile both plans' codegen once, untimed
    warm = build(spark, 0.0).limit(100_000)
    builtin(warm).write.format("noop").mode("overwrite").save()
    salted_topk(warm).write.format("noop").mode("overwrite").save()

    print(f"# rows={ROWS}, keys≈{KEYS}, k={K}")
    print("| hot-key share | single window (s) | hand-salted (s) | single/salted |")
    print("|---|---|---|---|")
    for hot in (0.0, 0.5, 0.9):
        df = build(spark, hot)
        # full result-set equality, not just the hot key (which doesn't
        # even exist at hot=0): both directions of exceptAll are empty
        a, b = builtin(df), salted_topk(df).select(*builtin(df).columns)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, (
            f"results diverge at hot={hot}"
        )
        tw = timed(lambda: builtin(df))
        ts = timed(lambda: salted_topk(df))
        print(f"| {int(hot * 100)}% | {tw:.2f} | {ts:.2f} | {tw / ts:.2f}× |")
    spark.stop()


if __name__ == "__main__":
    main()

"""Spot-check: robots_allowed verdict throughput on a synthetic 5M-row
frontier x 10k hosts x ~6 rules/host, with the wildcard share of rules
varied 0% / 10% / 100% — does matching every rule via LIKE on a
DYNAMIC pattern (parsed per evaluation, since rules arrive as data)
cost enough over plain startswith to justify a prefix fast path?

Answer (SCALE.md r8): no — warm throughput is flat (~1.7 M rows/s/node)
across all wildcard shares; the first measurement of a session is 2-8x
slower from whole-stage-codegen JIT, not pattern parsing, so this
script runs two passes and the SECOND is the number.

Usage: python3 scripts/robots_match_spotcheck.py [rows] [hosts]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from pathwaydataframework_spark.operators import text


def build_rules(spark, n_hosts: int, wild_share: float):
    """~6 rules per host; a wild_share fraction of hosts get '*'/'$'
    wildcard rules, the rest plain prefixes."""
    hosts = spark.range(n_hosts).select(
        F.concat(F.lit("h"), F.col("id"), F.lit(".test")).alias("host"),
        (F.col("id") % 100 < int(wild_share * 100)).alias("wild"),
    )
    plain = [
        "User-agent: *",
        "Disallow: /private",
        "Allow: /private/pub",
        "Disallow: /tmp",
        "Disallow: /cgi-bin",
        "Allow: /",
    ]
    wildcarded = [
        "User-agent: *",
        "Disallow: /*.php$",
        "Allow: /pub*.php$",
        "Disallow: /private*",
        "Disallow: /*?session=",
        "Allow: /",
    ]
    robots = hosts.select(
        "host",
        F.when(F.col("wild"), F.lit("\n".join(wildcarded)))
        .otherwise(F.lit("\n".join(plain)))
        .alias("robots_txt"),
    )
    return text.parse_robots(robots)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    frontier = spark.range(rows).select(
        F.col("id").alias("rid"),
        F.concat(
            F.lit("https://h"), F.col("id") % n_hosts, F.lit(".test"),
            F.when(F.col("id") % 7 == 0, F.lit("/private/x"))
            .when(F.col("id") % 7 == 1, F.lit("/private/pub/y"))
            .when(F.col("id") % 7 == 2, F.concat(F.lit("/a/page"), F.col("id") % 50, F.lit(".php")))
            .otherwise(F.concat(F.lit("/ok/"), F.col("id") % 1000)),
        ).alias("url"),
    ).localCheckpoint()

    for rnd in ("warm-up", "measured"):
        for wild_share in (0.0, 0.1, 1.0):
            rules = build_rules(spark, n_hosts, wild_share).localCheckpoint()
            out = text.robots_allowed(frontier, rules)
            t0 = time.perf_counter()
            counts = {
                r["allowed"]: r["count"]
                for r in out.groupBy("allowed").count().collect()
            }
            dt = time.perf_counter() - t0
            print(
                f"{rnd} wild_share={wild_share:.0%}: {dt:.2f} s "
                f"({rows / dt / 1e6:.1f} M rows/s) verdicts={counts}"
            )
    spark.stop()


if __name__ == "__main__":
    main()

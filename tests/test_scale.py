"""Skew-salted joins and bucketed co-located joins — result parity plus the
plan property each exists for."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pathwaydataframework_spark.operators import scale
from pathwaydataframework_spark.plans import formatted_plan


def test_salted_join_matches_plain(spark):
    # skewed probe: 90% of rows share key 1
    probe = spark.createDataFrame(
        [(1, i) for i in range(90)] + [(2, i) for i in range(10)], "k long, pv long"
    )
    build = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "none")], "k long, bv string")
    plain = {(r["k"], r["pv"], r["bv"]) for r in probe.join(build, on="k").collect()}
    salted = {
        (r["k"], r["pv"], r["bv"])
        for r in scale.salted_join(probe, build, "k", salt=8).collect()
    }
    assert salted == plain


def test_salted_groupby_count(spark):
    df = spark.createDataFrame([(1,)] * 95 + [(2,)] * 5, "k long")
    got = {r["k"]: r["n"] for r in scale.salted_groupby_count(df, "k", salt=8).collect()}
    assert got == {1: 95, 2: 5}


def test_bucketed_join_no_exchange(spark, tmp_path):
    # managed tables land in the default warehouse dir; a stale location from
    # a killed run blocks CREATE, so clear both catalog entry and directory
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name in ("bk_a", "bk_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
    a = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    scale.write_bucketed(a, "bk_a", bucket_by="k", num_buckets=8, sort_by="k")
    scale.write_bucketed(b, "bk_b", bucket_by="k", num_buckets=8, sort_by="k")
    ta = scale.read_bucketed(spark, "bk_a")
    tb = scale.read_bucketed(spark, "bk_b")
    # tiny tables would broadcast; disable that to exercise the bucketed layout
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, on="k")
        plan = formatted_plan(joined)
        assert "Exchange hashpartitioning" not in plan, "bucketed join must not shuffle"
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")


def test_salted_join_rejects_outer_modes(spark):
    from pathwaydataframework_spark.operators import scale

    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(1, "y")], "k long, w string")
    with pytest.raises(ValueError, match="inner/left"):
        scale.salted_join(a, b, "k", how="full")
    with pytest.raises(ValueError, match="inner/left"):
        scale.salted_join(a, b, "k", how="right")


def test_salted_groupby_spreads_duplicate_rows(spark):
    from pathwaydataframework_spark.operators import scale

    # a key-only frame: every hot-key row is byte-identical, the exact
    # case a value-hash salt cannot spread (review regression)
    df = spark.createDataFrame([("hot",)] * 200 + [("cold",)] * 3, "k string")
    out = {r["k"]: r["n"] for r in scale.salted_groupby_count(df, "k", salt=8).collect()}
    assert out == {"hot": 200, "cold": 3}
    salted = df.withColumn(
        "__salt",
        __import__("pyspark.sql.functions", fromlist=["F"]).pmod(
            __import__("pyspark.sql.functions", fromlist=["F"]).monotonically_increasing_id(), 8
        ),
    )
    n_salts = salted.filter("k = 'hot'").select("__salt").distinct().count()
    assert n_salts > 1  # duplicates actually spread across salts

"""UDF disk caching: per-call DiskCache strategy and the distributed
parquet memo-join (apply_with_disk_cache)."""

from __future__ import annotations

import os

from pathwaydataframework_spark.internals.table import Table
from pathwaydataframework_spark.internals.udfs import (
    DiskCache,
    apply_with_disk_cache,
)


def test_disk_cache_strategy_persists_across_wrappers(tmp_path):
    calls = []

    def slow_double(x):
        calls.append(x)
        return x * 2

    cache = DiskCache(str(tmp_path / "cache"))
    f1 = cache.wrap(slow_double)
    assert [f1(1), f1(2), f1(1)] == [2, 4, 2]
    assert calls == [1, 2]
    # a FRESH wrapper (≈ new run / new executor) reuses the on-disk results
    f2 = DiskCache(str(tmp_path / "cache")).wrap(slow_double)
    assert [f2(1), f2(2), f2(3)] == [2, 4, 6]
    assert calls == [1, 2, 3]


def test_apply_with_disk_cache_memo_join(spark, tmp_path):
    cache_path = str(tmp_path / "memo")
    marker_dir = str(tmp_path / "markers")
    os.makedirs(marker_dir)

    # side-effect marker files let us count UDF invocations across the
    # executor python processes
    def expensive(x):
        import uuid

        with open(os.path.join(marker_dir, f"{x}_{uuid.uuid4().hex}"), "w"):
            pass
        return x * 10

    # heavy argument repetition: 4 distinct values over 40 rows
    t = Table(spark.range(0, 40).selectExpr("id % 4 as x"))
    out = apply_with_disk_cache(
        t, expensive, ["x"], out_name="y", out_type=int, cache_path=cache_path
    )
    got = {(r["x"], r["y"]) for r in out.df.collect()}
    assert got == {(i, i * 10) for i in range(4)}
    n_first = len(os.listdir(marker_dir))
    assert n_first == 4, "each distinct arg computed exactly once cluster-wide"

    # second run: all hits — Python must not be invoked at all
    out2 = apply_with_disk_cache(
        t, expensive, ["x"], out_name="y", out_type=int, cache_path=cache_path
    )
    assert {(r["x"], r["y"]) for r in out2.df.collect()} == got
    assert len(os.listdir(marker_dir)) == n_first

    # superset of args: only the new distinct value is computed
    t3 = Table(spark.range(0, 50).selectExpr("id % 5 as x"))
    out3 = apply_with_disk_cache(
        t3, expensive, ["x"], out_name="y", out_type=int, cache_path=cache_path
    )
    assert {(r["x"], r["y"]) for r in out3.df.collect()} == {
        (i, i * 10) for i in range(5)
    }
    assert len(os.listdir(marker_dir)) == n_first + 1

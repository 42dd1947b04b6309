"""Error-channel semantics — reference Error values from checked arithmetic.

The reference's engine yields a recoverable Error VALUE for division by
zero / mod by zero / int64 overflow (expression.rs checked ops), which
``fill_error`` recovers and ``remove_errors`` drops.  This engine's error
channel is null (SURVEY §7): the arithmetic dispatches must route those
conditions to null via try_* even under Spark 4's default ANSI mode —
a plain `/` would abort the entire job, which is catastrophically wrong
at 100 TB (one bad row kills the pipeline)."""

from __future__ import annotations

import pytest

import pathwaydataframework_spark as pw


@pytest.fixture(scope="module")
def t(spark):
    return pw.Table.from_rows(
        spark,
        [(10.0, 0.0, 7, 0), (9.0, 3.0, 7, -2), (4.0, 2.0, 7, 3)],
        "a double, b double, x long, m long",
    )


def test_div_by_zero_flows_to_null_channel(spark, t):
    rows = {r["b"]: r["r"] for r in t.select(b=pw.this.b, r=pw.this.a / pw.this.b).df.collect()}
    assert rows[0.0] is None
    assert rows[3.0] == 3.0


def test_fill_error_recovers_division(spark, t):
    rows = t.select(r=pw.fill_error(pw.this.a / pw.this.b, -1.0)).df.collect()
    assert sorted(r["r"] for r in rows) == [-1.0, 2.0, 3.0]


def test_remove_errors_drops_error_rows(spark, t):
    out = t.select(r=pw.this.a / pw.this.b).remove_errors()
    assert out.df.count() == 2


def test_mod_by_zero_nulls_and_floor_mod_sign(spark, t):
    rows = {r["m"]: r["r"] for r in t.select(m=pw.this.m, r=pw.this.x % pw.this.m).df.collect()}
    assert rows[0] is None            # mod by zero → error channel
    assert rows[-2] == -1             # floor-mod: sign of divisor (7 % -2)
    assert rows[3] == 1


def test_int64_overflow_nulls_instead_of_aborting(spark):
    big = pw.Table.from_rows(
        spark, [(2**62, 2**62), (3, 4)], "p long, q long"
    )
    add = {r["p"]: r["s"] for r in big.select(p=pw.this.p, s=pw.this.p + pw.this.q).df.collect()}
    assert add[2**62] is None and add[3] == 7
    mul = {r["p"]: r["s"] for r in big.select(p=pw.this.p, s=pw.this.p * pw.this.q).df.collect()}
    assert mul[2**62] is None and mul[3] == 12
    sub = {r["p"]: r["s"] for r in big.select(p=pw.this.p, s=pw.this.p - (0 - pw.this.q)).df.collect()}
    assert sub[2**62] is None and sub[3] == 7


def test_floordiv_by_zero_nulls(spark, t):
    rows = {r["b"]: r["r"] for r in t.select(b=pw.this.b, r=pw.this.a // pw.this.b).df.collect()}
    assert rows[0.0] is None
    assert rows[3.0] == 3.0


def test_timestamp_arithmetic_still_native(spark):
    # temporal subtraction must keep the native operator (try_subtract
    # rejects timestamp-timestamp)
    import datetime

    ts = pw.Table.from_rows(
        spark,
        [(datetime.datetime(2024, 1, 2), datetime.datetime(2024, 1, 1))],
        "a timestamp_ntz, b timestamp_ntz",
    )
    out = ts.select(d=pw.this.a - pw.this.b).df.collect()[0]["d"]
    assert out == datetime.timedelta(days=1)


def test_malformed_cast_flows_to_null_channel(spark):
    t = pw.Table.from_rows(spark, [("12",), ("nope",)], "s string")
    vals = sorted(
        (r["v"] is None, r["v"])
        for r in t.select(v=pw.cast(int, pw.this.s)).df.collect()
    )
    assert vals == [(False, 12), (True, None)]
    # accessor form and table-level form behave identically
    assert sorted(
        r["v"] for r in t.select(v=pw.fill_error(pw.this.s.as_int(), -1)).df.collect()
    ) == [-1, 12]
    casted = t.cast_to_types(s="long")
    assert sorted((r["s"] is None, r["s"]) for r in casted.df.collect()) == [
        (False, 12),
        (True, None),
    ]


def test_strptime_malformed_flows_to_null_channel(spark):
    t = pw.Table.from_rows(
        spark, [("2024-01-02 03:04:05",), ("not a date",)], "s string"
    )
    out = t.select(ts=pw.this.s.dt.strptime("yyyy-MM-dd HH:mm:ss"))
    vals = sorted((r["ts"] is None) for r in out.df.collect())
    assert vals == [False, True]

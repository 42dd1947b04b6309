"""Scalar namespace semantics vs Python ground truth — mirrors the
reference's tests/expressions/ suite (SURVEY.md §5)."""

from __future__ import annotations

import datetime as dt

import pytest

import pathwaydataframework_spark as pw


def one(table):
    return tuple(table.df.collect()[0])


@pytest.fixture
def strings(spark):
    return pw.Table.from_rows(
        spark, [("Hello World",), ("  pad  ",)], "s string"
    )


def test_str_namespace(spark):
    t = pw.Table.from_rows(spark, [("Hello World",)], "s string")
    s = pw.this.s.str
    out = t.select(
        lower=s.lower(),
        upper=s.upper(),
        rev=s.reversed(),
        ln=s.len(),
        rep=s.replace("World", "there"),
        sw=s.startswith("Hello"),
        ew=s.endswith("World"),
        swap=s.swapcase(),
        title=s.title(),
        cnt=s.count("l"),
        fnd=s.find("World"),
        rfnd=s.rfind("l"),
        rp=s.removeprefix("Hello "),
        rs=s.removesuffix(" World"),
        sl=s.slice(0, 5),
    )
    ref = "Hello World"
    assert one(out) == (
        ref.lower(),
        ref.upper(),
        ref[::-1],
        len(ref),
        ref.replace("World", "there"),
        True,
        True,
        ref.swapcase(),
        "Hello World".title(),
        ref.count("l"),
        ref.find("World"),
        ref.rfind("l"),
        ref.removeprefix("Hello "),
        ref.removesuffix(" World"),
        ref[0:5],
    )


def test_str_parse(spark):
    t = pw.Table.from_rows(spark, [("42", "2.5", "true")], "i string, f string, b string")
    out = t.select(
        i=pw.this.i.str.parse_int(),
        f=pw.this.f.str.parse_float(),
        b=pw.this.b.str.parse_bool(),
    )
    assert one(out) == (42, 2.5, True)


def test_dt_namespace(spark):
    ts = dt.datetime(2024, 3, 15, 14, 30, 45, 123456)
    t = pw.Table.from_rows(spark, [(ts,)], "ts timestamp_ntz")
    d = pw.this.ts.dt
    out = t.select(
        y=d.year(),
        mo=d.month(),
        dd=d.day(),
        h=d.hour(),
        mi=d.minute(),
        s=d.second(),
        us=d.microsecond(),
        wd=d.weekday(),
        q=d.quarter(),
        epoch=d.timestamp(),
    )
    assert one(out) == (
        2024,
        3,
        15,
        14,
        30,
        45,
        123456,
        ts.weekday(),
        1,
        int(ts.replace(tzinfo=dt.timezone.utc).timestamp()),
    )


def test_dt_floor_strftime(spark):
    ts = dt.datetime(2024, 3, 15, 14, 37, 45)
    t = pw.Table.from_rows(spark, [(ts,)], "ts timestamp_ntz")
    out = t.select(
        fl=pw.this.ts.dt.floor("15 minutes"),
        s=pw.this.ts.dt.strftime("yyyy-MM-dd HH:mm"),
    )
    got = one(out)
    assert got[0] == dt.datetime(2024, 3, 15, 14, 30)
    assert got[1] == "2024-03-15 14:37"


def test_num_namespace(spark):
    t = pw.Table.from_rows(spark, [(-2.567,), (3.141,)], "x double")
    out = t.select(
        a=pw.this.x.num.abs(),
        r=pw.this.x.num.round(1),
    )
    vals = sorted(tuple(r) for r in out.df.collect())
    assert vals == [(2.567, -2.6), (3.141, 3.1)]


def test_arithmetic_and_container(spark):
    t = pw.Table.from_rows(spark, [(7, 2)], "a long, b long")
    out = t.select(
        add=pw.this.a + pw.this.b,
        fdiv=pw.this.a // pw.this.b,
        mod=pw.this.a % pw.this.b,
        powr=pw.this.a ** pw.this.b,
        tup=pw.make_tuple(pw.this.a, pw.this.b),
        first=pw.make_tuple(pw.this.a, pw.this.b)[0],
        oob=pw.make_tuple(pw.this.a, pw.this.b).get(9, -1),
    )
    assert one(out) == (9, 3, 1, 49.0, [7, 2], 7, -1)


def test_negative_indexing(spark):
    """Python-style negative indices on tuples (reference expression.py Get)."""
    t = pw.Table.from_rows(spark, [(7, 2)], "a long, b long")
    tup = pw.make_tuple(pw.this.a, pw.this.b)
    out = t.select(last=tup[-1], first=tup[-2], oob=tup.get(-9, -1))
    assert one(out) == (2, 7, -1)


def test_unwrap_non_boolean(spark):
    """unwrap() must work on any optional type, not just boolean (ADVICE r1:
    the assert_true sentinel used to break analysis with a boolean cast)."""
    t = pw.Table.from_rows(spark, [(1, "x"), (2, "y")], "k long, s string")
    out = t.select(k=pw.unwrap(pw.this.k), s=pw.unwrap(pw.this.s))
    assert sorted(tuple(r) for r in out.df.collect()) == [(1, "x"), (2, "y")]

    import pyspark.errors

    bad = pw.Table.from_rows(spark, [(1, None)], "k long, s string")
    with pytest.raises(pyspark.errors.PySparkException):
        bad.select(s=pw.unwrap(pw.this.s)).df.collect()


def test_error_channel_is_null_channel_deviation(spark):
    """Executable pin of the documented per-cell Error deviation (VERDICT r1
    What's-missing #4; reference src/engine/value.rs:226, common.py:438).

    The reference carries a per-cell Error value distinct from None:
    ``fill_error`` replaces only Errors (legit nulls survive), and
    ``fill_error(unwrap(x), d)`` recovers rows where unwrap errored.

    Spark has no cell-level error value; our error channel IS null
    (SURVEY.md §7).  Consequences, pinned here:
    - fill_error ≡ coalesce: a legitimate null is indistinguishable from
      an error and gets the default too.
    - unwrap raises AT EXECUTION (raise_error), aborting the query rather
      than yielding a recoverable Error cell — fill_error cannot catch it.
    """
    t = pw.Table.from_rows(spark, [(1, 10), (2, None)], "k long, x long")
    # deviation 1: the legit null on row 2 is "recovered" as if it were an
    # error (the reference would keep None here)
    out = t.select(pw.this.k, x=pw.fill_error(pw.this.x, -1))
    assert sorted(tuple(r) for r in out.df.collect()) == [(1, 10), (2, -1)]

    # deviation 2: fill_error cannot recover an unwrap failure — the whole
    # query raises (the reference yields -1 for the error row)
    import pyspark.errors

    with pytest.raises(pyspark.errors.PySparkException):
        t.select(x=pw.fill_error(pw.unwrap(pw.this.x), -1)).df.collect()


@pytest.mark.parametrize(
    "timezone, last_existing",
    [
        ("Europe/Warsaw", "2023-03-26 01:59:59"),
        ("America/New_York", "2023-03-12 01:59:59"),
        ("Australia/Lord_Howe", "2022-10-02 01:59:59"),  # 30-minute DST gap
        ("Pacific/Apia", "2010-09-25 23:59:59"),
    ],
)
def test_non_existing_local_time_to_utc(spark, timezone, last_existing):
    """Mirror of the reference's DST-gap suite
    (tests/expressions/test_non_existing_date_time_conversion.py): converting
    a non-existent local time (1 s into the spring-forward gap) to UTC must
    equal converting the last existing second and adding 1 s — java.time's
    gap-forward adjustment gives the reference semantics natively."""
    t = pw.Table.from_rows(spark, [(last_existing,)], "s string")
    naive = t.select(ts=pw.this.s.dt.strptime("yyyy-MM-dd HH:mm:ss"))
    a = naive.select(
        u=(pw.this.ts + dt.timedelta(seconds=1)).dt.to_utc(timezone)
    ).df.collect()[0][0]
    b = naive.select(u=pw.this.ts.dt.to_utc(timezone)).df.collect()[0][0]
    assert a == b + dt.timedelta(seconds=1)


def test_fall_back_ambiguous_local_time_to_utc(spark):
    """Fall-back overlap: java.time (and hence to_utc) resolves ambiguous
    local times to the EARLIER (pre-transition) offset — documented
    determinism, matching chrono-tz's default the reference relies on."""
    t = pw.Table.from_rows(spark, [("2023-11-05 01:30:00",)], "s string")
    out = t.select(
        u=pw.this.s.dt.strptime("yyyy-MM-dd HH:mm:ss").dt.to_utc("America/New_York")
    )
    # earlier offset is EDT (UTC-4): 01:30 EDT == 05:30 UTC
    assert out.df.collect()[0][0] == dt.datetime(2023, 11, 5, 5, 30, 0)


def test_str_count_find_rfind_with_slice_bounds(spark):
    # reference tests/expressions/test_string.py test_count/test_find/
    # test_rfind: optional start/end args use Python slice notation
    t = pw.Table.from_rows(
        spark,
        [("Alice",), ("olice",), ("Hello",), ("World",), ("Zoo",)],
        "name string",
    )
    out = t.select(
        c0=pw.this.name.str.count("o"),
        c1=pw.this.name.str.count("o", 1),
        c2=pw.this.name.str.count("o", 0, 3),
        f0=pw.this.name.str.find("o"),
        f1=pw.this.name.str.find("o", 2),
        r0=pw.this.name.str.rfind("o"),
        r1=pw.this.name.str.rfind("o", 0, 3),
    )
    got = [tuple(r) for r in out.df.collect()]
    exp = [
        (s.count("o"), s.count("o", 1), s.count("o", 0, 3),
         s.find("o"), s.find("o", 2), s.rfind("o"), s.rfind("o", 0, 3))
        for s in ["Alice", "olice", "Hello", "World", "Zoo"]
    ]
    assert sorted(got) == sorted(exp)


def test_str_count_find_rfind_negative_slice_bounds(spark):
    # Python slice semantics: negative start/end count from the string end
    # (length+bound clamped to [0, length]) — e.g. count('l', 0, -1) must
    # exclude the final character, not silently scan the full string
    t = pw.Table.from_rows(
        spark,
        [("Hello",), ("llll",), ("ol",), ("x",)],
        "name string",
    )
    out = t.select(
        c0=pw.this.name.str.count("l", 0, -1),
        c1=pw.this.name.str.count("l", -3),
        c2=pw.this.name.str.count("l", -2, -1),
        f0=pw.this.name.str.find("l", -3),
        f1=pw.this.name.str.find("l", 0, -1),
        r0=pw.this.name.str.rfind("l", 0, -1),
        r1=pw.this.name.str.rfind("l", -2),
        c3=pw.this.name.str.count("l", -99, 99),
    )
    got = [tuple(r) for r in out.df.collect()]
    exp = [
        (s.count("l", 0, -1), s.count("l", -3), s.count("l", -2, -1),
         s.find("l", -3), s.find("l", 0, -1),
         s.rfind("l", 0, -1), s.rfind("l", -2), s.count("l", -99, 99))
        for s in ["Hello", "llll", "ol", "x"]
    ]
    assert sorted(got) == sorted(exp)


def test_parse_bool_reference_semantics(spark):
    # default sets: on/true/yes/1 → True, off/false/no/0 → False,
    # anything else → NULL; custom mappings respected
    t = pw.Table.from_rows(
        spark,
        [("0",), ("TRUE",), ("on",), ("maybe",)],
        "a string",
    )
    out = t.select(a=pw.this.a, b=pw.this.a.str.parse_bool())
    got = {r["a"]: r["b"] for r in out.df.collect()}
    assert got == {"0": False, "TRUE": True, "on": True, "maybe": None}
    out2 = t.select(
        a=pw.this.a,
        b=pw.this.a.str.parse_bool(true_values=["maybe"], false_values=["0"]),
    )
    got2 = {r["a"]: r["b"] for r in out2.df.collect()}
    assert got2 == {"0": False, "TRUE": None, "on": None, "maybe": True}


def test_num_round_column_precision(spark):
    # reference tests/expressions/test_numerical.py test_round_column
    t = pw.Table.from_rows(
        spark,
        [(3.0, 0), (3.1, 1), (3.14, 1), (3.141, 2), (3.1415, 2)],
        "value double, precision long",
    )
    out = t.select(v=pw.this.value.num.round(pw.this.precision))
    got = sorted(r["v"] for r in out.df.collect())
    assert got == [3.0, 3.1, 3.1, 3.14, 3.14]

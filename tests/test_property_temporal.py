"""Property-based checks (hypothesis) for the trickiest operators: asof and
interval joins over randomized inputs vs brute-force Python oracles.  The
reference has no property testing (SURVEY §5) — this goes beyond it where
off-by-one time semantics are easiest to get wrong.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

import pathwaydataframework_spark as pw
from pathwaydataframework_spark.operators.temporal import interval


T0 = dt.datetime(2024, 1, 1)

# small key/time domains force collisions, ties, and empty matches
events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 40)), min_size=1, max_size=12
)


def _mk(spark, rows, prefix):
    data = [
        (i, k, T0 + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(rows)
    ]
    return pw.Table.from_rows(
        spark, data, f"{prefix}id long, k long, {prefix}t timestamp_ntz"
    )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(l=events, r=events, direction=st.sampled_from(["backward", "forward"]))
def test_asof_join_matches_bruteforce(spark, l, r, direction):
    lt = _mk(spark, l, "l")
    rt = _mk(spark, r, "r")
    j = lt.asof_join(
        rt, pw.this.lt, pw.this.rt, pw.left.k == pw.right.k,
        how="left", direction=direction,
    )
    out = {
        (row["lid"], row["rid"])
        for row in j.select(pw.left.lid, rid=pw.right.rid).df.collect()
    }

    expected = set()
    for lid, (lk, ls) in enumerate(l):
        if direction == "backward":
            cands = [(rs, -rid) for rid, (rk, rs) in enumerate(r) if rk == lk and rs <= ls]
            best = max(cands)[1] if cands else None
            expected.add((lid, -best if best is not None else None))
        else:
            cands = [(rs, rid) for rid, (rk, rs) in enumerate(r) if rk == lk and rs >= ls]
            best = min(cands)[1] if cands else None
            expected.add((lid, best))
    # ties on time: engine picks deterministically among equal times; compare
    # by matched TIME rather than id where ties exist
    def time_of(side, idx):
        return None if idx is None else side[idx][1]

    out_times = {(lid, time_of(r, rid)) for lid, rid in out}
    exp_times = {(lid, time_of(r, rid)) for lid, rid in expected}
    assert out_times == exp_times


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(l=events, r=events, lb=st.integers(-10, 5), width=st.integers(0, 15))
def test_interval_join_matches_bruteforce(spark, l, r, lb, width):
    ub = lb + width
    lt = _mk(spark, l, "l")
    rt = _mk(spark, r, "r")
    j = lt.interval_join(
        rt, pw.this.lt, pw.this.rt, interval(float(lb), float(ub)),
        pw.left.k == pw.right.k,
    )
    out = {
        (row["lid"], row["rid"])
        for row in j.select(pw.left.lid, rid=pw.right.rid).df.collect()
    }
    expected = {
        (lid, rid)
        for lid, (lk, ls) in enumerate(l)
        for rid, (rk, rs) in enumerate(r)
        if lk == rk and lb <= rs - ls <= ub
    }
    assert out == expected


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=events, gap=st.integers(1, 8))
def test_session_window_matches_bruteforce(spark, rows, gap):
    """session(max_gap): counts per (key, session) == Python sessionization."""
    t = _mk(spark, rows, "e")
    out = sorted(
        (r["k"], r["n"])
        for r in t.windowby(
            pw.this.et, window=pw.session(max_gap=f"{gap} seconds"),
            instance=pw.this.k,
        ).reduce(n=pw.reducers.count()).df.collect()
    )

    by_key = {}
    for k, s in rows:
        by_key.setdefault(k, []).append(s)
    expected = []
    for k, times in by_key.items():
        times.sort()
        count = 1
        for prev, cur in zip(times, times[1:]):
            # reference merge is STRICT (next - cur < max_gap): exactly-gap
            # events split (_window.py:80)
            if cur - prev >= gap:
                expected.append((k, count))
                count = 1
            else:
                count += 1
        expected.append((k, count))
    assert out == sorted(expected)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=events, size=st.integers(2, 10))
def test_tumbling_window_matches_bruteforce(spark, rows, size):
    t = _mk(spark, rows, "e")
    out = sorted(
        (r["k"], r["_pw_window_start"], r["n"])
        for r in t.windowby(
            pw.this.et, window=pw.tumbling(f"{size} seconds"), instance=pw.this.k
        ).reduce(n=pw.reducers.count()).df.collect()
    )
    # windows align to the REFERENCE origin 1973-01-01 (temporal/utils.py:20)
    origin = dt.datetime(1973, 1, 1)
    expected = {}
    for k, s in rows:
        abs_s = int((T0 + dt.timedelta(seconds=s) - origin).total_seconds())
        start = origin + dt.timedelta(seconds=(abs_s // size) * size)
        expected[(k, start)] = expected.get((k, start), 0) + 1
    assert out == sorted((k, w, n) for (k, w), n in expected.items())

"""Predicate sessions, acceptor dedup, AsyncTransformer, multimodal plumbing,
JSON access."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

import pathwaydataframework_spark as pw
from pathwaydataframework_spark.operators import multimodal, stateful


def ts(m):
    return dt.datetime(2024, 1, 1, 10, m)


def test_session_predicate(spark):
    t = pw.Table.from_rows(
        spark,
        [("u1", ts(0), 1.0), ("u1", ts(4), 2.0), ("u1", ts(30), 3.0), ("u2", ts(1), 4.0)],
        "user string, t timestamp_ntz, v double",
    )
    out = stateful.session_windows_by_predicate(
        t,
        "t",
        lambda prev, nxt: (nxt - prev).total_seconds() <= 600,
        instance="user",
        aggregations={"n": ("v", "count"), "sv": ("v", "sum")},
    )
    got = sorted((r["user"], r["n"], r["sv"]) for r in out.df.collect())
    assert got == [("u1", 1, 3.0), ("u1", 2, 3.0), ("u2", 1, 4.0)]


def test_deduplicate_acceptor(spark):
    # accept a new value only if it is at least 2 bigger than the kept one
    t = pw.Table.from_rows(
        spark,
        [("a", 1), ("a", 2), ("a", 4), ("a", 5), ("b", 10)],
        "k string, v long",
    )
    out = t.deduplicate(
        value=pw.this.v, instance=pw.this.k, acceptor=lambda new, old: new - old >= 2
    )
    got = dict((r["k"], r["v"]) for r in out.df.collect())
    # a: keep 1 → 2 rejected (diff 1) → 4 accepted → 5 rejected → final 4
    assert got == {"a": 4, "b": 10}


def test_async_transformer(spark):
    class Enrich(stateful.AsyncTransformer):
        output_schema = "doubled long"

        async def invoke(self, **row):
            if row["x"] < 0:
                raise ValueError("negative")
            return {"doubled": row["x"] * 2}

    t = pw.Table.from_rows(spark, [(1,), (2,), (-3,)], "x long")
    ok, failed = Enrich().run(t)
    assert sorted(r["doubled"] for r in ok.df.collect()) == [2, 4]
    fails = failed.df.collect()
    assert len(fails) == 1 and fails[0]["x"] == -3 and "negative" in fails[0]["error"]


def test_multimodal_plumbing(spark):
    media = spark.createDataFrame(
        [(1, b"\x00" * 100), (2, b"\x01" * 57)], "media_id long, data binary"
    )
    with_meta = multimodal.attach_media_meta(media)
    metas = {r["media_id"]: r["media_meta"] for r in with_meta.collect()}
    assert metas[1]["media_type"] in ("image", "audio", "video")
    assert metas[1]["width"] >= 1

    feats = multimodal.extract_features(media).collect()
    assert all(len(r["features"]) == 8 for r in feats)
    # deterministic
    feats2 = multimodal.extract_features(media).collect()
    assert {r["media_id"]: tuple(r["features"]) for r in feats} == {
        r["media_id"]: tuple(r["features"]) for r in feats2
    }

    frames = multimodal.frame_sample(media, n_frames=4).collect()
    assert len(frames) == 8
    assert {r["frame_idx"] for r in frames} == {0, 1, 2, 3}


def test_json_get(spark):
    t = pw.Table.from_rows(
        spark, [('{"k": 7, "tag": "x"}',), ('{"k": 9}',)], "props string"
    )
    out = t.select(
        k=pw.this.props.json_get("k").as_int(),
        tag=pw.this.props.json_get("tag"),
    )
    got = [(r["k"], r["tag"]) for r in out.df.collect()]
    assert sorted(r[0] for r in got) == [7, 9]
    assert {r[1] for r in got} == {"x", None}

"""Streaming sinks: upsert-by-key (foreachBatch merge), streaming dedup,
stream-static join (asof_now semantics), matmul expression."""

from __future__ import annotations

import pyspark.sql.functions as F

import pathwaydataframework_spark as pw
from pathwaydataframework_spark import streaming


def test_upsert_sink(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    spark.createDataFrame([(1, "a1"), (2, "b1")], "k long, v string").coalesce(
        1
    ).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out_path = str(tmp_path / "target")
    q = streaming.write_upsert_parquet(
        pw.Table(stream), out_path, ["k"], checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = {(r["k"], r["v"]) for r in spark.read.parquet(out_path).collect()}
    assert got == {(1, "a1"), (2, "b1")}

    # second run with an update for k=2 and a new key
    spark.createDataFrame([(2, "b2"), (3, "c1")], "k long, v string").coalesce(
        1
    ).write.mode("append").parquet(src_dir)
    q2 = streaming.write_upsert_parquet(
        pw.Table(stream), out_path, ["k"], checkpoint=str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    got = {(r["k"], r["v"]) for r in spark.read.parquet(out_path).collect()}
    assert got == {(1, "a1"), (2, "b2"), (3, "c1")}


def test_stream_static_join_asof_now(spark, tmp_path):
    """Stream-static equi-join = the reference's asof_now_join: stream rows
    join the static table's current state (SURVEY §2.3)."""
    dim = spark.createDataFrame([(1, "one"), (2, "two")], "k long, label string")
    src_dir = str(tmp_path / "facts")
    spark.createDataFrame([(10, 1), (11, 2), (12, 9)], "fid long, k long").write.parquet(src_dir)
    stream = spark.readStream.schema("fid long, k long").parquet(src_dir)
    joined = stream.join(dim, on="k", how="left")
    q = (
        joined.writeStream.format("memory")
        .queryName("asof_now")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["fid"], r["label"]) for r in spark.sql("SELECT * FROM asof_now").collect()}
    assert got == {(10, "one"), (11, "two"), (12, None)}


def test_matmul_dot(spark):
    t = pw.Table.from_rows(
        spark, [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>"
    )
    out = t.select(d=pw.this.a @ pw.this.b)
    assert out.df.collect()[0]["d"] == 32.0


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """Stream-stream time-band join with watermarks produces exactly the
    rows the batch range join produces on the same data (SURVEY §2.3
    interval_join, streaming form)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    lrows = [(i, t0 + dt.timedelta(seconds=10 * i), i % 2) for i in range(8)]
    rrows = [(100 + j, t0 + dt.timedelta(seconds=10 * j + 4), j % 2) for j in range(8)]
    lschema = "lid long, lt timestamp, k long"
    rschema = "rid long, rt timestamp, k long"
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(lrows, lschema).write.parquet(ldir)
    spark.createDataFrame(rrows, rschema).write.parquet(rdir)

    lstream = pw.Table(spark.readStream.schema(lschema).parquet(ldir))
    rstream = pw.Table(spark.readStream.schema(rschema).parquet(rdir))
    joined = streaming.interval_join_stream(
        lstream, rstream,
        left_time="lt", right_time="rt",
        lower_bound=0, upper_bound=15, on=["k"], watermark="30 seconds",
    )
    q = (
        joined.df.select("lid", "r_rid")
        .writeStream.format("memory").queryName("ivj")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["lid"], r["r_rid"]) for r in spark.sql("SELECT * FROM ivj").collect()}

    lb = spark.read.parquet(ldir)
    rb = spark.read.parquet(rdir)
    expected = {
        (r["lid"], r["rid"])
        for r in lb.join(
            rb,
            (lb["k"] == rb["k"])
            & (rb["rt"] >= lb["lt"])
            & (rb["rt"] <= lb["lt"] + F.expr("INTERVAL 15 SECONDS")),
        ).collect()
    }
    assert got == expected and len(expected) > 0


def test_window_join_stream_matches_batch(spark, tmp_path):
    """Stream-stream tumbling-window join == batch window_join rows
    (SURVEY §2.3 window_join, streaming form)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    lrows = [(i, t0 + dt.timedelta(seconds=7 * i), i % 2) for i in range(10)]
    rrows = [(100 + j, t0 + dt.timedelta(seconds=11 * j), j % 2) for j in range(10)]
    lschema = "lid long, lt timestamp, k long"
    rschema = "rid long, rt timestamp, k long"
    ldir, rdir = str(tmp_path / "wl"), str(tmp_path / "wr")
    spark.createDataFrame(lrows, lschema).write.parquet(ldir)
    spark.createDataFrame(rrows, rschema).write.parquet(rdir)

    joined = streaming.window_join_stream(
        pw.Table(spark.readStream.schema(lschema).parquet(ldir)),
        pw.Table(spark.readStream.schema(rschema).parquet(rdir)),
        left_time="lt", right_time="rt",
        duration="30 seconds", on=["k"], watermark="60 seconds",
    )
    q = (
        joined.df.select("lid", "r_rid")
        .writeStream.format("memory").queryName("wjs")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["lid"], r["r_rid"]) for r in spark.sql("SELECT * FROM wjs").collect()}

    lb = spark.read.parquet(ldir).withColumn("w", F.window("lt", "30 seconds"))
    rb = spark.read.parquet(rdir).withColumn("w", F.window("rt", "30 seconds"))
    expected = {
        (r["lid"], r["rid"])
        for r in lb.join(rb, (lb["w"] == rb["w"]) & (lb["k"] == rb["k"])).collect()
    }
    assert got == expected and len(expected) > 0


def test_changelog_sink_emits_retractions(spark, tmp_path):
    """Update-stream parity: a replaced key emits -1 (old values) then +1
    (new values); fresh keys emit only +1 (reference __time__/__diff__
    changelog semantics, SURVEY §1.1)."""
    src_dir = str(tmp_path / "cl_src")
    target = str(tmp_path / "cl_target")
    ckpt = str(tmp_path / "cl_ckpt")
    stream = lambda: pw.Table(  # noqa: E731
        spark.readStream.schema("k long, v string").parquet(src_dir)
    )

    spark.createDataFrame([(1, "a1"), (2, "b1")], "k long, v string").coalesce(1).write.parquet(src_dir)
    q = streaming.write_changelog_parquet(stream(), target, ["k"], checkpoint=ckpt)
    q.awaitTermination(120)

    # batch 1: change k=2, redeliver k=1 unchanged (must emit NOTHING),
    # insert k=3
    spark.createDataFrame(
        [(1, "a1"), (2, "b2"), (3, "c1")], "k long, v string"
    ).coalesce(1).write.mode("append").parquet(src_dir)
    q2 = streaming.write_changelog_parquet(stream(), target, ["k"], checkpoint=ckpt)
    q2.awaitTermination(120)

    log = [
        (r["k"], r["v"], r["__diff__"])
        for r in spark.read.parquet(target + "__log").collect()
    ]
    # batch 0: +a1 +b1; batch 1: -b1 +b2 +c1
    assert (2, "b1", -1) in log and (2, "b2", 1) in log and (3, "c1", 1) in log
    assert (1, "a1", 1) in log and (1, "a1", -1) not in log
    # snapshot reflects the final state
    snap = {(r["k"], r["v"]) for r in spark.read.parquet(target).collect()}
    assert snap == {(1, "a1"), (2, "b2"), (3, "c1")}

"""Structured-Streaming smoke: file-source replay of the events fixture
through a watermarked tumbling-window aggregation matches the batch result.

This is the M6 foundation (SURVEY.md §7): ``readStream`` + ``withWatermark``
(= the reference's common_behavior cutoff) + windowed agg + availableNow
trigger, compared against the identical batch plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pathwaydataframework_spark.data import load_df


def test_stream_window_agg_matches_batch(spark, sf_dir, tmp_path):
    batch_src = load_df(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    src_dir = str(tmp_path / "events_stream")
    batch_src.repartition(4).write.parquet(src_dir)  # 4 files ≈ 4 micro-batch splits

    def windowed(df):
        return (
            # watermark needs TIMESTAMP (LTZ); session tz is UTC so the cast
            # is value-preserving
            df.withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sv"))
            .select(
                F.col("window.start").alias("ws"), "event_type", "n", "sv"
            )
        )

    batch = {tuple(r) for r in windowed(spark.read.parquet(src_dir)).collect()}

    stream = spark.readStream.schema(batch_src.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src_dir)
    q = (
        windowed(stream)
        .writeStream.format("memory")
        .queryName("stream_windows")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM stream_windows").collect()}
    assert got == batch


def test_deduplicate_stream_state_is_watermark_bounded(spark, sf_dir, tmp_path):
    """deduplicate_stream must use dropDuplicatesWithinWatermark so dedup
    state is evicted as keys age past the watermark (ADVICE r1: plain
    dropDuplicates(keys) never purges state)."""
    from pathwaydataframework_spark.internals.table import Table
    from pathwaydataframework_spark.streaming import deduplicate_stream

    batch_src = load_df(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id"
    )
    src_dir = str(tmp_path / "dedup_stream")
    batch_src.write.parquet(src_dir)
    stream = spark.readStream.schema(batch_src.schema).parquet(src_dir)

    out = deduplicate_stream(
        Table(stream), keys=["user_id"], time_col="ts", watermark="1 hour"
    )
    plan = out.df._jdf.queryExecution().logical().toString()
    assert "WithinWatermark" in plan

    q = (
        out.df.writeStream.format("memory")
        .queryName("dedup_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(DISTINCT user_id) c, count(*) n FROM dedup_stream_out").first()
    n_users = batch_src.select("user_id").distinct().count()
    assert got["c"] == n_users
    # within one micro-batch every user dedups to a single row
    assert got["n"] == n_users

"""Streaming stateful operators: acceptor dedup and predicate sessions on
applyInPandasWithState — state must carry across micro-batches."""

from __future__ import annotations

import pyspark.sql.functions as F

from pathwaydataframework_spark.internals.table import Table
from pathwaydataframework_spark.streaming import stateful


def _two_batch_stream(spark, tmp_path, schema, batch1, batch2):
    """Write two parquet files and read them back one per micro-batch."""
    src = str(tmp_path / "src")
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)


def test_deduplicate_stream_acceptor_carries_state(spark, tmp_path):
    # acceptor: only accept strictly larger values.  batch1 peaks at 7;
    # batch2's 5 must be REJECTED against the carried state, its 9 accepted.
    schema = "k string, v long"
    stream = _two_batch_stream(
        spark, tmp_path,
        schema,
        [("a", 3), ("a", 7), ("b", 2)],
        [("a", 5), ("a", 9), ("b", 1)],
    )
    out = stateful.deduplicate_stream_acceptor(
        Table(stream), value="v", instance="k", acceptor=lambda new, old: new > old
    )
    q = (
        out.df.writeStream.format("memory")
        .queryName("dedup_acc")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM dedup_acc").collect()
    # update mode appends one row per touched key per batch; the LAST row
    # per key is the final kept value
    last = {}
    for r in rows:
        last[r["k"]] = r["v"]
    assert last == {"a": 9, "b": 2}
    # and batch1's intermediate emission must show the pre-carryover peak
    a_vals = [r["v"] for r in rows if r["k"] == "a"]
    assert a_vals == [7, 9]


def test_session_stream_by_predicate_closes_on_break(spark, tmp_path):
    # gap-≤-2 sessions.  batch1: key a at t=1,2,3 (one open session).
    # batch2: t=10 breaks it → session [1,3] emitted; [10,10] stays open.
    schema = "k string, t long, v long"
    stream = _two_batch_stream(
        spark, tmp_path,
        schema,
        [("a", 1, 10), ("a", 2, 20), ("a", 3, 30)],
        [("a", 10, 40)],
    )
    out = stateful.session_windows_stream_by_predicate(
        Table(stream),
        "t",
        lambda prev, nxt: nxt - prev <= 2,
        instance="k",
        aggregations={"n": ("v", "count"), "sv": ("v", "sum")},
    )
    q = (
        out.df.writeStream.format("memory")
        .queryName("sess_pred")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [tuple(r) for r in spark.sql("SELECT * FROM sess_pred").collect()]
    assert rows == [("a", 1, 3, 3, 60)]


def test_session_stream_matches_batch_operator(spark, tmp_path):
    """Closed streaming sessions must agree with the batch operator."""
    from pathwaydataframework_spark.operators.stateful import (
        session_windows_by_predicate,
    )

    data = [
        ("a", 1, 1), ("a", 2, 1), ("a", 8, 1), ("a", 9, 1), ("a", 20, 1),
        ("b", 5, 1), ("b", 6, 1), ("b", 30, 1),
    ]
    schema = "k string, t long, v long"
    pred = lambda prev, nxt: nxt - prev <= 3  # noqa: E731
    aggs = {"n": ("v", "count")}

    batch = session_windows_by_predicate(
        Table(spark.createDataFrame(data, schema)), "t", pred, instance="k",
        aggregations=aggs,
    )
    batch_rows = {tuple(r) for r in batch.df.collect()}

    stream = _two_batch_stream(spark, tmp_path, schema, data[:4], data[4:])
    out = stateful.session_windows_stream_by_predicate(
        Table(stream), "t", pred, instance="k", aggregations=aggs
    )
    q = (
        out.df.writeStream.format("memory")
        .queryName("sess_parity")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM sess_parity").collect()}
    # the stream never closes each key's LAST session (no later break event);
    # batch closes everything at end-of-input — drop each key's final session
    last_per_key = {}
    for r in sorted(batch_rows, key=lambda r: (r[0], r[1])):
        last_per_key[r[0]] = r
    expected = batch_rows - set(last_per_key.values())
    assert got == expected

"""Custom reducers (UDAF), index façades, behaviors, debezium envelope."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

import pathwaydataframework_spark as pw
from pathwaydataframework_spark.internals.custom_reducers import (
    stateful_many,
    stateful_single,
    udaf_reduce,
)
from pathwaydataframework_spark.operators import ml_index
from pathwaydataframework_spark.data import load_df


def test_udaf_reduce(spark):
    class SumSquares(pw.BaseCustomAccumulator):
        def __init__(self, v):
            self.v = v

        @classmethod
        def from_row(cls, row):
            return cls(row[0] ** 2)

        def update(self, other):
            self.v += other.v

        def compute_result(self):
            return float(self.v)

    t = pw.Table.from_rows(spark, [("a", 1.0), ("a", 2.0), ("b", 3.0)], "k string, x double")
    out = udaf_reduce(
        t, instance="k", accumulator=SumSquares, value_cols=["x"], result_name="ssq"
    )
    got = {r["k"]: r["ssq"] for r in out.df.collect()}
    assert got == {"a": 5.0, "b": 9.0}


def test_stateful_many_single(spark):
    t = pw.Table.from_rows(spark, [("a", 1.0), ("a", 2.0)], "k string, x double")
    m = stateful_many(
        t,
        instance="k",
        combine=lambda state, rows: sum(r[0] for r in rows),
        value_cols=["x"],
    )
    assert m.df.collect()[0]["result"] == 3.0
    s = stateful_single(
        t,
        instance="k",
        combine=lambda state, row: (state or 0.0) + row[0] * 2,
        value_cols=["x"],
    )
    assert s.df.collect()[0]["result"] == 6.0


def test_knn_index_facades(spark, sf_dir):
    emb = load_df(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    bf = ml_index.BruteForceKnnFactory(dim=64).build_index(emb)
    out = bf.get_nearest_items(queries, k=3)
    assert out.count() == 9
    top1 = {
        r["query_id"]: r["neighbor_id"] for r in out.filter(F.col("rank") == 1).collect()
    }
    assert all(q == n for q, n in top1.items())  # self is nearest
    # IVF facade (USearchKnn analogue): probing every list == brute force
    ivf = ml_index.UsearchKnnFactory(dim=64, n_clusters=4, nprobe=4).build_index(emb)
    got = ivf.get_nearest_items(queries, k=3)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, out.collect()))


def test_hybrid_index_rrf(spark, sf_dir):
    docs = load_df(spark, sf_dir, "documents")
    bm = ml_index.BM25Index(docs)
    hybrid = ml_index.HybridIndex([bm])
    q = spark.createDataFrame([(1, "spark window data")], "query_id long, query string")
    out = hybrid.query(q, k=3).collect()
    assert len(out) == 3 and out[0]["rank"] == 1


def test_inactivity_detection(spark):
    def ts(m):
        return dt.datetime(2024, 1, 1, 10, m)

    t = pw.Table.from_rows(
        spark,
        [("u1", ts(0)), ("u1", ts(2)), ("u1", ts(40)), ("u2", ts(0))],
        "user string, t timestamp_ntz",
    )
    out = pw.inactivity_detection(t, "t", instance="user", max_gap="10 minutes")
    got = [(r["user"], r["inactive_since"].minute, r["resumed_at"].minute) for r in out.df.collect()]
    assert got == [("u1", 2, 40)]


def test_debezium_envelope(spark):
    payload = (
        '{"payload": {"op": "u", "before": {"id": 1, "v": "old"}, '
        '"after": {"id": 1, "v": "new"}, "source": {"ts_ms": 1700000000000}}}'
    )
    df = spark.createDataFrame([(payload,)], "value string")
    out = pw.io.debezium.parse_envelope(df, "id long, v string")
    row = out.df.collect()[0]
    assert row["op"] == "u"
    assert row["before"]["v"] == "old" and row["after"]["v"] == "new"
    assert row["source_ts_ms"] == 1700000000000


def test_io_roundtrip_csv_jsonlines(spark, tmp_path):
    t = pw.Table.from_rows(spark, [(1, "a"), (2, "b")], "k long, v string")
    csv_path = str(tmp_path / "t_csv")
    pw.io.csv.write(t, csv_path)
    back = pw.io.csv.read(spark, csv_path)
    assert sorted((r["k"], r["v"]) for r in back.df.collect()) == [(1, "a"), (2, "b")]

    jl_path = str(tmp_path / "t_jl")
    pw.io.jsonlines.write(t, jl_path)
    back2 = pw.io.jsonlines.read(spark, jl_path)
    assert back2.df.count() == 2


def test_subscribe_batch(spark, tmp_path):
    # batch subscribe runs on_change ON THE EXECUTORS (foreachPartition) —
    # side-effect through the filesystem, like the streaming foreach test
    import json as _json
    import os
    import uuid

    out_dir = str(tmp_path / "subs")
    os.makedirs(out_dir)
    t = pw.Table.from_rows(spark, [(1,), (2,)], "x long")

    def on_change(key, row, time, is_addition):
        with open(os.path.join(out_dir, uuid.uuid4().hex), "w") as f:
            _json.dump(row, f)

    pw.io.subscribe(t, on_change)
    seen = []
    for name in os.listdir(out_dir):
        with open(os.path.join(out_dir, name)) as f:
            seen.append(_json.load(f)["x"])
    assert sorted(seen) == [1, 2]


def test_table_from_markdown(spark):
    t = pw.io.debug.table_from_markdown(
        spark,
        """
        | a | b |
        |---|---|
        | 1 | x |
        | 2 | y |
        """,
    )
    assert sorted((r["a"], r["b"]) for r in t.df.collect()) == [(1, "x"), (2, "y")]


def test_reducer_null_handling_review_fixes(spark):
    import pathwaydataframework_spark as pw

    R = pw.reducers
    t = pw.Table.from_rows(
        spark, [(1, 1.0), (1, None), (1, 2.0), (2, 5.0), (2, None), (3, 7.0)],
        "k long, v double",
    )
    out = {
        r["k"]: (r["u"], r["st"])
        for r in t.groupby(pw.this.k)
        .reduce(u=R.unique(pw.this.v), st=R.sorted_tuple(pw.this.v))
        .df.collect()
    }
    # unique: a null among values makes the group NON-unique (was: null
    # ignored and k=2 wrongly reported unique)
    assert out[2][0] is None
    assert out[3][0] == 7.0
    # sorted_tuple default KEEPS nulls (reference skip_nones=False)
    assert list(out[1][1]) == [None, 1.0, 2.0]
    skipped = t.groupby(pw.this.k).reduce(
        st=R.sorted_tuple(pw.this.v, skip_nones=True)
    )
    vals = {r["k"]: list(r["st"]) for r in skipped.df.collect()}
    assert vals[1] == [1.0, 2.0]


def test_groupby_sort_by_orders_tuples(spark):
    import pathwaydataframework_spark as pw

    R = pw.reducers
    t = pw.Table.from_rows(
        spark,
        [(1, 3, "c"), (1, 1, "a"), (1, 2, "b"), (2, 9, "z")],
        "k long, ts long, v string",
    )
    out = t.groupby(pw.this.k, sort_by=pw.this.ts).reduce(
        vals=R.tuple(pw.this.v)
    )
    got = {r["k"]: list(r["vals"]) for r in out.df.collect()}
    assert got[1] == ["a", "b", "c"]  # declared sort order, not arrival order


def test_join_groupby_with_shared_column_names(spark):
    import pathwaydataframework_spark as pw

    t1 = pw.Table.from_rows(spark, [(1, 10.0), (1, 5.0), (2, 1.0)], "k long, x double")
    t2 = pw.Table.from_rows(spark, [(1, "a"), (2, "b")], "k long, y string")
    out = (
        t1.join(t2, pw.left.k == pw.right.k)
        .groupby(pw.left.k)
        .reduce(total=pw.reducers.sum(pw.left.x))
    )
    assert sorted(tuple(r) for r in out.df.collect()) == [(1, 15.0), (2, 1.0)]


def test_udf_reducer_decorator_in_reduce(spark):
    # the reference call shape (custom_reducers.py:271 doctest): decorate an
    # accumulator, use it INSIDE groupby().reduce() beside built-ins
    import pathwaydataframework_spark as pw
    from pathwaydataframework_spark.internals import reducers as R

    class CustomAvg(pw.BaseCustomAccumulator):
        def __init__(self, sum, cnt):
            self.sum = sum
            self.cnt = cnt

        @classmethod
        def from_row(cls, row):
            [val] = row
            return cls(val, 1)

        def update(self, other):
            self.sum += other.sum
            self.cnt += other.cnt

        def compute_result(self) -> float:
            return self.sum / self.cnt

    custom_avg = R.udf_reducer(CustomAvg)
    t = pw.Table.from_rows(
        spark,
        [("a", 2.0), ("a", 4.0), ("b", 10.0)],
        "k string, v double",
    )
    out = t.groupby(pw.this.k).reduce(
        pw.this.k, avg=custom_avg(pw.this.v), n=R.count()
    )
    got = {r["k"]: (r["avg"], r["n"]) for r in out.df.collect()}
    assert got == {"a": (3.0, 2), "b": (10.0, 1)}


def test_clustering_via_lsh_separates_clusters(spark):
    # reference stdlib/ml/classifiers/_clustering_via_lsh.py — two far-apart
    # blobs must get two distinct labels, consistent within each blob
    from pathwaydataframework_spark.ml.classifiers import (
        clustering_via_lsh,
        generate_euclidean_lsh_bucketer,
    )

    rows = []
    for i in range(20):
        rows.append((i, [10.0 + (i % 3) * 0.1, 10.0, 10.0, 10.0]))
    for i in range(20, 40):
        rows.append((i, [-10.0, -10.0 - (i % 3) * 0.1, -10.0, -10.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bucketer = generate_euclidean_lsh_bucketer(4, 2, 3, A=5.0, seed=0)
    out = clustering_via_lsh(df, bucketer, 2, id_col="vec_id", vec_col="embedding")
    got = {r["vec_id"]: r["label"] for r in out.collect()}
    assert len(got) == 40
    blob_a = {got[i] for i in range(20)}
    blob_b = {got[i] for i in range(20, 40)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b

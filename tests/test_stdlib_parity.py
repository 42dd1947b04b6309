"""Reference stdlib namespace parity: ml (classifiers/hmm/smart_table_ops),
indexing (DataIndex, sorted index), graphs (contraction), utils
(filtering) — behavior tests, not just existence."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

import pathwaydataframework_spark as pw


def test_knn_lsh_classifier_majority_vote(spark):
    # two well-separated clusters with labels; every query lands on its
    # cluster's label
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    for i in range(20):
        rows.append((i, (rng.randn(8) * 0.05 + 1.0).tolist(), "pos"))
    for i in range(20, 40):
        rows.append((i, (rng.randn(8) * 0.05 - 1.0).tolist(), "neg"))
    data = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    classify = pw.ml.classifiers.knn_lsh_classifier_train(
        data, dim=8, bits=8, bands=4
    )
    queries = spark.createDataFrame(
        [(100, [1.0] * 8), (101, [-1.0] * 8)],
        "vec_id long, embedding array<double>",
    )
    out = {r["query_id"]: r["predicted_label"] for r in classify(queries, k=5).collect()}
    assert out[100] == "pos" and out[101] == "neg"

    acc = pw.ml.utils.classifier_accuracy(
        classify(queries, k=5),
        spark.createDataFrame([(100, "pos"), (101, "neg")], "query_id long, label string"),
    )
    got = {r["matched"]: r["cnt"] for r in acc.collect()}
    assert got == {True: 2}


def test_viterbi_decode_manul_example(spark):
    # the reference hmm.py docstring example: hungry manul is grumpy
    g = (
        pw.ml.hmm.HmmGraph()
        .add_state("HUNGRY", lambda o: math.log(0.9 if o == "GRUMPY" else 0.1), start=True)
        .add_state("FULL", lambda o: math.log(0.8 if o == "HAPPY" else 0.2), start=True)
        .add_transition("HUNGRY", "HUNGRY", math.log(0.6))
        .add_transition("HUNGRY", "FULL", math.log(0.4))
        .add_transition("FULL", "HUNGRY", math.log(0.3))
        .add_transition("FULL", "FULL", math.log(0.7))
    )
    obs = ["HAPPY", "HAPPY", "GRUMPY", "GRUMPY", "HAPPY", "GRUMPY"]
    df = spark.createDataFrame(
        [(1, t, o) for t, o in enumerate(obs)], "k long, t long, observation string"
    )
    out = pw.ml.hmm.viterbi_decode(
        df, g, group_col="k", time_col="t", obs_col="observation"
    )
    states = [r["state"] for r in out.orderBy("t").collect()]
    assert states == ["FULL", "FULL", "HUNGRY", "HUNGRY", "FULL", "HUNGRY"]


def test_fuzzy_self_match_excludes_identity(spark):
    t = spark.createDataFrame(
        [(1, "apache spark engine"), (2, "spark engine fast"), (3, "postgres db")],
        "id long, text string",
    )
    out = pw.ml.smart_table_ops.fuzzy_self_match(t)
    pairs = {(r["left_id"], r["right_id"]) for r in out.collect()}
    assert all(a != b for a, b in pairs)
    assert (1, 2) in pairs or (2, 1) in pairs


def test_data_index_augments_hits_with_data(spark):
    data = spark.createDataFrame(
        [(1, [1.0, 0.0], "doc one"), (2, [0.0, 1.0], "doc two")],
        "vec_id long, embedding array<double>, body string",
    )
    idx = pw.indexing.BruteForceKnnFactory(dim=2).build_index(data)
    di = pw.indexing.DataIndex(data, idx, id_col="vec_id")
    queries = spark.createDataFrame(
        [(9, [1.0, 0.1])], "vec_id long, embedding array<double>"
    )
    out = di.query(queries, number_of_matches=1).collect()
    assert len(out) == 1 and out[0]["body"] == "doc one"
    assert di.query_as_of_now is di.query or callable(di.query_as_of_now)


def test_build_sorted_index_navigation(spark):
    nodes = spark.createDataFrame([(5,), (1,), (9,), (3,)], "key long")
    si = pw.indexing.build_sorted_index(nodes, key_col="key")
    index = {r["key"]: (r["prev"], r["next"]) for r in si["index"].collect()}
    assert index[1] == (None, 3) and index[3] == (1, 5) and index[9] == (5, None)
    assert [r["root"] for r in si["oracle"].collect()] == [1]
    nav = pw.indexing.sort_from_index(si["index"])
    assert {"prev", "next"} <= set(nav.columns)


def test_graph_contraction(spark):
    E = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (1, 3)], "u long, v long")
    V = spark.createDataFrame([(i,) for i in range(1, 5)], "id long")
    cl = spark.createDataFrame([(1, 10), (2, 10), (3, 20), (4, 20)], "u long, c long")
    g = pw.graphs.Graph(V, E).contracted_to_unweighted_simple_graph(cl)
    # reference semantics: contraction KEEPS self-loops (the contracted
    # intra-cluster edges); without_self_loops() is the separate step
    assert sorted(tuple(r) for r in g.E.collect()) == [(10, 10), (10, 20), (20, 20)]
    assert sorted(tuple(r) for r in g.without_self_loops().E.collect()) == [(10, 20)]
    assert g.V.count() == 2

    WE = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 2.0), (3, 4, 5.0), (1, 3, 3.0)], "u long, v long, weight double"
    )
    wg = pw.graphs.WeightedGraph.from_vertices_and_weighted_edges(V, WE)
    cwg = wg.contracted_to_weighted_simple_graph(cl)
    weights = {(r["u"], r["v"]): r["weight"] for r in cwg.WE.collect()}
    # intra: (1,2)=1.0 inside 10; (3,4)=5.0 inside 20; cross: 2.0 + 3.0
    assert weights == {(10, 10): 1.0, (10, 20): 5.0, (20, 20): 5.0}
    nl = {(r["u"], r["v"]): r["weight"] for r in cwg.without_self_loops().WE.collect()}
    assert nl == {(10, 20): 5.0}


def test_argmax_argmin_rows(spark):
    t = pw.Table.from_rows(
        spark,
        [("a", 1, 10.0), ("a", 2, 30.0), ("b", 3, 5.0), ("b", 4, 2.0)],
        "g string, id long, score double",
    )
    top = pw.utils.filtering.argmax_rows(t, pw.this.g, what=pw.this.score)
    assert sorted(r["id"] for r in top.df.collect()) == [2, 3]
    bot = pw.utils.filtering.argmin_rows(t, pw.this.g, what=pw.this.score)
    assert sorted(r["id"] for r in bot.df.collect()) == [1, 4]


def test_stateful_exports_deduplicate(spark):
    assert pw.stateful.deduplicate is pw.dedup.deduplicate


def test_viterbi_survives_absorbing_state(spark):
    # a state with no outgoing transitions dead-ends the beam; the decode
    # must still return one state per observation (review regression)
    g = (
        pw.ml.hmm.HmmGraph()
        .add_state("GO", lambda o: 0.0, start=True)
        .add_state("END", lambda o: -0.1)
        .add_transition("GO", "END", -0.5)
        # END has NO outgoing edges
    )
    df = spark.createDataFrame(
        [(1, t, "x") for t in range(4)], "k long, t long, observation string"
    )
    out = pw.ml.hmm.viterbi_decode(df, g, group_col="k", time_col="t", obs_col="observation")
    states = [r["state"] for r in out.orderBy("t").collect()]
    assert len(states) == 4  # one per observation, no crash


def test_hmm_reducer_rejects_incremental_fold(spark):
    import pytest as _pt

    g = pw.ml.hmm.HmmGraph().add_state("S", lambda o: 0.0, start=True)
    combine = pw.ml.hmm.create_hmm_reducer(g)
    assert combine(None, [["a"], ["b"]]) == "S"
    with _pt.raises(ValueError, match="single-shot"):
        combine("S", [["c"]])


def test_classifier_honors_query_column_names(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    rows = [(i, (rng.randn(4) * 0.05 + 1.0).tolist(), "pos") for i in range(10)]
    rows += [(i + 10, (rng.randn(4) * 0.05 - 1.0).tolist(), "neg") for i in range(10)]
    data = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    classify = pw.ml.classifiers.knn_lsh_classifier_train(data, dim=4, bits=8, bands=4)
    queries = spark.createDataFrame(
        [(7, [1.0] * 4)], "qid long, emb array<double>"
    )
    out = classify(queries, k=3, query_id_col="qid", query_vec_col="emb").collect()
    assert out[0]["predicted_label"] == "pos"


def test_sort_from_index_keeps_custom_key_columns(spark):
    nodes = spark.createDataFrame([(5,), (1,), (9,)], "ts long")
    si = pw.indexing.build_sorted_index(nodes, key_col="ts")
    nav = pw.indexing.sort_from_index(si["index"])
    assert "ts" in nav.columns and {"prev", "next"} <= set(nav.columns)


def test_exact_dedup_default_survivor_is_deterministic(spark):
    from pathwaydataframework_spark.operators import dedup as dedup_ops

    t = pw.Table.from_rows(
        spark, [(i, "same") for i in range(50)], "id long, body string"
    )
    a = {r["id"] for r in dedup_ops.exact_dedup(t, pw.this.body).df.collect()}
    b = {
        r["id"]
        for r in dedup_ops.exact_dedup(
            pw.Table(t.df.repartition(7)), pw.this.body
        ).df.collect()
    }
    assert a == b and len(a) == 1  # survivor stable across partitionings


def test_fs_write_streaming_table(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").write.parquet(src)
    stream = spark.readStream.schema("k long, v string").parquet(src)
    q = pw.io.parquet.write(pw.Table(stream), out)
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == 2

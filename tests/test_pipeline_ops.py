"""Training-data pipeline operators: sampling, packing, clustering,
vocabulary, PII scrubbing (north-star addendum surface)."""

import pyspark.sql.functions as F
import pytest

from pathwaydataframework_spark.operators import clustering, packing, sampling, text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from pathwaydataframework_spark.data import load_table

    return load_table(spark, sf_dir, "documents").df


def test_hash_sample_deterministic_and_unbiased(spark):
    df = spark.range(10_000).withColumnRenamed("id", "k")
    a = sampling.hash_sample(df, "k", 0.3, seed=1)
    b = sampling.hash_sample(df, "k", 0.3, seed=1)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    n = a.count()
    assert 2700 < n < 3300  # ±6σ of Binomial(10000, 0.3)
    # different seed ⇒ a different (near-independent) subset
    c = sampling.hash_sample(df, "k", 0.3, seed=2)
    overlap = a.join(c, on="k").count()
    assert 700 < overlap < 1100  # ≈ 0.09·10000


def test_split_disjoint_and_exhaustive(spark):
    df = spark.range(5_000).withColumnRenamed("id", "k")
    parts = sampling.split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {name: p.count() for name, p in parts.items()}
    assert sum(counts.values()) == 5_000  # fractions sum to 1 ⇒ exhaustive
    assert parts["train"].join(parts["val"], on="k").count() == 0
    assert parts["val"].join(parts["test"], on="k").count() == 0
    assert 3_800 < counts["train"] < 4_200


def test_stratified_sample_rates(docs):
    out = sampling.stratified_sample(
        docs, "doc_id", "lang", {"en": 0.0, "de": 1.0}, default=0.5
    )
    by_lang = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "en" not in by_lang
    assert by_lang["de"] == totals["de"]


def test_mix_datasets_upsamples_and_tags(spark):
    a = spark.range(1_000).withColumnRenamed("id", "k")
    b = spark.range(1_000, 2_000).withColumnRenamed("id", "k")
    mixed = sampling.mix_datasets({"a": a, "b": b}, {"a": 2.5, "b": 0.5}, "k")
    counts = {r["_pw_source"]: r["n"] for r in
              mixed.groupBy("_pw_source").agg(F.count("*").alias("n")).collect()}
    assert counts["a"] >= 2_000 and 2_300 < counts["a"] < 2_700
    assert 400 < counts["b"] < 600


def test_deterministic_shuffle_is_exact_permutation(spark):
    df = spark.range(3_000).withColumnRenamed("id", "k")
    s = sampling.deterministic_shuffle(df, "k", seed=11)
    rows = s.select("k", "position").collect()
    # a bijection onto [0, n)
    assert sorted(r["position"] for r in rows) == list(range(3_000))
    # reproducible: same seed → identical permutation
    s2 = sampling.deterministic_shuffle(df, "k", seed=11)
    assert s.exceptAll(s2).count() == 0
    # different seed → a genuinely different order
    s3 = dict(
        sampling.deterministic_shuffle(df, "k", seed=12)
        .select("k", "position")
        .collect()
    )
    moved = sum(1 for r in rows if s3[r["k"]] != r["position"])
    assert moved > 2_900
    # null keys are excluded, not misplaced
    with_null = df.withColumn(
        "k", F.when(F.col("k") < 10, None).otherwise(F.col("k"))
    )
    sn = sampling.deterministic_shuffle(with_null, "k")
    assert sn.count() == 2_990
    assert sn.agg(F.max("position")).first()[0] == 2_989


def test_deterministic_shuffle_no_global_sort(spark):
    """The position computation must not fall back to a global sort or a
    single-partition window over the full frame (the 100 TB hazard)."""
    df = spark.range(1_000).withColumnRenamed("id", "k")
    plan = sampling.deterministic_shuffle(df, "k")._jdf.queryExecution().toString()
    # per-shard running totals: every window that orders by the row hash
    # must be partitioned by __shard, never an empty partitionBy over the
    # full input (the 256-row offsets frame's prefix-sum window is exempt
    # — it follows an aggregation and doesn't touch __h)
    checked = 0
    for line in plan.splitlines():
        if "Window" in line and "__h" in line:
            assert "__shard" in line, line
            checked += 1
    assert checked >= 1  # the guard must actually see the running-sum window


def test_pack_by_offset_layout_invariants(spark):
    docs = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 13 + 1).alias("n_tok")
    )
    out = packing.pack_by_offset(docs, "doc_id", "n_tok", max_tokens=64, shards=8)
    assert out.count() == 500  # every doc placed exactly once
    # within a shard, offsets are the exclusive prefix sum in id order
    rows = sorted(out.collect(), key=lambda r: (r["shard"], r["doc_id"]))
    run = {}
    for r in rows:
        assert r["start_offset"] == run.get(r["shard"], 0)
        assert r["seq_id"] == r["start_offset"] // 64
        run[r["shard"]] = run.get(r["shard"], 0) + r["n_tok"]


def test_kmeans_recovers_planted_clusters(spark):
    # 3 tight clusters far apart; k-means must recover them exactly
    import itertools

    centers = [[0.0, 0.0], [100.0, 0.0], [0.0, 100.0]]
    pts = [
        (i, [c[0] + (i % 5) * 0.1, c[1] + (i % 7) * 0.1])
        for i, c in zip(range(60), itertools.cycle(centers))
    ]
    df = spark.createDataFrame(pts, "id long, v array<double>")
    out = clustering.kmeans(df, "id", "v", k=3, iterations=4)
    got = {r["id"]: r["cluster"] for r in out.collect()}
    # all points planted from the same center share a cluster, distinct across
    for base in range(3):
        members = {got[i] for i in range(base, 60, 3)}
        assert len(members) == 1, f"center {base} split: {members}"
    assert len({got[0], got[1], got[2]}) == 3


def test_vocabulary_ranks_and_min_count(spark):
    df = spark.createDataFrame(
        [("b b b a a c",), ("a b",)], "text string"
    )
    out = text.vocabulary(df, "text")
    rows = {r["term"]: (r["count"], r["rank"]) for r in out.collect()}
    assert rows == {"b": (4, 1), "a": (3, 2), "c": (1, 3)}
    assert text.vocabulary(df, "text", min_count=2).count() == 2


def test_scrub_pii_patterns(spark):
    cases = [
        ("reach me at jo.doe+x@sub.example.org thanks", "reach me at <EMAIL> thanks"),
        ("call +1 (555) 123-4567 now", "call <PHONE> now"),
        ("host 192.168.10.1 up", "host <IP> up"),
        ("clean text stays clean", "clean text stays clean"),
    ]
    df = spark.createDataFrame(cases, "body string, want string")
    bad = df.filter(text.scrub_pii(F.col("body")) != F.col("want"))
    assert bad.count() == 0


def test_sampling_is_scan_side_filter(spark, sf_dir):
    # the 100 TB property: sampling adds ZERO exchanges — pure filter
    from tests.test_plans import count_shuffles

    from pathwaydataframework_spark.data import load_table

    docs = load_table(spark, sf_dir, "documents").df
    out = sampling.stratified_sample(docs, "doc_id", "lang", {"en": 0.5}, default=0.1)
    assert count_shuffles(out) == 0


def _toy_corpus_and_batch(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river"),
            (2, "pack my box with five dozen liquor jugs tonight please thanks"),
            (3, "sphinx of black quartz judge my vow said the old teacher"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            # near-dup of corpus doc 1 (one word changed)
            (101, "the quick brown fox jumps over the lazy cat near the river"),
            # genuinely new
            (102, "completely different content about distributed query engines"),
            # exact dup of corpus doc 3
            (103, "sphinx of black quartz judge my vow said the old teacher"),
        ],
        "doc_id long, text string",
    )
    return corpus, batch


def test_incremental_neardup_against_corpus_index(spark):
    from pathwaydataframework_spark.operators import dedup

    corpus, batch = _toy_corpus_and_batch(spark)
    index = dedup.minhash_band_index(corpus, "doc_id", "text")
    pairs = dedup.incremental_neardup_pairs(
        batch, index, id_col="doc_id", text_col="text",
        corpus_docs=corpus, threshold=0.5,
    )
    got = {(r["new_id"], r["corpus_id"]) for r in pairs.collect()}
    assert got == {(101, 1), (103, 3)}
    kept = dedup.incremental_neardup_filter(
        batch, index, id_col="doc_id", text_col="text",
        corpus_docs=corpus, threshold=0.5,
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [102]


def test_incremental_neardup_survives_index_round_trip(spark, tmp_path):
    """The index is a plain parquet artifact: write, read back, same hits —
    the shape of a daily-ingest pipeline (yesterday's index on disk, today's
    batch checked against it, no corpus rescan)."""
    from pathwaydataframework_spark.operators import dedup

    corpus, batch = _toy_corpus_and_batch(spark)
    path = str(tmp_path / "lsh_index")
    dedup.minhash_band_index(corpus, "doc_id", "text").write.parquet(path)
    index = spark.read.parquet(path)
    # band-only (no corpus text available) still surfaces both candidates
    cand = dedup.incremental_neardup_pairs(
        batch, index, id_col="doc_id", text_col="text"
    )
    got = {(r["new_id"], r["corpus_id"]) for r in cand.collect()}
    assert {(101, 1), (103, 3)} <= got


def test_incremental_neardup_streaming_foreach_batch(spark, tmp_path):
    """Continuous-ingest shape: micro-batches of new docs arrive on a file
    stream; foreachBatch filters each against the STATIC persisted corpus
    index (aggregation-bearing plans can't run inside a streaming query
    directly — foreachBatch is the sanctioned bridge)."""
    from pathwaydataframework_spark.operators import dedup

    corpus, batch = _toy_corpus_and_batch(spark)
    idx_path = str(tmp_path / "lsh_index")
    dedup.minhash_band_index(corpus, "doc_id", "text").write.parquet(idx_path)
    index = spark.read.parquet(idx_path)

    src_dir = str(tmp_path / "incoming")
    batch.repartition(3).write.parquet(src_dir)
    out: list[int] = []

    def check(bdf, _bid):
        kept = dedup.incremental_neardup_filter(
            bdf, index, id_col="doc_id", text_col="text",
            corpus_docs=corpus, threshold=0.5,
        )
        out.extend(r["doc_id"] for r in kept.collect())

    q = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(check)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(out) == [102]


def test_knn_ivf_exact_when_probing_all(spark, sf_dir):
    from pathwaydataframework_spark.data import load_table
    from pathwaydataframework_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings").df
    q = emb.filter(F.col("vec_id") < 5)
    exact = similarity.knn_bruteforce(emb, q, k=5)
    ivf = similarity.knn_ivf(emb, q, k=5, n_clusters=8, nprobe=8, iterations=2)
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, ivf.collect()))


def test_knn_ivf_recall_with_pruned_probes(spark, sf_dir):
    from pathwaydataframework_spark.data import load_table
    from pathwaydataframework_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings").df
    q = emb.filter(F.col("vec_id") < 10)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in similarity.knn_bruteforce(emb, q, k=5).collect()}
    ivf = {(r["query_id"], r["neighbor_id"])
           for r in similarity.knn_ivf(
               emb, q, k=5, n_clusters=8, nprobe=4, iterations=2).collect()}
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.5, recall  # fixture embeddings are near-uniform; half
    # the probes must still find at least half the true neighbors


def test_sampling_and_scrub_compose_with_streams(spark, sf_dir, tmp_path):
    # the curation ops are stateless column transforms, so the same plan
    # runs unchanged under Structured Streaming — batch and stream results
    # are identical row sets
    from pathwaydataframework_spark.data import load_df

    batch_src = load_df(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    src_dir = str(tmp_path / "docs_stream")
    batch_src.repartition(4).write.parquet(src_dir)

    def curate(df):
        kept = sampling.stratified_sample(
            df, "doc_id", "lang", {"en": 1.0}, default=0.3, seed=5
        )
        return kept.select("doc_id", text.scrub_pii(F.col("text")).alias("clean"))

    batch = {tuple(r) for r in curate(spark.read.parquet(src_dir)).collect()}

    stream = spark.readStream.schema(batch_src.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src_dir)
    q = (
        curate(stream)
        .writeStream.format("memory")
        .queryName("curated_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM curated_stream").collect()}
    assert got == batch and len(batch) > 0


def test_sampling_edge_fractions(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    assert sampling.hash_sample(df, "k", 0.0).count() == 0
    assert sampling.hash_sample(df, "k", 1.0).count() == 100
    with pytest.raises(ValueError):
        sampling.hash_sample(df, "k", 1.5)
    # fractions that accumulate past 1.0 by an ulp must not raise
    parts = sampling.split(df, "k", {"a": 0.8, "b": 0.1, "c": 0.1})
    assert sum(p.count() for p in parts.values()) == 100


def test_split_fractions_property(spark):
    from hypothesis import given, settings, strategies as st

    df = spark.range(400).withColumnRenamed("id", "k").cache()
    df.count()

    @settings(max_examples=10, deadline=None)
    @given(
        fracs=st.lists(st.floats(0.05, 0.5), min_size=1, max_size=3).filter(
            lambda f: sum(f) <= 1.0
        ),
        seed=st.integers(0, 1000),
    )
    def check(fracs, seed):
        parts = sampling.split(
            df, "k", {f"p{i}": f for i, f in enumerate(fracs)}, seed=seed
        )
        counts = [p.count() for p in parts.values()]
        assert sum(counts) <= 400  # disjoint subsets of the universe
        # hash ranges are half-open and ordered ⇒ pairwise disjoint
        ids = [set(r["k"] for r in p.collect()) for p in parts.values()]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                assert not (ids[i] & ids[j])

    check()


def test_packing_property(spark):
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=5, deadline=None)
    @given(
        toks=st.lists(st.integers(1, 50), min_size=1, max_size=60),
        max_tokens=st.integers(8, 128),
    )
    def check(toks, max_tokens):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(toks)], "doc_id long, n long"
        )
        out = packing.pack_by_offset(df, "doc_id", "n", max_tokens, shards=2)
        rows = sorted(out.collect(), key=lambda r: (r["shard"], r["doc_id"]))
        run = {}
        for r in rows:
            assert r["start_offset"] == run.get(r["shard"], 0)
            assert r["seq_id"] == r["start_offset"] // max_tokens
            run[r["shard"]] = run.get(r["shard"], 0) + r["n"]

    check()


def test_mix_same_rate_sources_decorrelated(spark):
    # two sources sharing an id space and a rate must draw INDEPENDENT
    # subsets (the mix key is source-tagged), not the same correlated one
    a = spark.range(2_000).withColumnRenamed("id", "k")
    mixed = sampling.mix_datasets({"x": a, "y": a}, {"x": 0.5, "y": 0.5}, "k")
    xs = {r["k"] for r in mixed.filter(F.col("_pw_source") == "x").collect()}
    ys = {r["k"] for r in mixed.filter(F.col("_pw_source") == "y").collect()}
    assert xs != ys
    assert 350 < len(xs & ys) < 650  # independent ⇒ overlap ≈ 0.25·2000


def test_html_entities_no_double_unescape(spark):
    from pathwaydataframework_spark.operators import parsers

    t = spark.createDataFrame([("&amp;lt; stays &amp; goes",)], "h string")
    assert t.select(parsers.strip_html(F.col("h")).alias("s")).first()["s"] == (
        "&lt; stays & goes"
    )


def test_review_fixes_regressions(spark):
    # dedup: empty input yields zero rows, not one all-NULL aggregate row
    import pathwaydataframework_spark as pw
    from pathwaydataframework_spark.operators import dedup, splitters

    empty = pw.Table.from_rows(spark, [], "k long, seq long").filter(pw.this.k > 0)
    assert dedup.deduplicate(empty, value=pw.this.seq).df.count() == 0

    # splitter: NULL and empty text yield zero chunks (token_count parity)
    d = spark.createDataFrame([(1, None), (2, ""), (3, "a b")], "doc_id long, text string")
    out = splitters.token_count_split(d, "doc_id", "text", min_tokens=1, max_tokens=2)
    assert [(r["doc_id"], r["n_tokens"]) for r in out.collect()] == [(3, 2)]

    # split: ten 0.1 fractions are exhaustive (no dropped top bucket)
    df = spark.range(1_000).withColumnRenamed("id", "k")
    parts = sampling.split(df, "k", {f"p{i}": 0.1 for i in range(10)})
    assert sum(p.count() for p in parts.values()) == 1_000

    # NULL keys are excluded from samples, not lumped into one bucket
    dn = spark.createDataFrame([(None,), (1,), (2,)], "k long")
    assert sampling.hash_sample(dn, "k", 0.9999).count() <= 2

    # packing: duplicate ids get ROWS-frame (distinct) offsets
    dup = spark.createDataFrame([(1, 5), (1, 7), (2, 3)], "doc_id long, n long")
    rows = packing.pack_by_offset(dup, "doc_id", "n", max_tokens=100, shards=1)
    offs = sorted(r["start_offset"] for r in rows.collect())
    assert offs == [0, 5, 12]

    # mix: unknown rate key raises instead of silently defaulting
    with pytest.raises(ValueError):
        sampling.mix_datasets({"a": df}, {"typo": 0.5}, "k")
    # all-zero rates → empty mix, not an error
    assert sampling.mix_datasets({"a": df}, {"a": 0.0}, "k").count() == 0


def test_interval_join_outer_null_rows_not_collided(spark):
    # (1, NULL) and (NULL, 1) must get DISTINCT row ids: if only one
    # matches, the other still appears as an unmatched padded row
    import pathwaydataframework_spark as pw

    left = pw.Table.from_rows(
        spark, [(1, None, 10), (None, 1, 500)], "a long, b long, t long"
    )
    right = pw.Table.from_rows(spark, [(11,)], "rt long")
    out = pw.interval_join(
        left, right, pw.this.t, pw.this.rt, pw.interval(-5, 5), how="left"
    )
    res = out.select(
        a=pw.left.a, b=pw.left.b, rt=pw.right.rt
    ).df.collect()
    got = sorted(((r["a"], r["b"], r["rt"]) for r in res), key=str)
    assert (1, None, 11) in got          # matched
    assert (None, 1, None) in got        # padded, NOT dropped
    assert len(got) == 2


def test_quality_binned_sample_rates_and_bins(spark):
    rows = [(i, 100 + i * 10) for i in range(200)]  # scores 100..2090
    df = spark.createDataFrame(rows, "doc_id long, score long")
    out = sampling.quality_binned_sample(
        df, "doc_id", "score", edges=[500.0, 1500.0], rates=[0.0, 0.5, 1.0], seed=1
    )
    got = {r["doc_id"]: r["quality_bin"] for r in out.collect()}
    # bin 0 (score<500, ids 0..39) rate 0 → none survive
    assert not any(i < 40 for i in got)
    # bin 2 (score>=1500, ids 140..199) rate 1.0 → all survive with bin 2
    assert all(got[i] == 2 for i in range(140, 200))
    # bin 1 keeps roughly half
    bin1 = [i for i in got if 40 <= i < 140]
    assert 25 <= len(bin1) <= 75
    # deterministic across reruns
    again = {
        r["doc_id"]
        for r in sampling.quality_binned_sample(
            df, "doc_id", "score", edges=[500.0, 1500.0], rates=[0.0, 0.5, 1.0], seed=1
        ).collect()
    }
    assert again == set(got)


def test_quality_binned_sample_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], "doc_id long, score double")
    with pytest.raises(ValueError, match="rates"):
        sampling.quality_binned_sample(df, "doc_id", "score", edges=[1.0], rates=[0.5])
    with pytest.raises(ValueError, match="ascending"):
        sampling.quality_binned_sample(
            df, "doc_id", "score", edges=[2.0, 1.0], rates=[0.1, 0.2, 0.3]
        )


def test_embedding_outliers_flags_planted_point(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    rows = [(i, (rng.randn(4) * 0.01 + 1.0).tolist()) for i in range(30)]
    rows.append((99, [50.0, 50.0, 50.0, 50.0]))  # far outlier, same cluster set
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = clustering.embedding_outliers(
        df, "vec_id", "embedding", k=2, iterations=3, z_threshold=2.0
    )
    flags = {r["vec_id"]: r["is_outlier"] for r in out.collect()}
    assert len(flags) == 31
    # the planted point either seeds its own singleton cluster (not an
    # outlier of itself) or is flagged; the tight cluster is never flagged
    tight = [flags[i] for i in range(30)]
    assert sum(tight) <= 2  # at most the stat tail of the tight cluster


def test_quality_binned_sample_excludes_null_and_nan_scores(spark):
    rows = [(1, 0.1), (2, None), (3, float("nan")), (4, 0.9)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    out = sampling.quality_binned_sample(
        df, "doc_id", "score", edges=[0.5], rates=[0.0, 1.0], seed=1
    )
    # NULL/NaN scores cannot be binned → excluded (NOT upsampled into the
    # top bin); score 0.1 is in the rate-0 bin, 0.9 survives in bin 1
    assert {r["doc_id"] for r in out.collect()} == {4}


def test_mix_datasets_rejects_negative_and_nan_rates(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match=">= 0"):
        sampling.mix_datasets({"a": df}, {"a": -0.5}, "doc_id")
    with pytest.raises(ValueError, match=">= 0"):
        sampling.mix_datasets({"a": df}, {"a": float("nan")}, "doc_id")


def test_kmeans_validates_arguments(spark):
    df = spark.createDataFrame([(1, [1.0])], "id long, v array<double>")
    with pytest.raises(ValueError, match="iterations"):
        clustering.kmeans(df, "id", "v", k=1, iterations=0)
    with pytest.raises(ValueError, match="k must"):
        clustering.kmeans(df, "id", "v", k=0)


def test_semdedup_drops_within_cluster_near_dups(spark):
    from pathwaydataframework_spark.operators import clustering

    # two tight groups far apart; ids 1/2 are identical vectors, 3 is close
    # to them; 10/11 identical in the other group
    pts = spark.createDataFrame(
        [
            (1, [0.0, 1.0]),
            (2, [0.0, 1.0]),
            (3, [0.05, 1.0]),
            (10, [1.0, 0.0]),
            (11, [1.0, 0.0]),
            (12, [1.0, -0.9]),
        ],
        "id long, v array<double>",
    )
    out = clustering.semdedup(pts, "id", "v", k=2, iterations=3, threshold=0.99)
    kept = {r["id"]: r["kept"] for r in out.collect()}
    # smallest id of each near-dup group survives; the far-off 12 survives
    assert kept == {1: True, 2: False, 3: False, 10: True, 11: False, 12: True}


def test_semdedup_threshold_keeps_distinct_points(spark):
    from pathwaydataframework_spark.operators import clustering

    pts = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [1.0, 0.0]), (3, [1.0, 1.0])],
        "id long, v array<double>",
    )
    out = clustering.semdedup(pts, "id", "v", k=1, iterations=2, threshold=0.999)
    assert all(r["kept"] for r in out.collect())


def test_corpus_dedup_transitive_component_min_id_survives(spark):
    from pathwaydataframework_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (5, base + " alpha"),
            (7, base + " alpha beta"),      # near-dup of 5 and 9
            (9, base + " alpha beta gamma"),
            (20, "completely different words about spark catalyst optimizer plans"),
        ],
        "doc_id long, text string",
    )
    out = dedup.corpus_dedup(docs, "doc_id", "text", n=3, num_hashes=16, bands=8, threshold=0.5)
    rows = {r["doc_id"]: (r["canon"], r["kept"]) for r in out.collect()}
    assert rows[5] == (5, True)
    assert rows[7] == (5, False)
    assert rows[9] == (5, False)
    assert rows[20] == (20, True)


def test_dedup_lines_global_keeps_first_and_blank(spark):
    from pathwaydataframework_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "copyright acme corp\nreal content one\n\nmore text"),
            (2, "copyright acme corp\nreal content two"),
            (3, "copyright acme corp"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["clean_text"], r["n_removed_lines"])
        for r in dedup.dedup_lines_global(docs, "doc_id", "text").collect()
    }
    # doc 1 holds every first occurrence (incl. the blank structural line)
    assert rows[1] == ("copyright acme corp\nreal content one\n\nmore text", 0)
    assert rows[2] == ("real content two", 1)
    assert rows[3] == ("", 1)  # fully-deduped doc survives as empty


def test_temperature_sample_rates_and_alpha_bounds(spark):
    from pathwaydataframework_spark.operators import sampling

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = sampling.temperature_sample(df, "id", "src", alpha=0.5, seed=0).collect()
    by_src = {}
    for r in out:
        by_src[r["src"]] = by_src.get(r["src"], 0) + 1
    # smallest source keeps everything; big is squeezed to ~sqrt(100/900)=1/3
    assert by_src["small"] == 100
    assert 240 <= by_src["big"] <= 360
    # alpha=1 is the natural distribution (no-op)
    assert sampling.temperature_sample(df, "id", "src", alpha=1.0).count() == 1000
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sampling.temperature_sample(df, "id", "src", alpha=1.5)
    with _pytest.raises(ValueError):
        sampling.temperature_sample(df, "id", "src", alpha=float("nan"))


def test_dsir_selects_target_like_docs(spark):
    from pathwaydataframework_spark.operators import sampling

    # corpus: 20 docs of "alpha" vocabulary, 20 of "beta"; target speaks alpha
    alpha = "alpha bravo charlie delta echo foxtrot golf hotel"
    beta = "nine eight seven six five four three two one zero"
    corpus = spark.createDataFrame(
        [(i, alpha if i < 20 else beta) for i in range(40)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame([(100, alpha), (101, alpha)], "doc_id long, text string")
    out = sampling.dsir_select(corpus, target, k=10, buckets=512, seed=0).collect()
    assert len(out) == 10
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == list(range(1, 11))
    # every selected doc must be from the alpha half — beta docs carry
    # strongly negative importance weights
    assert all(r["doc_id"] < 20 for r in out)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sampling.dsir_select(corpus, target, k=0)


def test_logreg_learns_separable_vocab(spark):
    from pathwaydataframework_spark.ml import quality

    alpha = "alpha bravo charlie delta echo foxtrot golf hotel"
    beta = "nine eight seven six five four three two one zero"
    docs = spark.createDataFrame(
        [(i, alpha if i < 30 else beta, 1 if i < 30 else 0) for i in range(60)],
        "doc_id long, text string, y int",
    )
    w = quality.train_logreg(
        docs, "doc_id", "text", "y", buckets=256, iterations=10, lr=5.0, seed=0
    )
    out = quality.predict_logreg(docs, w, "doc_id", "text", buckets=256, seed=0).collect()
    assert len(out) == 60
    # perfectly separable vocabularies -> perfect classification
    assert all(r["pred"] == (r["doc_id"] < 30) for r in out)
    # probabilities reflect confidence on both sides of 0.5
    ps = {r["doc_id"]: r["p"] for r in out}
    assert ps[0] > 0.6 and ps[59] < 0.4
    import pytest as _pytest

    with _pytest.raises(ValueError):
        quality.train_logreg(docs, "doc_id", "text", "y", iterations=0)


def test_incremental_line_dedup_two_batches_grow_index(spark, tmp_path):
    """Continuous-ingest line dedup: batch 2 must drop lines that batch 1
    contributed to the persisted index, not just the original corpus's."""
    from pathwaydataframework_spark.operators import dedup
    import pyspark.sql.functions as F

    corpus = spark.createDataFrame(
        [(0, "copyright acme corp\nold article body")], "doc_id long, text string"
    )
    idx_path = str(tmp_path / "line_idx")
    dedup.line_index(corpus).write.parquet(idx_path)

    b1 = spark.createDataFrame(
        [(1, "copyright acme corp\nfresh news one")], "doc_id long, text string"
    )
    out1 = dedup.incremental_line_dedup(
        b1, spark.read.parquet(idx_path), id_col="doc_id", text_col="text"
    )
    r1 = out1.collect()[0]
    assert r1["clean_text"] == "fresh news one" and r1["n_removed_lines"] == 1
    # append batch-1 survivors to the index
    dedup.line_index(out1, text_col="clean_text").write.mode("append").parquet(idx_path)

    b2 = spark.createDataFrame(
        [(2, "fresh news one\nfresh news two\ncopyright acme corp")],
        "doc_id long, text string",
    )
    out2 = dedup.incremental_line_dedup(
        b2, spark.read.parquet(idx_path), id_col="doc_id", text_col="text"
    )
    r2 = out2.collect()[0]
    assert r2["clean_text"] == "fresh news two" and r2["n_removed_lines"] == 2
    # intra-batch first occurrence still wins inside one batch
    b3 = spark.createDataFrame(
        [(3, "brand new line\nbrand new line")], "doc_id long, text string"
    )
    r3 = dedup.incremental_line_dedup(
        b3, spark.read.parquet(idx_path), id_col="doc_id", text_col="text"
    ).collect()[0]
    assert r3["clean_text"] == "brand new line" and r3["n_removed_lines"] == 1


def test_leakage_safe_split_keeps_neardups_together(spark):
    from pathwaydataframework_spark.operators import sampling

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, f"unique document number {i} with distinct words {i*7} {i*13}") for i in range(40)]
    # a near-dup pair that plain split() could separate
    rows += [(100, base + " alpha"), (101, base + " alpha beta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    parts = sampling.leakage_safe_split(
        docs, "doc_id", "text", {"train": 0.5, "test": 0.5},
        seed=0, num_hashes=16, bands=8, threshold=0.5,
    )
    sides = {
        name: {r["doc_id"] for r in p.select("doc_id").collect()}
        for name, p in parts.items()
    }
    # disjoint cover
    assert sides["train"] | sides["test"] == {r[0] for r in rows}
    assert not (sides["train"] & sides["test"])
    # the near-dup component lands on ONE side
    assert ({100, 101} <= sides["train"]) or ({100, 101} <= sides["test"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sampling.leakage_safe_split(docs, "doc_id", "text", {"a": 0.8, "b": 0.4})


def test_assign_shards_layout_and_export_round_trip(spark, tmp_path):
    from pathwaydataframework_spark.operators import sampling

    docs = spark.range(200).withColumnRenamed("id", "doc_id")
    out = sampling.assign_shards(docs, "doc_id", rows_per_shard=64, seed=3)
    rows = out.collect()
    # full cover, contiguous shards of 64 (last partial)
    assert sorted(r["position"] for r in rows) == list(range(200))
    sizes = {}
    for r in rows:
        assert r["shard"] == r["position"] // 64
        assert r["pos_in_shard"] == r["position"] % 64
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
    assert sizes == {0: 64, 1: 64, 2: 64, 3: 8}
    # partitionBy export writes one directory per shard and round-trips
    path = str(tmp_path / "shards")
    out.write.partitionBy("shard").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert back.select("shard").distinct().count() == 4
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sampling.assign_shards(docs, "doc_id", rows_per_shard=0)


def test_sliding_window_split_overlap_and_edges(spark):
    from pathwaydataframework_spark.operators import splitters

    d = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "x y"), (3, ""), (4, None), (5, "p q r s t")],
        "doc_id long, text string",
    )
    out = splitters.sliding_window_split(d, "doc_id", "text", size=4, stride=2)
    rows = sorted((r["doc_id"], r["chunk_idx"], r["chunk"]) for r in out.collect())
    # overlap = size - stride = 2 tokens carried across boundaries; a
    # window that reaches the end suppresses a trailing partial
    assert [c for i, _, c in rows if i == 1] == ["a b c d", "c d e f", "e f g h", "g h i j"]
    assert [c for i, _, c in rows if i == 2] == ["x y"]
    assert not [c for i, _, c in rows if i in (3, 4)]  # blank/NULL -> no rows
    assert [c for i, _, c in rows if i == 5] == ["p q r s", "r s t"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        splitters.sliding_window_split(d, "doc_id", "text", size=4, stride=5)
    with _pytest.raises(ValueError):
        splitters.sliding_window_split(d, "doc_id", "text", size=0, stride=1)


def test_temperature_sample_matches_python_model_exactly(spark):
    """The kept set must equal a pure-Python replay of the threshold
    arithmetic (md5 bucket, sqrt rate, floor) — the same cross-engine
    contract the DuckDB oracle checks."""
    import hashlib
    import math

    from pathwaydataframework_spark.operators import sampling

    rows = [(i, ["a", "b", "c"][min(i % 7, 2)]) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, src string")
    got = {r["id"] for r in sampling.temperature_sample(df, "id", "src", alpha=0.5, seed=4).collect()}

    counts = {}
    for _, s in rows:
        counts[s] = counts.get(s, 0) + 1
    nmin = min(counts.values())
    thr = {
        s: math.floor(math.sqrt(nmin / n) * float(1 << 32)) for s, n in counts.items()
    }
    want = {
        i
        for i, s in rows
        if int(hashlib.md5(f"{i}:4".encode()).hexdigest()[:8], 16) < thr[s]
    }
    assert got == want


def test_sliding_chunks_match_python_model(spark):
    from pathwaydataframework_spark.operators import splitters
    import math

    texts = [
        " ".join(f"t{j}" for j in range(n)) for n in (0, 1, 3, 4, 5, 8, 9, 16, 17)
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {}
    for r in splitters.sliding_window_split(df, "doc_id", "text", size=4, stride=3).collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk"]))

    def model(text, size=4, stride=3):
        toks = text.split() if text.strip() else []
        if not toks:
            return []
        ns = max(math.ceil((len(toks) - size) / stride) + 1, 1)
        return [
            (i, " ".join(toks[i * stride : i * stride + size])) for i in range(ns)
        ]

    for i, t in enumerate(texts):
        assert sorted(got.get(i, [])) == model(t), f"doc {i}"


def test_review_fixes_null_edges(spark):
    """r3 self-review regressions: NULL ordering values in dedup, NULL
    text in line dedup, zero-dim PPM, alpha=1 passthrough."""
    import pathwaydataframework_spark as pw
    import pyspark.sql.functions as F
    from pathwaydataframework_spark.operators import dedup, multimodal, sampling

    # exact_dedup: group whose keep_order_by is all-NULL must yield a REAL
    # row (min_by used to drop every NULL-ordered row -> fabricated NULLs);
    # NULL order sorts first, like the old asc window
    t = pw.Table.from_rows(
        spark,
        [("a", None, 1), ("a", 5, 2), ("b", None, 3), ("b", None, 4)],
        "k string, ts long, v long",
    )
    out = {r["k"]: (r["ts"], r["v"]) for r in dedup.exact_dedup(
        t, pw.this.k, keep_order_by=pw.this.ts).df.collect()}
    assert out["a"] == (None, 1)          # NULL-first beats ts=5
    assert out["b"][1] in (3, 4)          # real row, not (None, None)

    # deduplicate: keep-last prefers non-NULL values; all-NULL group
    # still emits a real row
    t2 = pw.Table.from_rows(
        spark, [("a", None, 1), ("a", 7, 2), ("c", None, 9)],
        "k string, seq long, v long",
    )
    out2 = {r["k"]: r["v"] for r in dedup.deduplicate(
        t2, value=pw.this.seq, instance=pw.this.k).df.collect()}
    assert out2 == {"a": 2, "c": 9}

    # line dedup: NULL text behaves as empty doc with ZERO removed lines
    docs = spark.createDataFrame([(1, None), (2, "x")], "doc_id long, text string")
    r = {x["doc_id"]: (x["clean_text"], x["n_removed_lines"])
         for x in dedup.dedup_lines_global(docs, "doc_id", "text").collect()}
    assert r[1] == ("", 0) and r[2] == ("x", 0)

    # zero-dimension PPM honours the None contract instead of IndexError
    assert multimodal.image_dhash(b"P6\n0 0\n255\n") is None

    # alpha=1 temperature sampling is a true passthrough (NULL keys kept)
    df = spark.createDataFrame([(1, "a"), (2, None), (None, "a")], "id long, src string")
    assert sampling.temperature_sample(df, "id", "src", alpha=1.0).count() == 3

    # audio_dedup_pairs validates frames driver-side
    import pytest as _pytest

    bdf = spark.createDataFrame([(1, bytearray(b"x"))], "id long, data binary")
    with _pytest.raises(ValueError):
        multimodal.audio_dedup_pairs(bdf, id_col="id", frames=12)


def test_winnowing_shares_fingerprints_on_common_substrings(spark):
    from pathwaydataframework_spark.operators import text

    k, w = 5, 4
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over everything"),
            (2, "a quick brown fox sits still"),   # shares "quick brown fox" (15 >= k+w-1)
            (3, "zzzz completely unrelated words here"),
            (4, "xy"),                              # too short -> no fingerprints
        ],
        "doc_id long, text string",
    )
    rows = text.winnowing_fingerprints(docs, k=k, window=w).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["gram_hash"])
    # winnowing guarantee: any shared substring of length >= k + w - 1
    # yields at least one shared selected hash
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3])
    assert 4 not in by_doc
    # positions are in-range and selections are distinct per doc
    assert all(0 <= r["pos"] for r in rows)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        text.winnowing_fingerprints(docs, k=0)
    with _pytest.raises(ValueError):
        text.winnowing_fingerprints(docs, window=0)


def test_per_key_topk_matches_python_model_under_skew(spark):
    # hot key: 70% of rows land on one domain; expected top-3 per domain
    # computed independently in Python (sort by score desc, doc_id asc)
    rows = [(i, "hot.com" if i % 10 < 7 else f"cold{i % 5}.org", (i * 37) % 19)
            for i in range(400)]
    by_dom: dict[str, list[tuple[int, int]]] = {}
    for i, dom, score in rows:
        by_dom.setdefault(dom, []).append((i, score))
    want = {
        (dom, i, rank + 1)
        for dom, members in by_dom.items()
        for rank, (i, _) in enumerate(
            sorted(members, key=lambda m: (-m[1], m[0]))[:3]
        )
    }
    df = spark.createDataFrame(rows, "doc_id long, domain string, score long")
    got = {
        (r["domain"], r["doc_id"], r["rank"])
        for r in sampling.per_key_topk(
            df, "domain", "score", k=3, tie_col="doc_id"
        ).collect()
    }
    # domains: hot + cold{2,3,4} (i%10 in {7,8,9} -> i%5 in {2,3,4})
    assert got == want and len(got) == 3 * 4


def test_per_key_topk_plan_has_partial_window_group_limit(spark):
    # The operator's skew-safety claim IS this optimizer rewrite (see the
    # docstring): a Partial WindowGroupLimit below the exchange.  Pin it.
    df = spark.createDataFrame(
        [(i, f"k{i % 3}", i % 7) for i in range(50)],
        "doc_id long, key string, score long",
    )
    from pathwaydataframework_spark.plans import formatted_plan

    out = sampling.per_key_topk(df, "key", "score", k=5, tie_col="doc_id")
    plan = formatted_plan(out)
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan


def test_per_key_topk_small_groups_and_ascending(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 3), (3, "b", 9)], "id long, key string, v long"
    )
    out = sampling.per_key_topk(
        df, "key", "v", k=10, descending=False, tie_col="id"
    ).collect()
    assert {(r["key"], r["id"], r["rank"]) for r in out} == {
        ("a", 2, 1), ("a", 1, 2), ("b", 3, 1)
    }
    with pytest.raises(ValueError):
        sampling.per_key_topk(df, "key", "v", k=0)


def test_bloom_dedup_exact_despite_false_positives(spark):
    from pathwaydataframework_spark.operators import dedup

    # 128-bit filter for 80 seen keys: false positives guaranteed — the
    # exact confirm pass must repair every one of them
    seen_rows = [(i, f"key{i}") for i in range(0, 160, 2)]  # evens
    new_rows = [(i, f"key{i}") for i in range(200)]
    seen = spark.createDataFrame(seen_rows, "id long, key string")
    new = spark.createDataFrame(new_rows, "id long, key string")
    out = sorted(
        r["id"]
        for r in dedup.bloom_dedup(
            new, seen, "key", m_bits=128, k=3, exact_confirm=True
        ).collect()
    )
    want = sorted(i for i in range(200) if not (i < 160 and i % 2 == 0))
    assert out == want
    # probabilistic mode: every true duplicate still drops, plus ~fpp
    # of the unseen keys — result is a subset of the exact answer
    prob = {
        r["id"]
        for r in dedup.bloom_dedup(
            new, seen, "key", m_bits=128, k=3, exact_confirm=False
        ).collect()
    }
    assert prob <= set(want)
    assert len(prob) < len(want)  # 128 bits for 80 keys MUST false-positive


def test_bloom_index_prebuilt_and_roundtrip(spark, tmp_path):
    from pathwaydataframework_spark.operators import dedup

    seen = spark.createDataFrame([(f"k{i}",) for i in range(500)], "key string")
    idx = dedup.build_bloom_index(seen, "key", m_bits=1 << 14, k=5)
    assert idx.count() <= (1 << 14) // 64
    p = str(tmp_path / "bloom_idx")
    idx.write.parquet(p)  # the persistable incremental-dedup state
    idx2 = spark.read.parquet(p)
    new = spark.createDataFrame(
        [(f"k{i}",) for i in range(490, 510)], "key string"
    )
    kept = {
        r["key"]
        for r in dedup.bloom_dedup(
            new, None, "key", index=idx2, m_bits=1 << 14, k=5, exact_confirm=False
        ).collect()
    }
    # all 10 true dupes dropped; at 16384 bits / 500 keys the fpp is ~0,
    # so the 10 unseen keys survive
    assert kept == {f"k{i}" for i in range(500, 510)}


def test_bloom_params_textbook_values():
    from pathwaydataframework_spark.operators import dedup

    m, k = dedup.bloom_params(1000, 0.01)
    assert 9000 < m < 10100 and k == 7
    with pytest.raises(ValueError):
        dedup.bloom_params(0)
    with pytest.raises(ValueError):
        dedup.bloom_params(10, 1.5)


def test_token_budget_sample_matches_python_model(spark):
    import hashlib

    rows = [(i, "src" + str(i % 2), (i * 7) % 50 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, src string, n_tok long")
    budget = 2000
    # independent python model: per-source md5 order, running-total prefix
    want = set()
    for src in ("src0", "src1"):
        members = sorted(
            (r for r in rows if r[1] == src),
            key=lambda r: (hashlib.md5(f"{r[0]}:3".encode()).hexdigest(), r[0]),
        )
        cum = 0
        for r in members:
            cum += r[2]
            if cum > budget:
                break
            want.add((r[0], cum))
    got = {
        (r["doc_id"], r["cum_tokens"])
        for r in sampling.token_budget_sample(
            df, "doc_id", "n_tok", budget=budget, by="src", seed=3
        ).collect()
    }
    assert got == want and len(want) > 10


def test_token_budget_sample_global_and_edges(spark):
    df = spark.createDataFrame(
        [(i, 10) for i in range(100)], "doc_id long, n_tok long"
    )
    out = sampling.token_budget_sample(df, "doc_id", "n_tok", budget=250)
    assert out.count() == 25  # exactly 25 docs of 10 tokens fit in 250
    assert out.agg(F.max("cum_tokens")).first()[0] == 250
    assert sampling.token_budget_sample(df, "doc_id", "n_tok", budget=0).count() == 0
    with pytest.raises(ValueError):
        sampling.token_budget_sample(df, "doc_id", "n_tok", budget=-1)
    # determinism: same seed → same prefix
    a = {r["doc_id"] for r in out.collect()}
    b = {
        r["doc_id"]
        for r in sampling.token_budget_sample(
            df, "doc_id", "n_tok", budget=250
        ).collect()
    }
    assert a == b


def test_update_bloom_index_incremental_loop(spark):
    # the streaming shape: three arriving batches, each deduped against
    # the index built from everything before it, then folded in —
    # equivalent to a global first-occurrence dedup over the whole stream
    from pathwaydataframework_spark.operators import dedup

    batches = [
        [("a",), ("b",), ("c",)],
        [("b",), ("d",)],          # b seen in batch 1
        [("a",), ("d",), ("e",)],  # a, d seen earlier
    ]
    m, k = 1 << 12, 5
    idx = dedup.build_bloom_index(
        spark.createDataFrame([], "key string"), "key", m_bits=m, k=k
    )
    survivors = []
    for rows in batches:
        b = spark.createDataFrame(rows, "key string")
        kept = dedup.bloom_dedup(
            b, None, "key", index=idx, m_bits=m, k=k, exact_confirm=False
        )
        survivors.extend(r["key"] for r in kept.collect())
        idx = dedup.update_bloom_index(idx, b, "key", m_bits=m, k=k)
        idx = idx.localCheckpoint()  # what a real loop persists per batch
    assert sorted(survivors) == ["a", "b", "c", "d", "e"]


def test_token_budget_sample_null_group_is_a_real_group(spark):
    # rows whose `by` column is NULL must form their own budget group
    # (SQL window semantics), not silently vanish in the offsets join
    rows = [(1, None, 100), (2, None, 100), (3, "en", 100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tok long")
    out = sampling.token_budget_sample(df, "doc_id", "n_tok", budget=150, by="lang")
    got = {(r["doc_id"], r["cum_tokens"]) for r in out.collect()}
    # each group keeps exactly its first doc (100 <= 150, 200 > 150)
    null_kept = {g for g in got if g[0] in (1, 2)}
    assert len(null_kept) == 1 and next(iter(null_kept))[1] == 100
    assert (3, 100) in got


def test_token_budget_sample_no_global_window(spark):
    # same 100 TB hazard check as deterministic_shuffle: the running
    # total must come from per-shard windows, never a single-partition
    # window over the full frame
    df = spark.range(1_000).select(
        F.col("id").alias("doc_id"), F.lit(5).alias("n_tok")
    )
    plan = (
        sampling.token_budget_sample(df, "doc_id", "n_tok", budget=100)
        ._jdf.queryExecution()
        .toString()
    )
    for line in plan.splitlines():
        if "Window" in line and "sum(" in line and "__h" in line:
            assert "__shard" in line, line


def test_extract_links_quote_styles_and_edges(spark):
    from pathwaydataframework_spark.operators.parsers import extract_links

    cases = [
        # mixed quotes + uppercase attr + whitespace around '='
        (
            '<a HREF = "https://a.com/x">t</a><a href=\'/rel\'>r</a>',
            ["https://a.com/x", "/rel"],
        ),
        # no links at all
        ("<p>plain</p>", []),
        # empty href, fragment, javascript: all extracted verbatim
        # (filtering is the caller's policy)
        (
            "<a href=\"\">e</a><a href='#top'>f</a>",
            ["", "#top"],
        ),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "h string")
    got = [
        r["l"]
        for r in df.select(extract_links(F.col("h")).alias("l")).collect()
    ]
    assert got == [want for _, want in cases]


def test_sitemap_locs_trims_and_drops_empty(spark):
    from pathwaydataframework_spark.operators.parsers import sitemap_locs

    xml = (
        "<urlset><url><LOC> https://a.com/1 </LOC></url>"
        "<url><loc>https://a.com/2</loc></url>"
        "<url><loc>  </loc></url></urlset>"
    )
    df = spark.createDataFrame([(xml,), ("<urlset/>",)], "x string")
    got = [r["l"] for r in df.select(sitemap_locs(F.col("x")).alias("l")).collect()]
    assert got == [["https://a.com/1", "https://a.com/2"], []]


def test_pack_no_straddle_properties(spark):
    """Boundary-respecting packing: no document crosses a sequence cut,
    sequences fill greedily in id order, oversized docs get a dedicated
    sequence, and the layout is deterministic."""
    from pathwaydataframework_spark.operators import packing

    rows = [(i, n) for i, n in enumerate([100, 100, 100, 50, 300, 10, 256, 1])]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = packing.pack_no_straddle(df, "doc_id", "n_tok", 256, shards=1, seed=0)
    got = {
        r["doc_id"]: (r["seq_id"], r["start_offset"]) for r in out.collect()
    }
    # hand-folded, id order, cap 256:
    # d0:100@s0/0, d1:100@s0/100 (200), d2 would hit 300 -> s1/0,
    # d3:50@s1/100 (150), d4:300 overflows -> s2/0 alone (oversized),
    # d5:10 -> s3/0, d6:256 would hit 266 -> s4/0 (exactly cap),
    # d7:1 -> s5/0
    assert got == {
        0: (0, 0), 1: (0, 100), 2: (1, 0), 3: (1, 100),
        4: (2, 0), 5: (3, 0), 6: (4, 0), 7: (5, 0),
    }
    # invariant over a bigger random-ish frame, multiple shards: every
    # in-cap doc ends within its sequence; sequences are contiguous
    big = spark.createDataFrame(
        [(i, (i * 37) % 400 + 1) for i in range(500)], "doc_id long, n_tok long"
    )
    packed = packing.pack_no_straddle(big, "doc_id", "n_tok", 256, shards=8)
    bad = packed.filter(
        (F.col("n_tok") <= 256)
        & (F.col("start_offset") + F.col("n_tok") > 256)
    )
    assert bad.count() == 0
    # oversized docs sit alone at offset 0
    over = packed.filter(F.col("n_tok") > 256)
    assert over.filter(F.col("start_offset") != 0).count() == 0
    # determinism
    again = {
        r["doc_id"]: (r["shard"], r["seq_id"], r["start_offset"])
        for r in packing.pack_no_straddle(
            big, "doc_id", "n_tok", 256, shards=8
        ).collect()
    }
    first = {
        r["doc_id"]: (r["shard"], r["seq_id"], r["start_offset"])
        for r in packed.collect()
    }
    assert first == again
    # a NULL count (NULL text upstream) packs as zero tokens instead of
    # crashing the Arrow task (code-review r8 finding)
    with_null = spark.createDataFrame(
        [(0, 10), (1, None), (2, 250)], "doc_id long, n_tok long"
    )
    rows = {
        r["doc_id"]: (r["seq_id"], r["start_offset"])
        for r in packing.pack_no_straddle(
            with_null, "doc_id", "n_tok", 256, shards=1
        ).collect()
    }
    assert rows == {0: (0, 0), 1: (0, 10), 2: (1, 0)}


def test_materialize_sequences(spark):
    """The packing writer: sequences rebuild in offset order from real
    multi-token docs, padding fills to the cap with the real count kept,
    and an oversized single-doc sequence survives unpadded/untruncated."""
    from pathwaydataframework_spark.operators import bpe, packing

    v = {"a": 0, "b": 1, "ab": 2}
    df = spark.createDataFrame(
        [(0, "ab a"), (1, "b b b"), (2, "a"), (3, "ab ab ab ab")],
        "doc_id long, text string",
    )
    enc = bpe.bpe_encode(df, v, append_eos_id=9)
    # n_tokens: d0=3, d1=4, d2=2, d3=5; cap 6, one shard ->
    # fold in id order: d0(3), d1 would hit 7 -> seq1 (4), d2 fits (6),
    # d3 -> seq2 (5)
    layout = packing.pack_no_straddle(enc, "doc_id", "n_tokens", 6, shards=1)
    out = packing.materialize_sequences(
        enc, layout, max_tokens=6, pad_id=-1
    ).collect()
    seqs = {
        r["seq_id"]: (list(r["token_ids"]), r["n_tokens"]) for r in out
    }
    assert seqs[0] == ([2, 0, 9, -1, -1, -1], 3)           # d0 padded
    assert seqs[1] == ([1, 1, 1, 9, 0, 9], 6)              # d1 + d2, full
    assert seqs[2] == ([2, 2, 2, 2, 9, -1], 5)             # d3 padded
    # doc_spans: offset-ordered (doc_id, off, len) per document — the
    # trainer's attention/loss-mask boundary map
    spans = {
        r["seq_id"]: [(s["doc_id"], s["off"], s["len"]) for s in r["doc_spans"]]
        for r in out
    }
    assert spans == {0: [(0, 0, 3)], 1: [(1, 0, 4), (2, 4, 2)], 2: [(3, 0, 5)]}
    assert all(not r["oversized"] for r in out)
    # an oversized doc's dedicated sequence is emitted whole, no padding,
    # and FLAGGED so a loader filters/truncates deliberately
    big = spark.createDataFrame([(0, "a b a b a b a b")], "doc_id long, text string")
    enc_b = bpe.bpe_encode(big, v)
    layout_b = packing.pack_no_straddle(enc_b, "doc_id", "n_tokens", 4, shards=1)
    (row,) = packing.materialize_sequences(
        enc_b, layout_b, max_tokens=4, pad_id=-1
    ).collect()
    assert row["n_tokens"] == 8 and len(row["token_ids"]) == 8
    assert row["oversized"] is True
    assert [(s["doc_id"], s["off"], s["len"]) for s in row["doc_spans"]] == [
        (0, 0, 8)
    ]
    # without max_tokens there is no cap to violate — no oversized column
    bare = packing.materialize_sequences(enc, layout)
    assert "oversized" not in bare.columns and "doc_spans" in bare.columns


def test_materialize_sequences_by_offset(spark):
    """The concatenate-and-cut writer splits straddlers: every sequence
    except each shard's tail is exactly max_tokens ids, pieces land in
    position order, and a doc spanning 3+ sequences reassembles."""
    from pathwaydataframework_spark.operators import packing

    # single shard, cap 8: docs of 5, 10 (straddles seqs 0->1), 3, 20
    # (spans seqs 2,3,4), 1 -> stream of 39 ids cut at 8
    sizes = {0: 5, 1: 10, 2: 3, 3: 20, 4: 1}
    toks = spark.createDataFrame(
        [(d, n, [d] * n) for d, n in sizes.items()],
        "doc_id long, n_tok long, token_ids array<long>",
    )
    layout = packing.pack_by_offset(toks, "doc_id", "n_tok", 8, shards=1)
    out = packing.materialize_sequences_by_offset(toks, layout, 8).collect()
    seqs = {r["seq_id"]: list(r["token_ids"]) for r in out}
    stream = [d for d in sorted(sizes) for _ in range(sizes[d])]
    want = {
        k: stream[k * 8 : (k + 1) * 8] for k in range((len(stream) + 7) // 8)
    }
    assert seqs == want
    # every non-tail sequence is exactly full
    assert all(len(v) == 8 for k, v in seqs.items() if k < max(seqs))
    # doc_spans: one span per PIECE, offset-ordered — a straddler shows
    # up in every sequence it touches with its in-sequence off/len
    spans = {
        r["seq_id"]: [(s["doc_id"], s["off"], s["len"]) for s in r["doc_spans"]]
        for r in out
    }
    assert spans == {
        0: [(0, 0, 5), (1, 5, 3)],
        1: [(1, 0, 7), (2, 7, 1)],
        2: [(2, 0, 2), (3, 2, 6)],
        3: [(3, 0, 8)],
        4: [(3, 0, 6), (4, 6, 1)],
    }
    # spans tile each sequence exactly: contiguous, gap-free
    for sid, sp in spans.items():
        pos = 0
        for _, off, ln in sp:
            assert off == pos
            pos += ln
        assert pos == len(seqs[sid])


def test_schedule_fetches_no_global_sort(spark):
    """Politeness queue numbering must inherit deterministic_shuffle's
    sharded layout: every window ordering by the row hash is partitioned
    by __shard (+ host), never a per-host single-partition window over
    the full frontier — the hot-host 100 TB hazard."""
    frontier = spark.range(1_000).select(
        F.concat(F.lit("h"), F.col("id") % 7).alias("host"),
        F.concat(F.lit("https://h"), F.col("id") % 7, F.lit("/"), F.col("id")).alias("url"),
    )
    plan = text.schedule_fetches(frontier)._jdf.queryExecution().toString()
    checked = 0
    for line in plan.splitlines():
        if "Window" in line and "__h" in line:
            assert "__shard" in line, line
            checked += 1
    assert checked >= 1


def test_materialize_by_offset_stays_jvm_side(spark):
    """The concatenate-and-cut writer is pure Catalyst: no Python/Arrow
    eval nodes anywhere in the plan (the straddle split is
    sequence+explode+slice, not a kernel)."""
    from pathwaydataframework_spark.operators import packing

    toks = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 13 + 1).alias("n_tok"),
        F.array_repeat(F.col("id"), (F.col("id") % 13 + 1).cast("int")).alias(
            "token_ids"
        ),
    )
    layout = packing.pack_by_offset(toks, "doc_id", "n_tok", 64, shards=4)
    plan = (
        packing.materialize_sequences_by_offset(toks, layout, 64)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert "BatchEvalPython" not in plan


def test_training_masks(spark):
    """doc_spans -> per-token trainer inputs: position_ids restart at
    every doc boundary, segment_ids index the doc within its sequence,
    padding gets (pad_pos, pad_seg), arrays sized to token_ids exactly —
    and the step itself is pure Catalyst (zero Python nodes over a
    plain input)."""
    from pathwaydataframework_spark.operators import packing

    seqs = spark.createDataFrame(
        [
            (0, 0, [5, 6, 7, 8, 9, -1], 5,
             [(10, 0, 3), (11, 3, 2)]),
            (0, 1, [4, -1, -1, -1, -1, -1], 1, [(12, 0, 1)]),
        ],
        "shard long, seq_id long, token_ids array<long>, n_tokens long, "
        "doc_spans array<struct<doc_id: long, off: long, len: long>>",
    )
    out = {
        r["seq_id"]: (list(r["position_ids"]), list(r["segment_ids"]))
        for r in packing.training_masks(seqs).collect()
    }
    assert out[0] == ([0, 1, 2, 0, 1, 0], [0, 0, 0, 1, 1, -1])
    assert out[1] == ([0, 0, 0, 0, 0, 0], [0, -1, -1, -1, -1, -1])
    plan = (
        packing.training_masks(seqs)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    for node in ("ArrowEvalPython", "FlatMapGroupsInPandas", "BatchEvalPython"):
        assert node not in plan
    # custom pad markers
    alt = {
        r["seq_id"]: (list(r["position_ids"]), list(r["segment_ids"]))
        for r in packing.training_masks(
            seqs, pad_pos=-1, pad_seg=99
        ).collect()
    }
    assert alt[1] == ([0, -1, -1, -1, -1, -1], [0, 99, 99, 99, 99, 99])


def test_training_masks_zero_length_span(spark):
    """A zero-length doc span (an empty document still owns a layout
    slot) must contribute NO positions/segments: sequence(0, len-1)
    with len=0 would count DOWN to [0, -1] and misalign every array
    after it (code-review r9 finding)."""
    from pathwaydataframework_spark.operators import packing

    toks = spark.createDataFrame(
        [(0, 3, [7, 7, 7]), (1, 0, []), (2, 2, [9, 9])],
        "doc_id long, n_tok long, token_ids array<long>",
    )
    layout = packing.pack_no_straddle(toks, "doc_id", "n_tok", 8, shards=1)
    seqs = packing.materialize_sequences(
        toks, layout, max_tokens=8, pad_id=-1
    )
    (row,) = packing.training_masks(seqs).collect()
    assert list(row["token_ids"]) == [7, 7, 7, 9, 9, -1, -1, -1]
    assert list(row["position_ids"]) == [0, 1, 2, 0, 1, 0, 0, 0]
    # segment index stays aligned with the doc_spans array (the empty
    # doc keeps its index; its tokens just don't exist)
    assert list(row["segment_ids"]) == [0, 0, 0, 2, 2, -1, -1, -1]
    assert len(row["position_ids"]) == len(row["token_ids"])
    assert len(row["segment_ids"]) == len(row["token_ids"])


def test_zero_token_doc_writer_contracts(spark):
    """The two writers' zero-token-document contracts, stated and
    pinned (VERDICT r9 'What's wrong' #1): materialize_sequences keeps
    a zero-length span for an empty document; materialize_sequences_
    by_offset drops it entirely (a zero-length piece has no tokens to
    place in any cut) — so the same input leaves a span in one layout
    and none in the other, and both token streams are identical."""
    from pathwaydataframework_spark.operators import packing

    toks = spark.createDataFrame(
        [(0, 2, [5, 5]), (1, 0, []), (2, 3, [9, 9, 9])],
        "doc_id long, n_tok long, token_ids array<long>",
    )
    ns_layout = packing.pack_no_straddle(toks, "doc_id", "n_tok", 4, shards=1)
    ns = packing.materialize_sequences(toks, ns_layout, max_tokens=4).collect()
    ns_span_docs = {
        s["doc_id"] for r in ns for s in r["doc_spans"]
    }
    assert 1 in ns_span_docs  # empty doc keeps its (len=0) span
    empty_spans = [
        s for r in ns for s in r["doc_spans"] if s["doc_id"] == 1
    ]
    assert [(s["off"], s["len"]) for s in empty_spans] == [(2, 0)]
    bo_layout = packing.pack_by_offset(toks, "doc_id", "n_tok", 4, shards=1)
    bo = packing.materialize_sequences_by_offset(toks, bo_layout, 4).collect()
    bo_span_docs = {s["doc_id"] for r in bo for s in r["doc_spans"]}
    assert 1 not in bo_span_docs  # by-offset drops the empty doc
    # the token streams themselves agree on content
    assert sorted(
        t for r in bo for t in r["token_ids"]
    ) == sorted(t for r in ns for t in r["token_ids"] )


def test_packing_efficiency(spark):
    """Padding-waste accounting: padded slots count only non-oversized
    sequences, oversized ones are counted separately, waste_frac is
    padded / (padded + real)."""
    from pathwaydataframework_spark.operators import packing

    seqs = spark.createDataFrame(
        [
            (0, 0, 8),    # full
            (0, 1, 5),    # 3 padded
            (0, 2, 12),   # oversized: no padding counted
            (1, 0, 2),    # 6 padded
        ],
        "shard long, seq_id long, n_tokens long",
    )
    out = {
        r["shard"]: (
            r["n_seqs"], r["real_tokens"], r["padded_slots"],
            r["oversized_seqs"], r["waste_frac"], r["capped_waste_frac"],
        )
        for r in packing.packing_efficiency(seqs, 8).collect()
    }
    # whole-grid waste vs capped-grid waste: shard 0's oversized seq
    # (12 real tokens) dilutes waste_frac but not capped_waste_frac
    assert out[0] == (3, 25, 3, 1, round(3 / 28, 6), round(3 / 16, 6))
    assert out[1] == (1, 2, 6, 0, 0.75, 0.75)
    # an all-oversized group has no capped grid: NULL, not a div-zero
    (only_over,) = packing.packing_efficiency(
        seqs.filter(F.col("n_tokens") > 8), 8
    ).collect()
    assert only_over["capped_waste_frac"] is None
    # alternate grouping key list
    (tot,) = packing.packing_efficiency(
        seqs.withColumn("ds", F.lit("web")), 8, by=["ds"]
    ).collect()
    assert tot["n_seqs"] == 4 and tot["padded_slots"] == 9
    import pytest as _pytest

    with _pytest.raises(ValueError):
        packing.packing_efficiency(seqs, 0)


def test_write_packed_dataset(spark, tmp_path):
    """The terminal sink: shard-partitioned parquet, seq_id-ordered
    within files, manifest totals matching packing_efficiency."""
    import json

    from pathwaydataframework_spark.operators import bpe, packing

    v = {"a": 0, "b": 1, "ab": 2}
    df = spark.createDataFrame(
        [(d, "ab a b" if d % 2 else "a b") for d in range(40)],
        "doc_id long, text string",
    )
    enc = bpe.bpe_encode(df, v, append_eos_id=9)
    layout = packing.pack_no_straddle(enc, "doc_id", "n_tokens", 8, shards=4)
    seqs = packing.materialize_sequences(enc, layout, max_tokens=8, pad_id=-1)
    path = str(tmp_path / "packed")
    manifest = packing.write_packed_dataset(seqs, path, max_tokens=8)
    with open(path + "/_manifest.json") as f:
        on_disk = json.load(f)
    assert on_disk["n_seqs"] == manifest["n_seqs"] == seqs.count()
    assert manifest["n_shards"] == seqs.select("shard").distinct().count()
    # read back: same rows, and within every file seq_ids are ascending
    back = spark.read.parquet(path)
    assert back.count() == seqs.count()
    got = {
        (r["shard"], r["seq_id"]): list(r["token_ids"]) for r in back.collect()
    }
    want = {
        (r["shard"], r["seq_id"]): list(r["token_ids"]) for r in seqs.collect()
    }
    assert got == want
    import pyspark.sql.functions as _F

    files = back.select(
        "shard", "seq_id", _F.input_file_name().alias("f")
    ).collect()
    by_file: dict = {}
    for r in files:
        by_file.setdefault(r["f"], []).append(r["seq_id"])
    assert all(seq == sorted(seq) for seq in by_file.values())
    # manifest waste accounting matches the operator
    eff = {
        r["shard"]: r["padded_slots"]
        for r in packing.packing_efficiency(seqs, 8).collect()
    }
    assert {s["shard"]: s["padded_slots"] for s in manifest["shards"]} == eff
    # manifest describes the ON-DISK dataset: after an append, counts
    # cover both writes, not just the second input (code-review r9)
    manifest2 = packing.write_packed_dataset(
        seqs, path, max_tokens=8, mode="append"
    )
    assert manifest2["n_seqs"] == 2 * manifest["n_seqs"]
    with open(path + "/_manifest.json") as f:
        assert json.load(f)["n_seqs"] == manifest2["n_seqs"]


def test_write_packed_dataset_append_validation(spark, tmp_path):
    """mode='append' validates the new frame against the dataset's
    existing _manifest.json: a different column set or a different
    max_tokens raises instead of silently writing a manifest with
    null-filled stats or the latest call's cap (ADVICE r9)."""
    import pytest as _pytest

    from pathwaydataframework_spark.operators import packing

    seqs = spark.createDataFrame(
        [(0, 0, [1, 2, -1, -1], 2)],
        "shard long, seq_id long, token_ids array<long>, n_tokens long",
    )
    path = str(tmp_path / "packed_v")
    packing.write_packed_dataset(seqs, path, max_tokens=4)
    with _pytest.raises(ValueError, match="max_tokens mismatch"):
        packing.write_packed_dataset(seqs, path, max_tokens=8, mode="append")
    with _pytest.raises(ValueError, match="schema mismatch"):
        packing.write_packed_dataset(
            seqs.withColumn("extra", F.lit(1)), path, max_tokens=4,
            mode="append",
        )
    # a matching append still works, and overwrite never validates
    m = packing.write_packed_dataset(seqs, path, max_tokens=4, mode="append")
    assert m["n_seqs"] == 2
    m2 = packing.write_packed_dataset(seqs, path, max_tokens=16)
    assert m2["max_tokens"] == 16


def test_manifest_io_local_fallback(tmp_path):
    """Without the JVM gateway (Spark Connect), _manifest_io falls back
    to plain local-file IO for scheme-less/file: paths and refuses
    remote URIs with a clear error (ADVICE r9)."""
    import pytest as _pytest

    from pathwaydataframework_spark.operators.packing import _manifest_io

    no_jvm = object()  # a "session" without ._jvm
    read, write = _manifest_io(no_jvm, str(tmp_path / "ds"))
    assert read() is None
    (tmp_path / "ds").mkdir()
    write(b'{"n_seqs": 3}')
    assert read() == b'{"n_seqs": 3}'
    with _pytest.raises(RuntimeError, match="JVM gateway"):
        _manifest_io(no_jvm, "s3a://bucket/ds")


def test_materialize_sequences_truncate_oversized(spark):
    """truncate_oversized=True makes the trainer's cut at the writer:
    ids sliced to the cap, n_tokens = kept count, the crossing span's
    len clamped, the oversized flag kept for audit; non-oversized
    sequences are untouched."""
    from pathwaydataframework_spark.operators import packing

    toks = spark.createDataFrame(
        [(0, 10, list(range(100, 110))), (1, 3, [7, 7, 7])],
        "doc_id long, n_tok long, token_ids array<long>",
    )
    layout = packing.pack_no_straddle(toks, "doc_id", "n_tok", 4, shards=1)
    out = {
        r["seq_id"]: r
        for r in packing.materialize_sequences(
            toks, layout, max_tokens=4, pad_id=-1, truncate_oversized=True
        ).collect()
    }
    big = next(r for r in out.values() if r["oversized"])
    small = next(r for r in out.values() if not r["oversized"])
    assert list(big["token_ids"]) == [100, 101, 102, 103]
    assert big["n_tokens"] == 4
    assert [(s["doc_id"], s["off"], s["len"]) for s in big["doc_spans"]] == [
        (0, 0, 4)
    ]
    assert list(small["token_ids"]) == [7, 7, 7, -1] and small["n_tokens"] == 3
    assert [(s["doc_id"], s["off"], s["len"]) for s in small["doc_spans"]] == [
        (1, 0, 3)
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        packing.materialize_sequences(toks, layout, truncate_oversized=True)


def test_materialize_incremental_missing_shard_state_stays_open(spark):
    """A shard present in open_rows but absent from the pack state (a
    fresh/stale pack_st after a restart) must keep its rows OPEN —
    emitting them would split the sequence when the next batch keeps
    filling the same seq_id (code-review r9: the coalesce defaulted the
    comparison to always-closed)."""
    from pathwaydataframework_spark.operators import packing

    open_rows = spark.createDataFrame(
        [(0, 1, 0, 0, [5, 5])],
        "doc_id long, shard long, seq_id long, start_offset long, "
        "token_ids array<long>",
    )
    empty_batch = spark.createDataFrame(
        [], "doc_id long, shard long, seq_id long, start_offset long, "
        "n_tok long"
    )
    empty_toks = spark.createDataFrame(
        [], "doc_id long, token_ids array<long>"
    )
    emitted, still_open = packing.materialize_sequences_incremental(
        empty_batch, empty_toks, open_rows, packing.pack_state(spark),
        max_tokens=8,
    )
    assert emitted.count() == 0
    assert still_open.count() == 1


def test_write_packed_dataset_empty_input(spark, tmp_path):
    """A legitimately empty dataset (empty stream flush, fully-filtered
    source) must yield its n_seqs=0 manifest, not crash schema inference
    on a directory holding only _SUCCESS (code-review r9)."""
    from pathwaydataframework_spark.operators import packing

    empty = spark.createDataFrame(
        [],
        "shard long, seq_id long, token_ids array<long>, n_tokens long",
    )
    path = str(tmp_path / "empty_packed")
    manifest = packing.write_packed_dataset(empty, path, max_tokens=8)
    assert manifest["n_seqs"] == 0 and manifest["n_shards"] == 0
    assert manifest["real_tokens"] == 0


def test_epoch_pack_layouts_differ_tokens_identical(spark):
    """Epoch-ordered packing (q_epoch_pack's contract): packing on
    deterministic_shuffle's position gives each epoch (= seed) its own
    layout — two epochs must produce DIFFERENT sequence contents — while
    the token MULTISET is identical (a shuffle permutes, never drops or
    duplicates), and every sequence holds whole documents in shuffle
    order."""
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 + 1).cast("long").alias("n_tok"),
        F.array_repeat(F.col("id"), (F.col("id") % 7 + 1).cast("int")).alias(
            "token_ids"
        ),
    )

    def epoch(seed):
        shuffled = sampling.deterministic_shuffle(docs, "doc_id", seed=seed)
        layout = packing.pack_no_straddle(
            shuffled, "position", "n_tok", 16, shards=4
        )
        seqs = packing.materialize_sequences(
            shuffled, layout, id_col="position", max_tokens=16, pad_id=-1
        )
        return {
            (r["shard"], r["seq_id"]): list(r["token_ids"])
            for r in seqs.collect()
        }

    e1, e2 = epoch(1), epoch(2)
    # different epochs lay out differently...
    assert e1 != e2
    # ...but carry exactly the same tokens (pad -1 stripped)
    flat1 = sorted(t for seq in e1.values() for t in seq if t != -1)
    flat2 = sorted(t for seq in e2.values() for t in seq if t != -1)
    expected = sorted(
        t for r in docs.collect() for t in r["token_ids"]
    )
    assert flat1 == flat2 == expected
    # same epoch replays byte-identically
    assert epoch(1) == e1


def test_manifest_io_single_slash_file_uri(spark, tmp_path):
    """write_packed_dataset must accept the single-slash file:/ URI form
    Spark's writers accept — previously it passed the remote-URI check
    unstripped and open() got a literal 'file:/...' path (code-review
    r10).  Exercised through _manifest_io's local fallback directly."""
    from pathwaydataframework_spark.operators.packing import _manifest_io

    class NoJvm:
        _jvm = None

    for uri in (str(tmp_path), f"file:{tmp_path}", f"file://{tmp_path}"):
        read, write = _manifest_io(NoJvm(), uri)
        write(b'{"x": 1}')
        assert read() == b'{"x": 1}'
        assert (tmp_path / "_manifest.json").exists()
        (tmp_path / "_manifest.json").unlink()
    with pytest.raises(RuntimeError, match="JVM gateway"):
        _manifest_io(NoJvm(), "hdfs:/cluster/ds")
    with pytest.raises(RuntimeError, match="JVM gateway"):
        _manifest_io(NoJvm(), "s3a://bucket/ds")


def test_write_packed_dataset_ignore_keeps_manifest(spark, tmp_path):
    """mode='ignore' against an existing dataset must return the PRIOR
    manifest unchanged — the parquet write no-ops, so rewriting the
    manifest under the new call's columns/max_tokens would silently
    change the dataset contract with no data change (code-review r10)."""
    from pathwaydataframework_spark.operators import packing

    seqs = spark.createDataFrame(
        [(0, 0, [1, 2], 2)],
        "shard long, seq_id long, token_ids array<long>, n_tokens long",
    )
    path = str(tmp_path / "ds")
    first = packing.write_packed_dataset(seqs, path, max_tokens=4)
    # a later ignore call with a DIFFERENT cap and extra column
    other = seqs.withColumn("extra", F.lit(1))
    m = packing.write_packed_dataset(other, path, max_tokens=64, mode="ignore")
    assert m == first  # prior manifest returned verbatim
    import json

    with open(path + "/_manifest.json", "rb") as f:
        on_disk = json.loads(f.read())
    assert on_disk["max_tokens"] == 4
    assert on_disk["columns"] == seqs.columns


def test_read_packed_dataset_roundtrip_and_validate(spark, tmp_path):
    """The loader counterpart (r10): read_packed_dataset reconstructs
    the schema from the manifest (explicit, never inferred), returns
    the rows the writer persisted, validates on-disk totals against
    the manifest, and raises on a manifest-less dir, a tampered
    manifest, and a legacy no-schema manifest still loads in contract
    order."""
    import json

    from pathwaydataframework_spark.operators import packing

    seqs = spark.createDataFrame(
        [(0, 0, [1, 2, 3], 3), (1, 0, [4], 1)],
        "shard long, seq_id long, token_ids array<long>, n_tokens long",
    )
    path = str(tmp_path / "ds")
    written = packing.write_packed_dataset(seqs, path, max_tokens=4)
    df, manifest = packing.read_packed_dataset(spark, path)
    assert manifest == written
    assert df.columns == seqs.columns
    assert df.schema == seqs.schema
    got = {(r["shard"], r["seq_id"]): (list(r["token_ids"]), r["n_tokens"])
           for r in df.collect()}
    assert got == {(0, 0): ([1, 2, 3], 3), (1, 0): ([4], 1)}

    # no manifest -> not a packed dataset
    bare = str(tmp_path / "bare")
    seqs.write.parquet(bare)
    with pytest.raises(FileNotFoundError, match="_manifest"):
        packing.read_packed_dataset(spark, bare)

    # tampered manifest totals -> validate raises, validate=False trusts
    # (drop Hadoop's local-FS checksum sidecar: the tamper is a plain
    # open() write, and a stale .crc would fail the read before the
    # validation under test gets to run)
    import os

    mpath = path + "/_manifest.json"
    crc = path + "/._manifest.json.crc"
    with open(mpath) as fh:
        m = json.load(fh)
    m["n_seqs"] = 99
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    if os.path.exists(crc):
        os.unlink(crc)
    with pytest.raises(ValueError, match="does not match its manifest"):
        packing.read_packed_dataset(spark, path)
    df2, _ = packing.read_packed_dataset(spark, path, validate=False)
    assert df2.count() == 2

    # legacy manifest (no schema field) -> inference + contract order
    del m["schema"]
    m["n_seqs"] = 2
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    df3, m3 = packing.read_packed_dataset(spark, path)
    assert df3.columns == seqs.columns
    assert df3.count() == 2 and "schema" not in m3


def test_read_packed_dataset_empty(spark, tmp_path):
    """An empty dataset (only _SUCCESS + manifest on disk) must load —
    the manifest's stored schema is the only schema there is."""
    from pathwaydataframework_spark.operators import packing

    empty = spark.createDataFrame(
        [], "shard long, seq_id long, token_ids array<long>, n_tokens long"
    )
    path = str(tmp_path / "empty")
    packing.write_packed_dataset(empty, path, max_tokens=8)
    df, manifest = packing.read_packed_dataset(spark, path)
    assert df.count() == 0 and manifest["n_seqs"] == 0
    assert df.schema == empty.schema


def test_write_packed_dataset_append_type_drift_rejected(spark, tmp_path):
    """Same column NAMES but drifted TYPES must be rejected BEFORE any
    parquet lands — previously the name-only check passed, mismatched
    files were written, and the stats read-back crashed after mutating
    the dataset, leaving a manifest no read could satisfy (code-review
    r10)."""
    from pathwaydataframework_spark.operators import packing

    longs = spark.createDataFrame(
        [(0, 0, [1], 1)],
        "shard long, seq_id long, token_ids array<long>, n_tokens long",
    )
    ints = spark.createDataFrame(
        [(0, 1, [2], 1)],
        "shard long, seq_id long, token_ids array<int>, n_tokens int",
    )
    path = str(tmp_path / "ds")
    packing.write_packed_dataset(longs, path, max_tokens=4)
    with pytest.raises(ValueError, match="append type mismatch"):
        packing.write_packed_dataset(ints, path, max_tokens=4, mode="append")
    # nothing landed: the dataset still reads clean against its manifest
    df, m = packing.read_packed_dataset(spark, path)
    assert df.count() == 1 and m["n_seqs"] == 1


def test_read_packed_dataset_legacy_empty(spark, tmp_path):
    """An EMPTY dataset whose manifest predates the 'schema' field must
    fail with the remedy, not UNABLE_TO_INFER_SCHEMA (code-review
    r10)."""
    import json
    import os

    from pathwaydataframework_spark.operators import packing

    empty = spark.createDataFrame(
        [], "shard long, seq_id long, token_ids array<long>, n_tokens long"
    )
    path = str(tmp_path / "ds")
    packing.write_packed_dataset(empty, path, max_tokens=4)
    mpath = path + "/_manifest.json"
    with open(mpath) as fh:
        m = json.load(fh)
    del m["schema"]
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    crc = path + "/._manifest.json.crc"
    if os.path.exists(crc):
        os.unlink(crc)
    with pytest.raises(ValueError, match="predates the 'schema' field"):
        packing.read_packed_dataset(spark, path)

@pytest.fixture()
def packed_ds(spark, tmp_path):
    """A written packed dataset (4 shards) + its expected row map, for
    the read_packed_slices contract tests."""
    from pathwaydataframework_spark.operators import bpe

    v = {"a": 0, "b": 1, "ab": 2}
    df = spark.createDataFrame(
        [(d, "ab a b" if d % 2 else "a b") for d in range(60)],
        "doc_id long, text string",
    )
    enc = bpe.bpe_encode(df, v, append_eos_id=9)
    layout = packing.pack_no_straddle(enc, "doc_id", "n_tokens", 8, shards=4)
    seqs = packing.materialize_sequences(enc, layout, max_tokens=8, pad_id=-1)
    path = str(tmp_path / "packed_slices")
    packing.write_packed_dataset(seqs, path, max_tokens=8)
    want = {
        (r["shard"], r["seq_id"]): list(r["token_ids"])
        for r in seqs.collect()
    }
    return path, want


def test_read_packed_slices_disjoint_complete(spark, packed_ds):
    """The rank contract a 1000-GPU loader relies on: slices are
    pairwise disjoint, their union is the whole dataset, positions are
    contiguous 0..n_r-1 per rank in ascending (shard, seq_id) order,
    and the info accounting matches the manifest (VERDICT r10 item 3)."""
    path, want = packed_ds
    world = 2
    slices, infos = {}, {}
    for r in range(world):
        df, info = packing.read_packed_slices(spark, path, world, r)
        slices[r] = df.collect()
        infos[r] = info
    keys = {
        r: {(row["shard"], row["seq_id"]) for row in rows}
        for r, rows in slices.items()
    }
    # pairwise disjoint, union complete, content identical to the writer
    assert keys[0] & keys[1] == set()
    assert keys[0] | keys[1] == set(want)
    got = {
        (row["shard"], row["seq_id"]): list(row["token_ids"])
        for rows in slices.values()
        for row in rows
    }
    assert got == want
    for r, rows in slices.items():
        # the rank rule, stated in the docstring: shard % world == rank
        assert all(row["shard"] % world == r for row in rows)
        # positions contiguous and numbering ascending (shard, seq_id)
        by_pos = sorted(rows, key=lambda x: x["position"])
        assert [x["position"] for x in by_pos] == list(range(len(rows)))
        assert [(x["shard"], x["seq_id"]) for x in by_pos] == sorted(
            (x["shard"], x["seq_id"]) for x in rows
        )
        assert infos[r]["n_seqs"] == len(rows)
        assert infos[r]["shards"] == sorted(
            {row["shard"] for row in rows}
        )
    # the balance accounting covers every rank, from the manifest alone
    assert infos[0]["rank_seqs"] == [len(slices[0]), len(slices[1])]
    assert infos[0]["rank_seqs"] == infos[1]["rank_seqs"]


def test_read_packed_slices_epoch_and_resume(spark, packed_ds):
    """epoch_seed re-permutes each rank's slice deterministically (same
    seed ⇒ identical positions, different seed ⇒ different layout, same
    row set); skip_seqs drops exactly the first N positions and keeps
    absolute epoch positions — mid-epoch resume."""
    path, _ = packed_ds

    def posmap(seed):
        df, _ = packing.read_packed_slices(
            spark, path, 2, 0, epoch_seed=seed
        )
        return {
            (r["shard"], r["seq_id"]): r["position"] for r in df.collect()
        }

    p7a, p7b, p8 = posmap(7), posmap(7), posmap(8)
    assert p7a == p7b  # reproducible across calls
    assert set(p7a) == set(p8)  # same rows...
    assert p7a != p8  # ...different epoch order
    assert sorted(p7a.values()) == list(range(len(p7a)))  # a permutation
    # resume: the tail beyond skip_seqs, absolute positions preserved
    skipped, sk_info = packing.read_packed_slices(
        spark, path, 2, 0, epoch_seed=7, skip_seqs=3
    )
    tail = {
        (r["shard"], r["seq_id"]): r["position"] for r in skipped.collect()
    }
    assert tail == {k: p for k, p in p7a.items() if p >= 3}
    # info's step-count contract (VERDICT r11 item 5): n_seqs stays the
    # WHOLE-epoch slice size under resume; n_remaining is what this
    # call returned — a resuming trainer schedules from info alone
    assert sk_info["n_seqs"] == len(p7a)
    assert sk_info["n_remaining"] == len(p7a) - 3 == len(tail)
    # resume without a shuffle rides the (shard, seq_id) order the same way
    full, _ = packing.read_packed_slices(spark, path, 2, 1)
    part, _ = packing.read_packed_slices(spark, path, 2, 1, skip_seqs=2)
    fm = {(r["shard"], r["seq_id"]): r["position"] for r in full.collect()}
    pm = {(r["shard"], r["seq_id"]): r["position"] for r in part.collect()}
    assert pm == {k: p for k, p in fm.items() if p >= 2}


def test_read_packed_slices_validation(spark, packed_ds):
    """Misconfiguration fails at load time: a starved rank (no shard
    lands on it) raises before any scan, as do out-of-range rank /
    world_size / skip_seqs."""
    path, want = packed_ds
    n_shards = len({k[0] for k in want})
    with pytest.raises(ValueError, match="starves rank"):
        packing.read_packed_slices(spark, path, n_shards + 1, 0)
    with pytest.raises(ValueError, match="rank must be"):
        packing.read_packed_slices(spark, path, 2, 2)
    with pytest.raises(ValueError, match="world_size must be"):
        packing.read_packed_slices(spark, path, 0, 0)
    with pytest.raises(ValueError, match="skip_seqs must be"):
        packing.read_packed_slices(spark, path, 2, 0, skip_seqs=-1)
    # world_size=1 degenerates to the whole dataset in writer order
    whole, info = packing.read_packed_slices(spark, path, 1, 0)
    assert whole.count() == len(want) == info["n_seqs"]

def test_write_packed_dataset_stats_fold_matches_rescan(spark, tmp_path):
    """stats='fold' (the O(batch) append-manifest update) produces
    manifests IDENTICAL to the default whole-dataset rescan when the
    prior manifests are honest — including the waste fractions, which
    are recomputed from the merged sums through the same expressions —
    and the folded manifest still satisfies the loader's validate
    gate.  Misuse raises: fold outside append, fold with no prior
    manifest, an unknown stats value."""
    from pathwaydataframework_spark.operators import bpe, packing

    v = {"a": 0, "b": 1, "ab": 2}
    df = spark.createDataFrame(
        [(d, "ab a b" if d % 2 else "a b") for d in range(40)],
        "doc_id long, text string",
    )
    enc = bpe.bpe_encode(df, v, append_eos_id=9)
    layout = packing.pack_no_straddle(enc, "doc_id", "n_tokens", 8, shards=4)
    seqs = packing.materialize_sequences(
        enc, layout, max_tokens=8, pad_id=-1
    ).localCheckpoint()
    half0 = seqs.filter(F.col("seq_id") % 2 == 0)
    half1 = seqs.filter(F.col("seq_id") % 2 == 1)
    pr, pf = str(tmp_path / "rescan"), str(tmp_path / "fold")
    assert packing.write_packed_dataset(
        half0, pr, max_tokens=8
    ) == packing.write_packed_dataset(half0, pf, max_tokens=8)
    m_rescan = packing.write_packed_dataset(
        half1, pr, max_tokens=8, mode="append"
    )
    m_fold = packing.write_packed_dataset(
        half1, pf, max_tokens=8, mode="append", stats="fold"
    )
    # provenance: the manifest records HOW its totals were produced
    assert m_rescan.pop("stats_source") == "rescan"
    assert m_fold.pop("stats_source") == "fold"
    assert m_fold == m_rescan
    # the folded manifest still matches what is actually on disk
    _, m = packing.read_packed_dataset(spark, pf, validate=True)
    assert m == {**m_fold, "stats_source": "fold"}
    # the no-cap flavor folds plain counts the same way
    nr, nf = str(tmp_path / "nocap_r"), str(tmp_path / "nocap_f")
    packing.write_packed_dataset(half0, nr)
    packing.write_packed_dataset(half0, nf)
    nm_rescan = packing.write_packed_dataset(half1, nr, mode="append")
    nm_fold = packing.write_packed_dataset(
        half1, nf, mode="append", stats="fold"
    )
    assert nm_rescan.pop("stats_source") == "rescan"
    assert nm_fold.pop("stats_source") == "fold"
    assert nm_rescan == nm_fold
    # misuse fails fast
    with pytest.raises(ValueError, match="only applies to mode='append'"):
        packing.write_packed_dataset(
            half0, str(tmp_path / "x"), max_tokens=8, stats="fold"
        )
    with pytest.raises(ValueError, match="existing _manifest"):
        packing.write_packed_dataset(
            half0, str(tmp_path / "y"), max_tokens=8, mode="append",
            stats="fold",
        )
    with pytest.raises(ValueError, match="stats must be"):
        packing.write_packed_dataset(
            half0, str(tmp_path / "z"), max_tokens=8, stats="bogus"
        )

def test_read_packed_slices_prunes_shard_partitions(spark, packed_ds):
    """The scale property the rank rule exists for: the slice filter is
    a predicate on the shard PARTITION column, so the parquet scan's
    PartitionFilters carry `shard % world == rank` — each rank lists
    and reads only its own shard directories, never the other ranks'
    files.  Guarded here so a refactor that moves the filter above a
    projection (breaking pushdown) fails loudly."""
    path, _ = packed_ds
    sl, _info = packing.read_packed_slices(spark, path, 2, 1)
    plan = sl._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)", plan)
    assert m, "no PartitionFilters in the scan node"
    assert re.search(r"shard#\d+L? % 2\) = 1", m.group(1)), m.group(1)

def test_read_packed_slices_never_touches_foreign_shards(spark, tmp_path):
    """Execution-time proof of the pruning contract: after the slice
    plan exists, DELETE every shard directory the rank does not own —
    the slice still executes (it never opens foreign files), while the
    un-sliced read fails on the missing files.  At 1000 ranks this is
    the difference between each rank reading 1/1000th of the object
    store and every rank reading all of it."""
    import glob
    import shutil as sh

    seqs = spark.range(8000).select(
        (F.col("id") % 8).alias("shard"),
        (F.col("id") / 8).cast("long").alias("seq_id"),
        F.array(F.col("id")).alias("token_ids"),
        F.lit(1).cast("long").alias("n_tokens"),
    )
    path = str(tmp_path / "prune_proof")
    packing.write_packed_dataset(seqs, path)
    sl, _ = packing.read_packed_slices(spark, path, 4, 1, validate=False)
    full, _ = packing.read_packed_dataset(spark, path, validate=False)
    for d in glob.glob(path + "/shard=*"):
        if int(d.rsplit("=", 1)[1]) % 4 != 1:
            sh.rmtree(d)
    assert sl.count() == 2000  # shards 1 and 5 = 1/4 of the rows
    with pytest.raises(Exception):
        full.count()  # the full read DOES need the deleted directories

def test_read_packed_slices_equalize(spark, packed_ds):
    """equalize=True clips every rank to min(rank_seqs) positions — the
    standard distributed-sampler remedy so fixed-step collective ops
    never desynchronize; composes with skip_seqs, and the cutoff is
    manifest arithmetic (info reflects the equalized count)."""
    path, _ = packed_ds
    rows, infos = {}, {}
    for r in range(2):
        df, info = packing.read_packed_slices(
            spark, path, 2, r, equalize=True
        )
        rows[r], infos[r] = df.collect(), info
    m = min(infos[0]["rank_seqs"])
    for r in range(2):
        assert infos[r]["n_seqs"] == m == len(rows[r])
        assert sorted(x["position"] for x in rows[r]) == list(range(m))
    # resume composes inside the equalized epoch
    part, _ = packing.read_packed_slices(
        spark, path, 2, 0, equalize=True, skip_seqs=2
    )
    assert sorted(r["position"] for r in part.collect()) == list(
        range(2, m)
    )
    # under an epoch shuffle the equalized slice is still m rows
    shuf, _ = packing.read_packed_slices(
        spark, path, 2, 0, epoch_seed=5, equalize=True
    )
    assert shuf.count() == m

def test_read_packed_slices_equalize_tail_rotates(spark, tmp_path):
    """The docstring's rotation claim, pinned (VERDICT r11 item 3): a
    different epoch_seed rotates WHICH sequences sit in equalize's
    dropped tail — two seeds keep different sets, and over a handful of
    epochs the union of kept sets covers the whole rank slice (every
    sequence still gets trained; nothing is starved forever).  md5 is
    deterministic, so the seed range here is a fixed property of the
    fixture, not a flaky sample."""
    # 3 shards / world 2 ⇒ rank 0 owns shards {0,2} (60 seqs), rank 1
    # owns {1} (30) — a 2× skew so equalize drops a REAL 30-seq tail
    seqs = spark.range(90).select(
        (F.col("id") % 3).alias("shard"),
        (F.col("id") / 3).cast("long").alias("seq_id"),
        F.array(F.col("id")).alias("token_ids"),
        F.lit(1).cast("long").alias("n_tokens"),
    )
    path = str(tmp_path / "skewed")
    packing.write_packed_dataset(seqs, path)
    all_keys = {(s, q) for s in (0, 2) for q in range(30)}
    kept = {}
    for seed in range(12):
        df, info = packing.read_packed_slices(
            spark, path, 2, 0, epoch_seed=seed, equalize=True,
            validate=False,
        )
        kept[seed] = {(r["shard"], r["seq_id"]) for r in df.collect()}
        assert len(kept[seed]) == info["n_seqs"] == 30
    # the tail ROTATES: different seeds keep different sets
    assert any(kept[0] != kept[s] for s in range(1, 12))
    # ...and over 12 epochs every sequence of the rank slice is kept at
    # least once — seed 0's dropped tail is fully covered by later seeds
    assert set().union(*kept.values()) == all_keys
    tail0 = all_keys - kept[0]
    assert len(tail0) == 30
    assert tail0 <= set().union(*(kept[s] for s in range(1, 12)))


def test_bucket_by_length_contract(spark):
    """bucket_by_length (r12): length-homogeneous fixed-shape batches —
    every row fits under its bucket's cap and exceeds the previous
    boundary; per (bucket, batch) exactly batch_size rows with dense
    slots under drop_ragged; the in-bucket order is the md5 epoch
    shuffle (same seed reproducible, different seed re-permutes WITHIN
    the same bucket membership); NULL lengths drop; misuse raises."""
    rows = [(i, int(((i * 53) % 300) + 1)) for i in range(200)]
    rows += [(900, None)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    bnds, bs = (32, 128), 8
    out = packing.bucket_by_length(
        df, "doc_id", "n", boundaries=bnds, batch_size=bs,
        drop_ragged=True, seed=1,
    ).collect()
    assert all(r["doc_id"] != 900 for r in out)  # NULL length dropped
    caps = {0: 32, 1: 128, 2: None}
    prev = {0: 0, 1: 32, 2: 128}
    shapes = {}
    for r in out:
        assert r["cap"] == caps[r["bucket"]]
        if r["cap"] is not None:
            assert r["n"] <= r["cap"]  # homogeneity: fits the pad target
        assert r["n"] > prev[r["bucket"]]
        shapes.setdefault((r["bucket"], r["batch_id"]), []).append(r["slot"])
    for slots in shapes.values():  # fixed shape: full batches, dense slots
        assert sorted(slots) == list(range(bs))
    # ragged tails dropped: kept = floor(count/bs)*bs per bucket
    from collections import Counter

    full = packing.bucket_by_length(
        df, "doc_id", "n", boundaries=bnds, batch_size=bs, seed=1
    ).collect()
    per_bucket = Counter(r["bucket"] for r in full)
    kept = Counter(r["bucket"] for r in out)
    assert all(kept[b] == per_bucket[b] // bs * bs for b in per_bucket)
    # epoch determinism: same seed identical; new seed permutes within
    # the same bucket membership
    a = {(r["doc_id"]): (r["bucket"], r["batch_id"], r["slot"]) for r in full}
    again = packing.bucket_by_length(
        df, "doc_id", "n", boundaries=bnds, batch_size=bs, seed=1
    ).collect()
    assert a == {
        r["doc_id"]: (r["bucket"], r["batch_id"], r["slot"]) for r in again
    }
    other = packing.bucket_by_length(
        df, "doc_id", "n", boundaries=bnds, batch_size=bs, seed=2
    ).collect()
    b_map = {r["doc_id"]: (r["bucket"], r["batch_id"], r["slot"]) for r in other}
    assert {k: v[0] for k, v in a.items()} == {
        k: v[0] for k, v in b_map.items()
    }
    assert a != b_map  # the shuffle actually moved something
    # misuse fails fast
    with pytest.raises(ValueError, match="strictly increasing"):
        packing.bucket_by_length(
            df, "doc_id", "n", boundaries=(64, 64), batch_size=8
        )
    with pytest.raises(ValueError, match="batch_size"):
        packing.bucket_by_length(
            df, "doc_id", "n", boundaries=(64,), batch_size=0
        )
    with pytest.raises(ValueError, match="bucket"):
        packing.bucket_by_length(
            df.withColumn("bucket", F.lit(1)), "doc_id", "n",
            boundaries=(64,), batch_size=8,
        )


def test_read_packed_slices_multi_epoch_loop(spark, packed_ds):
    """The multi-epoch claims the docstring makes, pinned (VERDICT r11
    item 4): per-epoch permutations DIFFER while each epoch's row set
    and token MULTISET are identical (nothing dropped or duplicated by
    re-seeding), and mid-epoch resume inside epoch 1 composes — the
    skipped rows are the first N of EPOCH 1's order, not epoch 0's."""
    path, _ = packed_ds

    def epoch(seed, **kw):
        df, _ = packing.read_packed_slices(
            spark, path, 2, 0, epoch_seed=seed, **kw
        )
        return {
            (r["shard"], r["seq_id"]): (r["position"], tuple(r["token_ids"]))
            for r in df.collect()
        }

    e0, e1 = epoch(0), epoch(1)
    # same slice, same payloads...
    assert set(e0) == set(e1)
    assert {k: v[1] for k, v in e0.items()} == {
        k: v[1] for k, v in e1.items()
    }
    # ...identical token MULTISET per epoch (re-seeding permutes, never
    # drops/duplicates)
    ms0 = sorted(t for _, toks in e0.values() for t in toks)
    ms1 = sorted(t for _, toks in e1.values() for t in toks)
    assert ms0 == ms1
    # ...but DIFFERENT layouts, each a full permutation
    assert {k: v[0] for k, v in e0.items()} != {
        k: v[0] for k, v in e1.items()
    }
    for e in (e0, e1):
        assert sorted(p for p, _ in e.values()) == list(range(len(e)))
    # mid-epoch resume composes inside epoch 1: exactly epoch 1's tail
    resumed = epoch(1, skip_seqs=4)
    assert resumed == {k: v for k, v in e1.items() if v[0] >= 4}
    # and it is NOT epoch 0's tail (the orders genuinely differ)
    assert set(resumed) != {k for k, v in e0.items() if v[0] >= 4}


def test_read_packed_epochs_matches_per_rank_union(spark, packed_ds):
    """The r15 batched loader is ROW-IDENTICAL to unioning
    read_packed_slices per rank (× per epoch) — the bit-identity oracle
    for the one-plan rewrite of the q_pack_slices/q_train_epochs union
    (OPTIMIZATION_r15): writer order, seeded single pass, and the
    multi-epoch equalize+resume composition all pinned, including the
    position values and tag columns."""
    path, _ = packed_ds

    def union_rows(world, *, epochs=None, epoch_seed=None, skip=None,
                   equalize=False):
        skip = skip or {}
        passes = [(None, epoch_seed)] if epochs is None else [
            (e, e) for e in epochs
        ]
        rows = []
        for tag, seed in passes:
            for r in range(world):
                key = r if epochs is None else (tag, r)
                df, _ = packing.read_packed_slices(
                    spark, path, world, r, epoch_seed=seed,
                    skip_seqs=skip.get(key, 0), equalize=equalize,
                )
                for row in df.collect():
                    d = row.asDict()
                    d["token_ids"] = tuple(d["token_ids"])
                    d["doc_spans"] = tuple(map(tuple, d["doc_spans"]))
                    if epochs is not None:
                        d["epoch"] = tag
                    d["rank"] = r
                    rows.append(tuple(sorted(d.items())))
        return sorted(rows)

    def batched_rows(world, **kw):
        df, info = packing.read_packed_epochs(spark, path, world, **kw)
        rows = []
        for row in df.collect():
            d = row.asDict()
            d["token_ids"] = tuple(d["token_ids"])
            d["doc_spans"] = tuple(map(tuple, d["doc_spans"]))
            rows.append(tuple(sorted(d.items())))
        return sorted(rows)

    # writer order + skip on one rank
    assert batched_rows(2, skip_seqs={1: 2}) == union_rows(
        2, skip={1: 2}
    )
    # one seeded pass
    assert batched_rows(2, epoch_seed=7) == union_rows(2, epoch_seed=7)
    # the q_train_epochs composition: epochs × equalize × mid-epoch resume
    assert batched_rows(
        2, epochs=(0, 1), skip_seqs={(1, 0): 3}, equalize=True
    ) == union_rows(2, epochs=(0, 1), skip={(1, 0): 3}, equalize=True)
    # tag columns are appended typed long, after position
    df, info = packing.read_packed_epochs(spark, path, 2, epochs=(0, 1))
    assert df.columns[-3:] == ["position", "epoch", "rank"]
    assert dict(df.dtypes)["epoch"] == "bigint"
    assert dict(df.dtypes)["rank"] == "bigint"
    assert info["rank_seqs"] == packing.read_packed_slices(
        spark, path, 2, 0
    )[1]["rank_seqs"]
    # epochs and epoch_seed are mutually exclusive (each epoch IS a seed)
    with pytest.raises(ValueError, match="not both"):
        packing.read_packed_epochs(spark, path, 2, epochs=(0,), epoch_seed=1)
    with pytest.raises(ValueError, match="skip_seqs"):
        packing.read_packed_epochs(spark, path, 2, skip_seqs={0: -1})


def test_read_packed_epochs_validation_and_tag_collisions(spark, tmp_path):
    """The batched loader keeps the per-rank gates: validate compares
    EVERY rank's on-disk totals against the manifest in one aggregate
    (and names the first mismatching rank); a dataset whose own columns
    include 'rank'/'epoch' is rejected up front."""
    import glob
    import os

    seqs = spark.range(12).select(
        (F.col("id") % 2).alias("shard"),
        F.col("id").alias("seq_id"),
        F.lit(1).cast("long").alias("n_tokens"),
    )
    path = str(tmp_path / "epochs_val")
    packing.write_packed_dataset(seqs, path)
    df, _ = packing.read_packed_epochs(spark, path, 2)
    assert df.count() == 12
    # corrupt one shard → validate must name that rank
    victim = glob.glob(os.path.join(path, "shard=1", "*.parquet"))[0]
    os.unlink(victim)
    crc = os.path.join(
        os.path.dirname(victim), "." + os.path.basename(victim) + ".crc"
    )
    if os.path.exists(crc):
        os.unlink(crc)
    with pytest.raises(ValueError, match="rank 1's slice"):
        packing.read_packed_epochs(spark, path, 2)
    # validate=False trusts the dataset, like the per-rank API
    df, _ = packing.read_packed_epochs(spark, path, 2, validate=False)
    assert df.filter(F.col("rank") == 0).count() == 6
    # tag-name collision rejected before any scan
    clash = spark.range(4).select(
        (F.col("id") % 2).alias("shard"),
        F.col("id").alias("seq_id"),
        F.lit(1).cast("long").alias("n_tokens"),
        F.lit(0).alias("rank"),
    )
    cpath = str(tmp_path / "epochs_clash")
    packing.write_packed_dataset(clash, cpath)
    with pytest.raises(ValueError, match="tag columns"):
        packing.read_packed_epochs(spark, cpath, 2)


def test_read_packed_slices_rejects_reserved_columns(spark, tmp_path):
    """A dataset whose OWN schema contains 'position' (or the loader's
    internal names) is rejected up front — read_packed_slices adds a
    'position' column and must never silently overwrite the caller's
    data (ADVICE r11) — while read_packed_dataset, which adds nothing,
    still reads it fine."""
    seqs = spark.range(20).select(
        (F.col("id") % 2).alias("shard"),
        F.col("id").alias("seq_id"),
        F.lit(1).cast("long").alias("n_tokens"),
        (F.col("id") * 10).alias("position"),
    )
    path = str(tmp_path / "reserved")
    packing.write_packed_dataset(seqs, path)
    with pytest.raises(ValueError, match="reserved"):
        packing.read_packed_slices(spark, path, 2, 0)
    df, _ = packing.read_packed_dataset(spark, path)
    assert df.count() == 20
    assert [r["position"] for r in df.orderBy("seq_id").collect()] == [
        i * 10 for i in range(20)
    ]


def test_write_packed_dataset_fold_materializes_input_once(spark, tmp_path):
    """stats='fold' reads the batch twice (write + O(batch) stats
    aggregate) but must compute its LINEAGE exactly once — otherwise a
    non-deterministic input would write one row set and fold the stats
    of another (ADVICE r11).  Pinned with an accumulator-counting UDF
    feeding n_tokens (a column the stats aggregate consumes, so column
    pruning cannot elide the second evaluation): the count equals the
    batch size, not 2×."""
    acc = spark.sparkContext.accumulator(0)

    def _counted(x):
        acc.add(1)
        return x

    counted = F.udf(_counted, "long")
    base = spark.range(16).select(
        (F.col("id") % 4).alias("shard"),
        F.col("id").alias("seq_id"),
        F.array(F.col("id")).alias("token_ids"),
        F.lit(1).cast("long").alias("n_tokens"),
    )
    path = str(tmp_path / "fold_once")
    packing.write_packed_dataset(base, path)
    batch = spark.range(100, 116).select(
        (F.col("id") % 4).alias("shard"),
        F.col("id").alias("seq_id"),
        F.array(F.col("id")).alias("token_ids"),
        counted(F.lit(1).cast("long")).alias("n_tokens"),
    )
    m = packing.write_packed_dataset(
        batch, path, mode="append", stats="fold"
    )
    assert acc.value == 16  # one evaluation per row, not one per read
    assert m["n_seqs"] == 32 and m["stats_source"] == "fold"
    # and the folded manifest matches what actually landed on disk
    packing.read_packed_dataset(spark, path, validate=True)


def test_read_packed_slices_validation_is_rank_scoped(spark, tmp_path):
    """The validate gate scans only the rank's OWN shard directories
    (the same pruning as the data read — a 1000-rank job start must not
    pay 1000 whole-dataset scans): corrupting one rank's shard fails
    THAT rank's validation with a rank-scoped message, while the other
    rank still validates green; the starved-rank check needs only the
    manifest, so it fires even with every data file gone."""
    import glob
    import os

    seqs = spark.range(4000).select(
        (F.col("id") % 4).alias("shard"),
        (F.col("id") / 4).cast("long").alias("seq_id"),
        F.array(F.col("id")).alias("token_ids"),
        F.lit(1).cast("long").alias("n_tokens"),
    )
    path = str(tmp_path / "rank_scoped")
    packing.write_packed_dataset(seqs, path)
    # corrupt a shard rank 1 owns (shard=1): drop one parquet file
    (victim,) = glob.glob(path + "/shard=1")
    part = glob.glob(victim + "/*.parquet")[0]
    os.remove(part)
    with pytest.raises(ValueError, match="rank 1's slice"):
        packing.read_packed_slices(spark, path, 2, 1)[0]
    # rank 0 (shards 0 and 2) is untouched and validates green
    df, info = packing.read_packed_slices(spark, path, 2, 0)
    assert df.count() == info["n_seqs"] == 2000
    # the starved check is manifest arithmetic — no scan, so it fires
    # even after all data files are gone
    for d in glob.glob(path + "/shard=*"):
        import shutil as sh

        sh.rmtree(d)
    with pytest.raises(ValueError, match="starves rank"):
        packing.read_packed_slices(spark, path, 5, 0)


def test_bucket_by_length_rejects_internal_working_columns(spark):
    """ADVICE r12: the reserved-name guard also covers the INTERNAL
    working columns (__ord, and _sharded_running_total's
    __h/__shard/__w/__n/__off/__total) — an input carrying one of them
    would be silently clobbered mid-plan, the exact hazard the output
    guard exists for."""
    base = spark.createDataFrame(
        [(1, 10), (2, 20)], "doc_id long, n long"
    )
    for col in ("__ord", "__h", "__shard", "__w", "__n", "__off", "__total"):
        with pytest.raises(ValueError, match="must not overwrite"):
            packing.bucket_by_length(
                base.withColumn(col, F.lit(1)), "doc_id", "n",
                boundaries=(64,), batch_size=2,
            )


def test_suggest_boundaries_percentile_disc_exact(spark):
    """suggest_boundaries (r14, VERDICT r13 item 3): boundary k of n is
    the smallest length whose cumulative count reaches k/n of the
    total — percentile_disc with EXACT integer arithmetic (cum*n >=
    k*total), verified on a hand-computed point-mass fixture; the
    values helper collapses duplicate quantiles to a strictly
    increasing list bucket_by_length accepts."""
    tiny = spark.createDataFrame(
        [(i, v) for i, v in enumerate([1, 2, 2, 2, 10])],
        "doc_id long, n long",
    )
    got = {
        r["quantile"]: r["boundary"]
        for r in packing.suggest_boundaries(tiny, "n", 4).collect()
    }
    # N=5: cum(1)=1, cum(2)=4, cum(10)=5.  k=1: 4*cum >= 5 → 2;
    # k=2: >= 10 → 2; k=3: >= 15 → 2; k=4: >= 20 → 10 (the exact max)
    assert got == {1: 2, 2: 2, 3: 2, 4: 10}
    assert packing.suggest_boundaries_values(tiny, "n", 4) == [2, 10]
    # NULL lengths are excluded, matching bucket_by_length
    with_null = tiny.union(
        spark.createDataFrame([(99, None)], "doc_id long, n long")
    )
    assert packing.suggest_boundaries_values(with_null, "n", 4) == [2, 10]
    with pytest.raises(ValueError, match="n_buckets"):
        packing.suggest_boundaries(tiny, "n", 0)


def test_suggest_boundaries_reduces_pad_waste(spark):
    """The pad-waste pin (VERDICT r13 item 3 'Done' clause): on a
    skewed (long-tailed) length distribution, quantile-driven
    boundaries measurably beat equal-width ones on the cap-bound waste
    sum((cap - length)) that bucket_by_length documents — equal-width
    splits park the bulk of the mass under a far-away cap; quantiles
    put the boundaries where the mass is.  The suggested boundaries
    also cover the exact max (no open bucket — every row keeps a
    non-NULL pad target, the compiled-kernel configuration)."""
    rows = (
        [(i, 5 + (i % 26)) for i in range(500)]            # bulk 5..30
        + [(i, 40 + (i % 60)) for i in range(500, 580)]    # mid 40..99
        + [(i, 200 + (i % 7) * 400) for i in range(580, 600)]  # tail
    )
    df = spark.createDataFrame(rows, "doc_id long, n long")
    n_b = 4
    sug = packing.suggest_boundaries_values(df, "n", n_b)
    mx = df.agg(F.max("n")).collect()[0][0]
    mn = df.agg(F.min("n")).collect()[0][0]
    assert sug[-1] == mx  # covers the distribution: no open bucket

    def waste(bnds):
        b = packing.bucket_by_length(
            df, "doc_id", "n", boundaries=bnds, batch_size=8, seed=0
        )
        return b.agg(F.sum(F.col("cap") - F.col("n"))).collect()[0][0]

    eq = sorted({mn + (mx - mn) * k // n_b for k in range(1, n_b + 1)})
    assert waste(sug) < waste(eq)


def test_materialize_padded_batches_contract(spark):
    """materialize_padded_batches (r13): the SFT analogue of
    materialize_sequences — every batch's rows share a bucket and ONE
    pad target (the bucket boundary for bounded buckets; the batch max
    for the open bucket); input_ids round-trip the original tokens
    then pad_id; attention/loss masks carry the trainer's conventions
    (attention sum = n_tokens, loss zero over prompt + padding);
    drop_ragged keeps only full fixed-shape batches; open_bucket='drop'
    removes the open bucket BEFORE numbering (no batch gaps) and the
    padding stage is then window-free; NULL tokens drop; misuse raises."""
    rows = [
        (i, list(range(10 * i, 10 * i + (i * 7) % 30 + 1)),
         ((i * 7) % 30 + 1) // 3)
        for i in range(80)
    ] + [(900, None, 0)]
    df = spark.createDataFrame(
        rows, "doc_id long, toks array<bigint>, plen long"
    )
    bnds, bs = (8, 16), 4
    out = packing.materialize_padded_batches(
        df, "doc_id", "toks", boundaries=bnds, batch_size=bs, seed=3,
        pad_id=-1, prompt_len_col="plen",
    ).collect()
    toks = {r[0]: r[1] for r in rows}
    plen = {r[0]: r[2] for r in rows}
    assert all(r["doc_id"] != 900 for r in out)
    batches = {}
    for r in out:
        n = len(toks[r["doc_id"]])
        assert r["pad_len"] >= n
        if r["cap"] is not None:
            assert r["pad_len"] == r["cap"]  # bounded: static per bucket
        assert list(r["input_ids"]) == toks[r["doc_id"]] + [-1] * (
            r["pad_len"] - n
        )
        assert list(r["attention_mask"]) == [1] * n + [0] * (r["pad_len"] - n)
        p = min(plen[r["doc_id"]], n)
        assert list(r["loss_mask"]) == [0] * p + [1] * (n - p) + [0] * (
            r["pad_len"] - n
        )
        batches.setdefault((r["bucket"], r["batch_id"]), []).append(r)
    for rs in batches.values():
        # every batch: full, dense slots, ONE shared pad target
        assert sorted(r["slot"] for r in rs) == list(range(bs))
        assert len({r["pad_len"] for r in rs}) == 1
        if rs[0]["cap"] is None:  # open bucket: pad = batch max length
            assert rs[0]["pad_len"] == max(len(toks[r["doc_id"]]) for r in rs)
    # drop policy: open bucket gone, batches still dense from 0
    drop = packing.materialize_padded_batches(
        df, "doc_id", "toks", boundaries=bnds, batch_size=bs, seed=3,
        open_bucket="drop",
    ).collect()
    assert {r["bucket"] for r in drop} <= {0, 1}
    for b in {r["bucket"] for r in drop}:
        ids = [r["batch_id"] for r in drop if r["bucket"] == b]
        # dense batch ids from 0 — dropping the open bucket BEFORE
        # numbering leaves no gaps
        assert sorted(set(ids)) == list(range(max(ids) + 1))
    assert "loss_mask" not in drop[0].asDict()  # only with prompt_len_col
    with pytest.raises(ValueError, match="open_bucket"):
        packing.materialize_padded_batches(
            df, "doc_id", "toks", boundaries=bnds, batch_size=bs,
            open_bucket="nope",
        )
    with pytest.raises(ValueError, match="array column"):
        packing.materialize_padded_batches(
            df, "doc_id", "plen", boundaries=bnds, batch_size=bs
        )
    # ADVICE r13: nested element types get the function's OWN error
    # (naming the supported scalars), not an opaque plan-time cast
    with pytest.raises(ValueError, match="scalar numeric"):
        packing.materialize_padded_batches(
            df.withColumn("nested", F.array(F.col("toks"))),
            "doc_id", "nested", boundaries=bnds, batch_size=bs,
        )
    with pytest.raises(ValueError, match="must not overwrite"):
        packing.materialize_padded_batches(
            df.withColumn("pad_len", F.lit(1)), "doc_id", "toks",
            boundaries=bnds, batch_size=bs,
        )


def test_bucket_by_length_incremental_seal_and_parquet_resume(spark, tmp_path):
    """bucket_by_length_incremental (r13): the streaming numbering
    contract — per bucket, a micro-batch's rows are numbered
    n_so_far + md5-rank-within-batch, so sealed batches never renumber
    and appends only FILL the one open batch; the 3-batch chain equals
    the composite-order (arrival, then md5-within-batch) one-shot
    replay; and a parquet round-trip of the (bucket, n_so_far) state
    between batches changes nothing (the crawl/recipe-chain resume
    pattern)."""
    import hashlib

    bnds, bs, seed = (16, 64), 4, 3
    rows = [(i, (i * 13) % 100 + 1) for i in range(90)]
    arrivals = [rows[:30], rows[30:55], rows[55:]]

    def bucket_of(n):
        return (n > 16) + (n > 64)

    # composite-order one-shot replay, pure Python
    expected = {}
    counts = {}
    for chunk in arrivals:
        per = {}
        for i, n in chunk:
            per.setdefault(bucket_of(n), []).append((i, n))
        for b, items in per.items():
            items.sort(
                key=lambda t: (
                    hashlib.md5(f"{t[0]}:{seed}".encode()).hexdigest(), t[0]
                )
            )
            for r, (i, n) in enumerate(items):
                ord_ = counts.get(b, 0) + r
                expected[i] = (b, ord_ // bs, ord_ % bs)
            counts[b] = counts.get(b, 0) + len(items)

    st = packing.bucket_state(spark)
    got = {}
    batch1_snapshot = None
    for k, chunk in enumerate(arrivals):
        df = spark.createDataFrame(chunk, "doc_id long, n long")
        out, st = packing.bucket_by_length_incremental(
            df, st, "doc_id", "n", boundaries=bnds, batch_size=bs,
            seed=seed,
        )
        out = out.localCheckpoint()
        for r in out.collect():
            got[r["doc_id"]] = (r["bucket"], r["batch_id"], r["slot"])
        if k == 0:
            batch1_snapshot = dict(got)
        # parquet round-trip the state between every pair of batches
        p = str(tmp_path / f"state_{k}")
        st.write.mode("overwrite").parquet(p)
        st = spark.read.parquet(p)
    assert got == expected
    # seal stability: batch-1 rows kept their exact coordinates
    assert all(got[i] == v for i, v in batch1_snapshot.items())
    # append-only fill: each later batch's per-bucket ordinals start
    # exactly where the previous left off (no gaps, no renumbering)
    for b, total in counts.items():
        ords = sorted(
            bid * bs + s for (bb, bid, s) in got.values() if bb == b
        )
        assert ords == list(range(total))


def test_materialize_padded_batches_incremental_stable_tensors(spark):
    """materialize_padded_batches_incremental (r13): bounded-bucket
    streaming padding — over-boundary rows drop up front, pad_len is
    always the bucket cap (so every emitted tensor is FINAL: re-running
    the chain with more appended batches reproduces earlier batches'
    rows bit-identically), masks follow the SFT conventions, and the
    numbering equals bucket_by_length_incremental of the same arrival
    sequence."""
    rows = [
        (i, list(range(i, i + (i * 11) % 24 + 1)), ((i * 11) % 24) // 2)
        for i in range(50)
    ]
    arrivals = [rows[:20], rows[20:35], rows[35:]]
    toks = {r[0]: r[1] for r in rows}
    plen = {r[0]: r[2] for r in rows}
    bnds, bs = (6, 16), 4

    def run(chunks):
        st = packing.bucket_state(spark)
        acc = {}
        for chunk in chunks:
            df = spark.createDataFrame(
                chunk, "doc_id long, toks array<bigint>, plen long"
            )
            out, st = packing.materialize_padded_batches_incremental(
                df, st, "doc_id", "toks", boundaries=bnds, batch_size=bs,
                seed=9, pad_id=-7, prompt_len_col="plen",
            )
            out = out.localCheckpoint()
            st = st.localCheckpoint()
            for r in out.collect():
                acc[r["doc_id"]] = (
                    r["bucket"], r["batch_id"], r["slot"], r["pad_len"],
                    list(r["input_ids"]), list(r["attention_mask"]),
                    list(r["loss_mask"]),
                )
        return acc

    full = run(arrivals)
    prefix = run(arrivals[:1])
    # seal-once tensors: batch 1's rows identical with or without appends
    assert all(full[i] == v for i, v in prefix.items())
    for i, (b, bid, slot, pad, ids, attn, loss) in full.items():
        n = len(toks[i])
        assert n <= bnds[-1]  # over-boundary rows never emitted
        assert pad == bnds[b]  # always the cap — no batch-max anywhere
        assert ids == toks[i] + [-7] * (pad - n)
        assert attn == [1] * n + [0] * (pad - n)
        p = min(plen[i], n)
        assert loss == [0] * p + [1] * (n - p) + [0] * (pad - n)
    dropped = [i for i, t in toks.items() if len(t) > bnds[-1]]
    assert dropped and all(i not in full for i in dropped)
    # numbering == the bucketing chain over the same (filtered) arrivals
    st = packing.bucket_state(spark)
    want = {}
    for chunk in arrivals:
        df = spark.createDataFrame(
            [(i, len(t)) for i, t, _ in chunk if len(t) <= bnds[-1]],
            "doc_id long, n long",
        )
        out, st = packing.bucket_by_length_incremental(
            df, st, "doc_id", "n", boundaries=bnds, batch_size=bs, seed=9
        )
        out = out.localCheckpoint()
        st = st.localCheckpoint()
        for r in out.collect():
            want[r["doc_id"]] = (r["bucket"], r["batch_id"], r["slot"])
    assert {i: v[:3] for i, v in full.items()} == want


def test_chunked_prefill_schedule_contract(spark):
    """chunked_prefill_schedule (r14, VERDICT r13 item 8): the
    continuous-batching batch shape — per request, chunks are
    contiguous (chunk_off is the running sum, steps consecutive) and
    sum to the request length; per (shard, step), every non-final step
    carries EXACTLY the token budget (pad-free) and no step exceeds
    it; zero-length requests are admitted with one zero-length chunk;
    oversize requests span at least ceil(len/budget) steps; misuse
    fails fast."""
    import collections

    rows = [(i, (i * 7) % 50) for i in range(40)] + [(100, 0), (101, 130)]
    df = spark.createDataFrame(rows, "req_id long, n_tok long")
    B = 32
    out = packing.chunked_prefill_schedule(
        df, "req_id", "n_tok", token_budget=B, shards=4, seed=0
    ).localCheckpoint()
    rs = out.collect()
    lens = dict(rows)
    per_req: dict = collections.defaultdict(list)
    for r in rs:
        per_req[r["req_id"]].append(r)
    assert set(per_req) == set(lens)  # every request admitted
    for rid, chunks in per_req.items():
        chunks.sort(key=lambda r: r["step_id"])
        assert sum(c["chunk_len"] for c in chunks) == lens[rid]
        off = 0
        for c in chunks:
            assert c["chunk_off"] == off
            off += c["chunk_len"]
        steps = [c["step_id"] for c in chunks]
        assert steps == list(range(steps[0], steps[0] + len(steps)))
    assert len(per_req[100]) == 1 and per_req[100][0]["chunk_len"] == 0
    assert len(per_req[101]) >= (130 + B - 1) // B
    tot: dict = collections.defaultdict(int)
    mx: dict = {}
    for r in rs:
        tot[(r["shard"], r["step_id"])] += r["chunk_len"]
        mx[r["shard"]] = max(mx.get(r["shard"], -1), r["step_id"])
    for (sh, st), t in tot.items():
        if st < mx[sh]:
            assert t == B  # pad-free: full budget on every closed step
        else:
            assert 0 <= t <= B
    # determinism
    again = sorted(
        tuple(r) for r in packing.chunked_prefill_schedule(
            df, "req_id", "n_tok", token_budget=B, shards=4, seed=0
        ).collect()
    )
    assert again == sorted(tuple(r) for r in rs)
    with pytest.raises(ValueError, match="token_budget"):
        packing.chunked_prefill_schedule(
            df, "req_id", "n_tok", token_budget=0
        )
    with pytest.raises(ValueError, match="must not overwrite"):
        packing.chunked_prefill_schedule(
            df.withColumn("step_id", F.lit(1)), "req_id", "n_tok",
            token_budget=B,
        )

"""Dedup / text / similarity operators: semantics + approximate-op recall
against exact ground truth on the sf0.001 fixtures."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import pathwaydataframework_spark as pw
from pathwaydataframework_spark.data import load_df
from pathwaydataframework_spark.operators import dedup, similarity, text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_df(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_df(spark, sf_dir, "embeddings").cache()


def test_exact_dedup_keeps_one_per_key(spark):
    t = pw.Table.from_rows(
        spark,
        [(1, "same"), (2, "same"), (3, "other")],
        "id long, txt string",
    )
    out = dedup.exact_dedup(t, pw.this.txt, keep_order_by=pw.this.id)
    assert sorted(r["id"] for r in out.df.collect()) == [1, 3]


def test_minhash_recall_vs_exact(docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.8
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_hashes=16, bands=4, threshold=0.8
        ).collect()
    }
    assert exact, "fixtures should contain planted near-duplicates"
    assert lsh == exact  # at jaccard≈0.99 the banding miss prob is ~3e-6


def test_simhash_finds_planted_dups(docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.8
        ).collect()
    }
    sim = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_near_dups(
            docs, "doc_id", "text", bits=32, max_hamming=6
        ).collect()
    }
    # simhash is a different similarity; require it to recover most planted dups
    assert len(exact & sim) >= int(0.8 * len(exact))


def test_knn_lsh_recall_vs_bruteforce(emb):
    queries = emb.filter(F.col("vec_id") < 10)
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_bruteforce(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_lsh(emb, queries, dim=64, k=5, bits=16, bands=8).collect()
    }
    recall = len(bf & approx) / len(bf)
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_knn_bruteforce_self_top1(emb):
    queries = emb.filter(F.col("vec_id") < 5)
    out = similarity.knn_bruteforce(emb, queries, k=1, exclude_self=False)
    top1 = {r["query_id"]: r["neighbor_id"] for r in out.collect()}
    assert all(q == n for q, n in top1.items())  # self-similarity = 1.0


def test_embedding_lsh_dedup_pairs(emb):
    exact = {
        (r["id_a"], r["id_b"])
        for r in emb.alias("a")
        .join(emb.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn(
            "cos",
            similarity.cosine_similarity(
                F.col("a.embedding").cast("array<double>"),
                F.col("b.embedding").cast("array<double>"),
            ),
        )
        .filter(F.col("cos") >= 0.9)
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_cosine_dedup_pairs(
            emb, dim=64, threshold=0.9, bits=16, bands=8
        ).collect()
    }
    if exact:
        recall = len(exact & lsh) / len(exact)
        assert recall >= 0.8, f"embedding LSH recall {recall}"
    assert lsh <= exact or not exact  # verification removes false positives


def test_text_stats_values(spark):
    t = spark.createDataFrame([("the quick brown fox",), ("",)], "text string")
    out = t.select(
        text.token_count(F.col("text")).alias("tc"),
        text.char_count(F.col("text")).alias("cc"),
        text.stopword_ratio(F.col("text")).alias("sw"),
        text.mean_word_length(F.col("text")).alias("mwl"),
    ).collect()
    assert (out[0]["tc"], out[0]["cc"]) == (4, 19)
    assert out[0]["sw"] == 0.25
    assert out[0]["mwl"] == 4.0
    assert out[1]["tc"] == 0


def test_fingerprint_normalizes_whitespace(spark):
    t = spark.createDataFrame(
        [("Hello  World",), ("hello world",)], "text string"
    )
    fps = [r[0] for r in t.select(text.fingerprint(F.col("text"))).collect()]
    assert fps[0] == fps[1]


def test_lang_id_deterministic(spark):
    t = spark.createDataFrame(
        [("the cat and the dog",), ("der hund ist nicht da",), ("xyzzy qwerty",)],
        "text string",
    )
    got = [r[0] for r in t.select(text.lang_id(F.col("text"))).collect()]
    assert got == ["en", "de", "und"]


def test_split_embed_index_retrieve_pipeline(spark):
    """End-to-end LLM-data-pipeline plumbing (COVERAGE.md §2.10 claim made
    executable): chunk documents (TokenCountSplitter analogue) → embed each
    chunk (deterministic hashing embedder, pure column expr) → brute-force
    cosine retrieve.  The whole pipeline is JVM-side: no UDF, no collect."""
    from pathwaydataframework_spark.operators import embedders, similarity, splitters

    docs = spark.createDataFrame(
        [
            (1, "spark runs distributed queries " * 8),
            (2, "cats purr on warm windowsills " * 8),
            (3, "bread needs flour water salt yeast " * 8),
        ],
        "doc_id long, text string",
    )
    chunks = splitters.token_count_split(
        docs, "doc_id", "text", min_tokens=4, max_tokens=16
    )
    assert chunks.count() > 3  # 40-token docs actually split
    corpus = chunks.select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("vec_id"),
        F.col("doc_id"),
        embedders.hashing_embedding(F.col("chunk"), dim=32).alias("embedding"),
    )
    query = spark.createDataFrame(
        [(0, "distributed spark queries")], "vec_id long, q string"
    ).select("vec_id", embedders.hashing_embedding(F.col("q"), dim=32).alias("embedding"))
    hits = similarity.knn_bruteforce(
        corpus.drop("doc_id"), query, k=2, exclude_self=False
    )
    top_docs = {r["neighbor_id"] // 1000 for r in hits.collect()}
    assert top_docs == {1}  # both top-2 hits are chunks of the spark doc


def test_signature_collapse_bounds_hot_band(spark):
    # a degenerate-hot band (k byte-identical docs sharing every band) must
    # cost O(k) membership rows, NOT O(k^2) join rows inside the band: the
    # band self-join may only ever see ONE representative per distinct
    # signature (VERDICT r3 "residual scale hazard")
    import itertools

    k = 1000
    rows = [(i, "the same identical document text repeated") for i in range(k)]
    rows += [(k, "a completely different document about spark"),
             (k + 1, "yet another unrelated text on dataframes")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    seen_rep_counts = []

    def _instrumented(reps):
        seen_rep_counts.append(reps.count())
        a, b = reps.alias("a"), reps.alias("b")
        # trivially pair all reps (superset of any banding) — the point of
        # this test is the REP COUNT the self-join would see
        return (
            a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("rep_a"), F.col("b.doc_id").alias("rep_b"))
        )

    sigs = df.select("doc_id", F.md5("text").alias("sig"))
    out = dedup.collapse_pairs_by_signature(sigs, "doc_id", "sig", _instrumented)
    # 3 distinct signatures -> the pairing stage sees 3 rows, not 1002
    assert seen_rep_counts == [3]
    # expansion restores the full contract: C(1000,2) intra pairs + the
    # 2*1000 + 1 cross pairs from the all-pairs rep function
    assert out.count() == k * (k - 1) // 2 + 2 * k + 1


def test_minhash_collapse_exactness_with_identical_docs(spark):
    # end-to-end parity: identical docs + genuine near-dups through the
    # collapsed minhash path must equal the expected pair set
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base) for i in range(50)]            # 50 identical
    rows.append((50, base + " lambda"))              # near-dup of the group
    rows.append((51, "completely different text about nothing relevant"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            df, "doc_id", "text", n=3, num_hashes=16, bands=8, threshold=0.5
        ).collect()
    }
    intra = {(a, b) for a in range(50) for b in range(a + 1, 50)}
    assert intra <= pairs                      # all identical pairs present
    assert (0, 50) in pairs                    # near-dup found across groups
    assert not any(51 in p for p in pairs)     # unrelated doc untouched


def test_minhash_rowform_signatures_equal_agg_form(docs):
    """r14 pin: the per-row running-min signature fold (zero exchanges)
    must equal the r5 explode -> k min-agg formulation BIT FOR BIT —
    same doc set (shingle-less docs dropped), same hash values (int-cast
    seeds == the old integer literals) — so persisted band indexes
    written by either version keep matching."""
    n, k = 3, 16
    sh = dedup.shingle_docs(docs, "doc_id", "text", n)
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(k)
    ]
    old = {
        r["doc_id"]: tuple(r[f"h{i}"] for i in range(k))
        for r in sh.groupBy("doc_id").agg(*aggs).collect()
    }
    new = {
        r["doc_id"]: tuple(r[f"h{i}"] for i in range(k))
        for r in dedup.minhash_signatures(
            docs, "doc_id", "text", n=n, num_hashes=k
        ).collect()
    }
    assert old == new


def test_simhash_rowform_signatures_equal_agg_form(spark, docs):
    """r14 pin: the per-row SimHash fold must equal the explode ->
    conditional-sums formulation bit for bit, including the sign-bit
    (bit 63) mask and NULL-text drop semantics."""
    bits = 64
    with_null = docs.select("doc_id", "text").unionByName(
        spark.createDataFrame(
            [(999_999_001, None), (999_999_002, ""), (999_999_003, "  ")],
            "doc_id long, text string",
        )
    )
    toks = dedup._ensure_parallelism(with_null).select(
        F.col("doc_id"),
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    aggs = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    sums = toks.groupBy("doc_id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    old = {
        r["doc_id"]: r["s"]
        for r in sums.select("doc_id", sig.alias("s")).collect()
    }
    new = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_signatures(
            with_null, "doc_id", "text", bits=bits
        ).collect()
    }
    assert old == new


def test_bpe_assembly_empty_and_null_docs_survive(spark):
    """r14 pin: the occurrence-only assembly (no join back to the id
    list) must keep empty, whitespace-only and NULL-text docs — with
    and without EOS — and the word table must never contain the empty
    word."""
    from pathwaydataframework_spark.operators import bpe

    df = spark.createDataFrame(
        [(1, "ab ab"), (2, ""), (3, None), (4, "   "), (5, "zz")],
        "doc_id long, text string",
    )
    vocab = {"a": 0, "b": 1, "ab": 2}
    out = {
        r["doc_id"]: (list(r["token_ids"]), r["n_tokens"])
        for r in bpe.bpe_encode(df, vocab, mode="longest").collect()
    }
    assert out == {
        1: ([2, 2], 2),
        2: ([], 0),
        3: ([], 0),
        4: ([], 0),
        5: ([-1, -1], 2),  # unknown chars -> unk_id each, never dropped
    }
    out_eos = {
        r["doc_id"]: list(r["token_ids"])
        for r in bpe.bpe_encode(df, vocab, mode="longest", append_eos_id=9).collect()
    }
    assert out_eos[2] == [9] and out_eos[3] == [9] and out_eos[4] == [9]
    # incremental path: word table stays free of the empty word
    tbl = bpe.bpe_word_table(spark)
    _, updated = bpe.bpe_encode_incremental(df, tbl, vocab)
    words = [r["word"] for r in updated.collect()]
    assert "" not in words and None not in words


def test_assembly_duplicate_ids_collapse_to_one_row(spark):
    """r15 pin (VERDICT r14 item 9): the occurrence-only assembly is
    groupBy-terminal, so a DUPLICATED doc id yields ONE output row with
    the duplicates' occurrences interleaved in position order — the
    pre-r14 ids-join form emitted one row per duplicate input row.
    Unreachable under the documented id-is-a-key contract (every caller
    feeds unique ids); this pins the chosen behavior at the undocumented
    boundary so a future rewrite changes it knowingly."""
    from pathwaydataframework_spark.operators import bpe
    from pathwaydataframework_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(1, "ab"), (1, "a b"), (2, "b")], "doc_id long, text string"
    )
    vocab = {"a": 0, "b": 1, "ab": 2}
    enc = bpe.bpe_encode(df, vocab, mode="longest").collect()
    assert sorted(r["doc_id"] for r in enc) == [1, 2]
    by_id = {r["doc_id"]: sorted(r["token_ids"]) for r in enc}
    # doc 1's two rows interleave at equal positions: multiset of both
    assert by_id[1] == [0, 1, 2] and by_id[2] == [1]
    vtab = spark.createDataFrame(
        [("a", 0), ("b", 1), ("ab", 2)], "term string, rank long"
    )
    tok = text_ops.tokenize_to_ids(df, vtab).collect()
    assert sorted(r["doc_id"] for r in tok) == [1, 2]

"""Decontamination + Gopher quality/repetition + unigram-LM operators
(operators/decontam.py, operators/text.py additions) on planted fixtures
with hand-computed expected values."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from pathwaydataframework_spark.operators import decontam, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BENCH_SENT = "the quick brown fox jumps over the lazy dog near the old stone bridge today"


class TestDecontam:
    def test_planted_overlap_flagged(self, spark):
        bench = _docs(spark, [(100, BENCH_SENT)])
        train = _docs(
            spark,
            [
                (1, "prefix words " + BENCH_SENT + " suffix words"),  # contaminated
                (2, "completely unrelated text about spark partitions and shuffles"),
                (3, "the quick brown fox jumps"),  # < 13 shared tokens → clean
            ],
        )
        out = decontam.decontaminate(train, bench, n=13).orderBy("doc_id")
        rows = {r["doc_id"]: r for r in out.collect()}
        assert rows[1]["contaminated"] and rows[1]["n_matching_grams"] >= 1
        assert not rows[2]["contaminated"] and rows[2]["n_matching_grams"] == 0
        assert not rows[3]["contaminated"]
        # original columns ride through untouched
        assert set(out.columns) == {"doc_id", "text", "n_matching_grams", "contaminated"}

    def test_min_matches_threshold(self, spark):
        bench = _docs(spark, [(100, BENCH_SENT)])
        # exactly one shared 13-gram (the full 14-token sentence has 2 13-grams;
        # taking its first 13 tokens shares exactly 1)
        first13 = " ".join(BENCH_SENT.split()[:13])
        train = _docs(spark, [(1, first13)])
        strict = decontam.decontaminate(train, bench, n=13, min_matches=2)
        assert not strict.first()["contaminated"]
        loose = decontam.decontaminate(train, bench, n=13, min_matches=1)
        assert loose.first()["contaminated"]


class TestRepetition:
    def test_duplicate_line_metrics(self, spark):
        df = _docs(spark, [(1, "x\ny\nx"), (2, "a\nb"), (3, "")])
        out = {
            r["doc_id"]: r["m"]
            for r in df.select(
                "doc_id", text.duplicate_line_metrics(F.col("text")).alias("m")
            ).collect()
        }
        # 3 lines, 2 distinct → 1/3 of lines and 1/3 of line-chars duplicated
        assert out[1]["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
        assert out[1]["dup_line_char_frac"] == pytest.approx(1 / 3, abs=1e-6)
        assert out[2]["dup_line_frac"] == 0.0
        assert out[3]["dup_line_frac"] == 0.0

    def test_top_and_dup_ngram_fractions(self, spark):
        # "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] → top "a b"×3,
        # len 3, chars 11 → top2 = 9/11; dup chars = 3*3 + 2*3 = 15 → 15/11
        df = _docs(spark, [(1, "a b a b a b"), (2, "all words differ here now")])
        out = {
            r["doc_id"]: r
            for r in text.repetition_metrics(df, top_ns=(2,), dup_ns=(2,)).collect()
        }
        assert out[1]["top2_char_frac"] == pytest.approx(9 / 11, abs=1e-6)
        assert out[1]["dup2_char_frac"] == pytest.approx(15 / 11, abs=1e-6)
        assert out[2]["dup2_char_frac"] == 0.0
        assert 0 < out[2]["top2_char_frac"] < 0.5

    def test_short_docs_survive_with_zeros(self, spark):
        df = _docs(spark, [(1, "one"), (2, ""), (3, "a b c d e f g h i j")])
        out = text.repetition_metrics(df, top_ns=(2,), dup_ns=(5,))
        assert out.count() == 3
        row1 = out.filter("doc_id = 1").first()
        assert row1["top2_char_frac"] == 0.0 and row1["dup5_char_frac"] == 0.0


class TestGopherQuality:
    def test_pass_and_fail(self, spark):
        good = " ".join(
            ["the quick brown fox jumps over a lazy dog in the park"] * 6
        )  # 72 words, stopword-rich, all alphabetic
        df = _docs(spark, [(1, good), (2, "tiny doc"), (3, "### ### " + good)])
        out = {
            r["doc_id"]: r["g"]
            for r in df.select(
                "doc_id", text.gopher_quality_flags(F.col("text")).alias("g")
            ).collect()
        }
        assert out[1]["passes"]
        assert out[1]["word_count"] == 72
        assert out[1]["alpha_word_frac"] == 1.0
        assert out[1]["stopword_hits"] >= 2
        assert not out[2]["passes"]  # under 50 words
        # six '#' symbols over 74 words < 0.1 → still passes; check the ratio
        assert out[3]["symbol_word_ratio"] == pytest.approx(6 / 74, abs=1e-6)

    def test_line_signals(self, spark):
        t = "first line ...\n- bullet one\n- bullet two\nplain"
        df = _docs(spark, [(1, t)])
        g = df.select(text.gopher_quality_flags(F.col("text")).alias("g")).first()["g"]
        assert g["ellipsis_line_frac"] == pytest.approx(0.25, abs=1e-6)
        assert g["bullet_line_frac"] == pytest.approx(0.5, abs=1e-6)


class TestUnigramLogprob:
    def test_hand_computed(self, spark):
        # corpus: a a b | b → p(a) = p(b) = 0.5, every doc mean = ln(0.5)
        df = _docs(spark, [(1, "a a b"), (2, "b")])
        out = {r["doc_id"]: r["mean_logp"] for r in text.unigram_logprob(df).collect()}
        assert out[1] == pytest.approx(math.log(0.5), abs=1e-5)
        assert out[2] == pytest.approx(math.log(0.5), abs=1e-5)

    def test_rare_words_score_lower(self, spark):
        common = "the the the the the the the the"
        rare = "zyzzyva qwerty"
        df = _docs(spark, [(1, common), (2, rare)])
        out = {r["doc_id"]: r["mean_logp"] for r in text.unigram_logprob(df).collect()}
        assert out[1] > out[2]


class TestC4Filter:
    def test_line_rules(self, spark):
        t = (
            "Word salad prefix line\n"
            "This is a good sentence one.\n"
            "short line.\n"
            "This line mentions JavaScript framework today.\n"
            "five words but no punctuation"
        )
        df = _docs(spark, [(1, t)])
        row = text.c4_filter(df).first()
        # only the 6-word terminally-punctuated non-javascript line survives
        assert row["clean_text"] == "This is a good sentence one."
        assert row["n_sentences"] == 1
        assert not row["kept"]  # fewer than 3 sentences

    def test_page_rules(self, spark):
        good = (
            "This is a good sentence one.\n"
            "This is a good sentence two!\n"
            "Is this a good sentence three?"
        )
        df = _docs(
            spark,
            [
                (1, good),
                (2, good + "\nlorem ipsum appears in this line here."),
                (3, good + "\ncurly brace appears right here { now."),
            ],
        )
        out = {r["doc_id"]: r for r in text.c4_filter(df).collect()}
        assert out[1]["kept"] and out[1]["n_sentences"] == 3
        assert not out[2]["kept"]  # lorem ipsum poisons the page
        assert not out[3]["kept"]  # curly brace poisons the page


class TestStreamingParity:
    def test_c4_gopher_stateless_stream_equals_batch(self, spark, tmp_path):
        # c4_filter and gopher_quality_flags are stateless projections, so
        # the identical plan runs under Structured Streaming with no
        # watermark/state — batch and stream produce the same row set
        rows = [
            (1, "This is a good sentence one.\nThis is a good sentence two!\nIs this a good sentence three?"),
            (2, "word salad without structure"),
            (3, "lorem ipsum poisoned page. With sentences here too. And a third one."),
        ]
        src = str(tmp_path / "qdocs")
        spark.createDataFrame(rows, "doc_id long, text string").repartition(2).write.parquet(src)

        def curate(df):
            flagged = text.c4_filter(df)
            g = df.select(
                "doc_id", text.gopher_quality_flags(F.col("text")).alias("g")
            ).select("doc_id", F.col("g.word_count").alias("wc"))
            return flagged.join(g, on="doc_id")

        batch = {tuple(r) for r in curate(spark.read.parquet(src)).collect()}
        stream = spark.readStream.schema(
            "doc_id long, text string"
        ).parquet(src)
        q = (
            curate(stream)
            .writeStream.format("memory")
            .queryName("c4_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {tuple(r) for r in spark.sql("SELECT * FROM c4_stream").collect()}
        assert got == batch and len(batch) == 3

    def test_url_canonicalize_stream_equals_batch(self, spark, tmp_path):
        # canonicalize_urls is a stateless scan-side projection — the crawl
        # frontier shape is a STREAM of fetched URLs, so the same plan must
        # produce identical rows under Structured Streaming
        rows = [
            (1, "HTTPS://WWW.Example.COM:443/A?utm_source=x&id=1#f"),
            (2, "site.co.uk/path?gclid=z&q=2"),
            (3, "http://user@media.example.com.au:8080/B"),
        ]
        src = str(tmp_path / "urls")
        spark.createDataFrame(rows, "doc_id long, url string").repartition(
            2
        ).write.parquet(src)
        batch = {
            tuple(r)
            for r in text.canonicalize_urls(spark.read.parquet(src)).collect()
        }
        stream = spark.readStream.schema("doc_id long, url string").parquet(src)
        q = (
            text.canonicalize_urls(stream)
            .writeStream.format("memory")
            .queryName("url_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {tuple(r) for r in spark.sql("SELECT * FROM url_stream").collect()}
        assert got == batch and len(batch) == 3
        by_id = {r[0]: r for r in got}
        assert by_id[1][2] == "https://example.com/A?id=1"  # norm_url
        assert by_id[2][4] == "site.co.uk"  # reg_domain
        assert by_id[3][3] == "media.example.com.au"  # host (userinfo gone)

    def test_decontam_foreach_batch_equals_batch(self, spark, tmp_path):
        # decontamination against a STATIC benchmark is per-document, so
        # running it per micro-batch over the arriving corpus (foreachBatch,
        # same pattern as incremental_neardup) is exactly the batch result
        bench = _docs(spark, [(100, BENCH_SENT)])
        rows = [
            (1, "prefix words " + BENCH_SENT + " suffix words"),
            (2, "completely unrelated text about spark partitions"),
            (3, "yet another clean document with different words"),
        ]
        src = str(tmp_path / "train_stream")
        _docs(spark, rows).repartition(3).write.parquet(src)

        expect = {
            (r["doc_id"], r["contaminated"])
            for r in decontam.decontaminate(
                spark.read.parquet(src), bench, n=13
            ).collect()
        }

        got = set()

        def sink(batch_df, _bid):
            for r in decontam.decontaminate(batch_df, bench, n=13).collect():
                got.add((r["doc_id"], r["contaminated"]))

        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
        q.awaitTermination(120)
        assert got == expect
        assert (1, True) in got and (2, False) in got


def test_full_curation_pipeline(spark):
    """End-to-end training-data curation user story over one synthetic
    corpus: C4 clean → Gopher quality gate → benchmark decontamination →
    exact dedup → sequence packing.  Asserts each stage's effect and that
    the final packing covers exactly the surviving docs."""
    from pathwaydataframework_spark import Table
    from pathwaydataframework_spark.operators import dedup as dedup_ops
    from pathwaydataframework_spark.operators import packing
    import pathwaydataframework_spark as pw

    good = (
        "The quick brown fox jumps over the lazy dog today.\n"
        "It is a fine day for writing some tests here!\n"
        "Is that not the best of all possible worlds?"
    )
    corpus = _docs(
        spark,
        [
            (1, good),                               # survives everything
            (2, good),                               # exact dup of 1 → deduped
            (3, "word salad no punctuation"),        # C4 drops (0 sentences)
            (4, good + "\n" + BENCH_SENT + " and it continues onward properly."),  # contaminated
            (5, good.replace("quick", "clever")),    # survives (distinct content)
        ],
    )
    bench = _docs(spark, [(100, BENCH_SENT)])

    # 1. C4 clean + keep gate
    cleaned = text.c4_filter(corpus).filter("kept").select(
        "doc_id", F.col("clean_text").alias("text")
    )
    kept_after_c4 = {r["doc_id"] for r in cleaned.select("doc_id").collect()}
    assert kept_after_c4 == {1, 2, 4, 5}

    # 2. Gopher gate (relaxed word-count floor for the tiny fixture —
    #    thresholds are module constants, monkeypatch-free via filter)
    gated = cleaned.filter(
        text.gopher_quality_flags(F.col("text"))["alpha_word_frac"] >= 0.8
    )
    assert gated.count() == 4

    # 3. decontamination vs the benchmark
    decon = decontam.decontaminate(gated, bench, n=13)
    survivors = decon.filter(~F.col("contaminated")).select("doc_id", "text")
    assert {r["doc_id"] for r in survivors.select("doc_id").collect()} == {1, 2, 5}

    # 4. exact dedup on content
    unique = dedup_ops.exact_dedup(
        Table(survivors), pw.this.text, keep_order_by=pw.this.doc_id
    ).df
    assert {r["doc_id"] for r in unique.select("doc_id").collect()} == {1, 5}

    # 5. pack the survivors into fixed-token sequences
    with_counts = unique.select(
        "doc_id", text.token_count(F.col("text")).alias("n_tokens")
    )
    packed = packing.pack_by_offset(with_counts, "doc_id", "n_tokens", 16, shards=2)
    rows = packed.collect()
    assert {r["doc_id"] for r in rows} == {1, 5}
    assert all(r["start_offset"] >= 0 and r["seq_id"] >= 0 for r in rows)


class TestSpanDedup:
    SPAN = "one two three four five six seven eight nine ten eleven twelve thirteen"

    def test_first_copy_kept_later_copies_cut(self, spark):
        from pathwaydataframework_spark.operators import dedup

        rows = [
            (1, "intro words then " + self.SPAN + " tail one"),
            (2, "different prefix " + self.SPAN + " other tail"),
            (3, "totally unrelated clean document text"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["doc_id"]: r
            for r in dedup.remove_duplicate_spans(df, "doc_id", "text", k=13).collect()
        }
        assert out[1]["n_removed_tokens"] == 0  # first occurrence survives
        assert self.SPAN in out[1]["clean_text"]
        assert out[2]["n_removed_tokens"] == 13
        assert out[2]["clean_text"] == "different prefix other tail"
        assert out[3]["n_removed_tokens"] == 0

    def test_overlapping_spans_merge(self, spark):
        from pathwaydataframework_spark.operators import dedup

        # doc 2 repeats a 14-token window → two overlapping dup 13-grams;
        # the covered region is the union, not double-removed
        span14 = self.SPAN + " fourteen"
        rows = [(1, span14 + " first home"), (2, "x y " + span14 + " z")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["doc_id"]: r
            for r in dedup.remove_duplicate_spans(df, "doc_id", "text", k=13).collect()
        }
        assert out[1]["n_removed_tokens"] == 0
        assert out[2]["n_removed_tokens"] == 14
        assert out[2]["clean_text"] == "x y z"

    def test_repeat_within_one_doc(self, spark):
        from pathwaydataframework_spark.operators import dedup

        text_ = self.SPAN + " middle filler words " + self.SPAN
        df = spark.createDataFrame([(1, text_)], "doc_id long, text string")
        row = dedup.remove_duplicate_spans(df, "doc_id", "text", k=13).first()
        assert row["n_removed_tokens"] == 13  # second in-doc copy removed
        assert row["clean_text"] == self.SPAN + " middle filler words"


class TestTokenizeToIds:
    def test_order_unknowns_and_empty_docs(self, spark):
        docs = _docs(
            spark,
            [(1, "the cat sat"), (2, "the zyzzyva sat"), (3, "")],
        )
        vocab = text.vocabulary(docs, min_count=2)
        out = {
            r["doc_id"]: (list(r["token_ids"]), r["n_tokens"])
            for r in text.tokenize_to_ids(docs, vocab).collect()
        }
        # vocab: sat=1, the=2 (count ties, alphabetical)
        assert out[1] == ([2, 0, 1], 3)  # cat unknown → 0
        assert out[2] == ([2, 0, 1], 3)
        assert out[3] == ([], 0)  # empty doc survives

    def test_feeds_packing(self, spark):
        from pathwaydataframework_spark.operators import packing

        docs = _docs(spark, [(i, "w" + " w" * i) for i in range(1, 6)])
        vocab = text.vocabulary(docs)
        ids = text.tokenize_to_ids(docs, vocab)
        packed = packing.pack_by_offset(ids, "doc_id", "n_tokens", 8, shards=2)
        assert packed.count() == 5
        assert all(r["start_offset"] >= 0 for r in packed.collect())


def test_gopher_repetition_filter_verdicts(spark):
    clean = " ".join(f"w{i}" for i in range(40))
    spammy = "spam ham " * 30
    liney = "good unique line\nsame line\nsame line\nsame line\nsame line"
    df = _docs(spark, [(1, clean), (2, spammy), (3, liney)])
    out = {r["doc_id"]: r for r in text.gopher_repetition_filter(df).collect()}
    assert out[1]["passes_repetition"]
    assert not out[2]["passes_repetition"]  # top-2-gram dominance
    assert not out[3]["passes_repetition"]  # duplicate lines
    assert out[3]["dup_line_frac"] == pytest.approx(0.6, abs=1e-6)


def test_filter_blocked_domains(spark):
    df = spark.createDataFrame(
        [
            (1, "https://good.org/page"),
            (2, "http://spam.example.com/x"),
            (3, "example.com/y"),  # no scheme
            (4, "https://notexample.com/z"),  # NOT a subdomain
        ],
        "id long, url string",
    )
    kept = sorted(
        r["id"]
        for r in text.filter_blocked_domains(df, blocklist=["example.com"]).collect()
    )
    assert kept == [1, 4]
    exact_only = sorted(
        r["id"]
        for r in text.filter_blocked_domains(
            df, blocklist=["example.com"], keep_subdomains_blocked=False
        ).collect()
    )
    assert exact_only == [1, 2, 4]


def _norm_one(spark, url, **kw):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(text.normalize_url(F.col("url"), **kw).alias("n")).first()["n"]


def test_normalize_url_rules(spark):
    cases = {
        # scheme+host lowercased, path case kept, fragment dropped
        "HTTPS://WWW.Example.COM/Path/X#frag": "https://example.com/Path/X",
        # default ports stripped per scheme; non-default kept
        "http://example.com:80/a": "http://example.com/a",
        "https://example.com:443/a": "https://example.com/a",
        "https://example.com:8443/a": "https://example.com:8443/a",
        "http://example.com:443/a": "http://example.com:443/a",
        # missing scheme -> http; empty path -> '/'
        "example.com": "http://example.com/",
        "example.com?q=1": "http://example.com/?q=1",
        # userinfo removed
        "http://user:pw@example.com/x": "http://example.com/x",
        # tracking params dropped, survivors keep order, lone '?' dropped;
        # bare ref is content-bearing (branch/tab selectors) and KEPT
        "https://a.com/p?utm_source=x&id=7&utm_campaign=y&ref=h": (
            "https://a.com/p?id=7&ref=h"
        ),
        "https://a.com/p?utm_source=x": "https://a.com/p",
        "https://a.com/p?id=7&page=2": "https://a.com/p?id=7&page=2",
    }
    for raw, want in cases.items():
        assert _norm_one(spark, raw) == want, raw
    # callers that KNOW ref is tracking on their corpus opt in per call
    assert (
        _norm_one(
            spark,
            "https://a.com/p?id=7&ref=h",
            tracking_extra_keys=("ref",),
        )
        == "https://a.com/p?id=7"
    )
    assert (
        _norm_one(spark, "http://www.example.com/x", strip_www=False)
        == "http://www.example.com/x"
    )


def test_strip_tracking_params_preserves_fragment(spark):
    df = spark.createDataFrame(
        [("https://a.com/p?utm_source=x&id=1#sec?not-a-query",)], "url string"
    )
    got = df.select(
        text.strip_tracking_params(F.col("url")).alias("u")
    ).first()["u"]
    assert got == "https://a.com/p?id=1#sec?not-a-query"


def test_registrable_domain(spark):
    cases = {
        "example.com": "example.com",
        "sub.example.com": "example.com",
        "a.b.news.co.uk": "news.co.uk",
        "news.co.uk": "news.co.uk",
        "media.example.com.au": "example.com.au",
        "localhost": "localhost",
        "CO.UK": "co.uk",  # the suffix itself has no +1: passes through
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r["host"]: r["d"]
        for r in df.select(
            "host", text.registrable_domain(F.col("host")).alias("d")
        ).collect()
    }
    assert got == {h: cases[h] for h in cases}


def test_canonicalize_urls_projection(spark):
    df = spark.createDataFrame(
        [(1, "HTTP://www.Shop.co.uk:80/Item?utm_medium=email&sku=9#top")],
        "id long, url string",
    )
    row = text.canonicalize_urls(df).first()
    assert row["norm_url"] == "http://shop.co.uk/Item?sku=9"
    assert row["host"] == "shop.co.uk"
    assert row["reg_domain"] == "shop.co.uk"


class TestBigramLogprob:
    def test_hand_computed(self, spark):
        import math

        # corpus 'a b' + 'a c': c(a)=2 c(b)=c(c)=1 N=4; bigram (a,b)=(a,c)=1
        df = _docs(spark, [(1, "a b"), (2, "a c"), (3, "")])
        out = {r["doc_id"]: r["mean_logp"] for r in text.bigram_logprob(df, lam=0.5).collect()}
        exp = round(
            (round(math.log(0.5), 6) + round(math.log(0.5 * 0.5 + 0.5 * 0.25), 6)) / 2, 6
        )
        assert out[1] == pytest.approx(exp, abs=1e-6)
        assert out[3] is None  # empty doc survives with NULL

    def test_predictable_text_scores_higher(self, spark):
        predictable = "the cat sat . " * 10
        shuffled = "cat the . sat sat . the cat . the " * 4
        df = _docs(spark, [(1, predictable), (2, shuffled)])
        out = {r["doc_id"]: r["mean_logp"] for r in text.bigram_logprob(df).collect()}
        assert out[1] > out[2]


class TestReviewRegressions:
    """Pins for the r2 code-review findings (malformed URLs, NULL scores,
    quote sentences, unicode ellipsis, empty-doc restore, validations)."""

    def test_malformed_and_null_urls_survive_domain_filter(self, spark):
        df = spark.createDataFrame(
            [(1, "https://ok.org/x"), (2, ":::not a url:::"), (3, None),
             (4, "http://blocked.test/y")],
            "id long, url string",
        )
        kept = sorted(
            r["id"]
            for r in text.filter_blocked_domains(df, blocklist=["blocked.test"]).collect()
        )
        # garbage and NULL urls are not on the blocklist → kept, not crashed
        assert kept == [1, 2, 3]

    def test_c4_counts_quote_terminated_sentences(self, spark):
        t = (
            'He said clearly "this is sentence one."\n'
            'She replied kindly "this is sentence two."\n'
            'They agreed together "this is sentence three."'
        )
        row = text.c4_filter(_docs(spark, [(1, t)])).first()
        assert row["n_sentences"] == 3
        assert row["kept"]

    def test_gopher_unicode_ellipsis_lines(self, spark):
        t = "line one ends …\nline two ends …\nline three ends …\nplain"
        g = _docs(spark, [(1, t)]).select(
            text.gopher_quality_flags(F.col("text")).alias("g")
        ).first()["g"]
        assert g["ellipsis_line_frac"] == pytest.approx(0.75, abs=1e-6)

    def test_unigram_logprob_restores_empty_docs(self, spark):
        df = _docs(spark, [(1, "a b a"), (2, "   ")])
        out = {r["doc_id"]: r["mean_logp"] for r in text.unigram_logprob(df).collect()}
        assert set(out) == {1, 2}
        assert out[2] is None


def test_dedup_by_url_collapses_tracking_variants(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.com/p?utm_source=x&id=1", 0.9),
            (2, "https://www.a.com/p?id=1", 0.5),  # same page, www + no utm
            (3, "HTTPS://A.com/p?id=1#frag", 0.7),  # same page, case + frag
            (4, "https://a.com/p?id=2", 0.1),  # different page
        ],
        "doc_id long, url string, score double",
    )
    kept = sorted(
        r["doc_id"] for r in text.dedup_by_url(df, prefer_col="score").collect()
    )
    assert kept == [1, 4]  # highest score among the variant group wins
    # no prefer_col: smallest doc_id wins
    kept2 = sorted(r["doc_id"] for r in text.dedup_by_url(df).collect())
    assert kept2 == [1, 4]


def test_normalize_url_idempotent_and_invariant(spark):
    # combinatorial sweep: normalize(normalize(u)) == normalize(u) plus the
    # output invariants a dedup key needs (no fragment, no tracking param,
    # lowercase scheme/host, non-empty path) — 648 part combinations
    import itertools

    schemes = ["https://", "HTTP://", ""]
    hosts = ["Example.COM", "www.www.Site.co.uk", "user:pw@A.org"]
    ports = ["", ":443", ":8080"]
    paths = ["", "/Path/X", "/redirect"]
    queries = ["", "?utm_source=x", "?id=1&UTM_CAMPAIGN=y&to=http://b.com/x"]
    frags = ["", "#frag", "#a?b=2"]
    urls = [
        "".join(parts)
        for parts in itertools.product(schemes, hosts, ports, paths, queries, frags)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    # materialize pass 1 before applying pass 2: composing the trees
    # directly squares the (already large) normalizer expression and
    # costs minutes of codegen for zero extra coverage
    pass1 = df.select(text.normalize_url(F.col("url")).alias("n1"))
    df2 = spark.createDataFrame(pass1.collect())
    out = df2.select(
        "n1", text.normalize_url(F.col("n1")).alias("n2")
    ).collect()
    for r in out:
        assert r["n1"] == r["n2"], f"not idempotent: {r['n1']!r} -> {r['n2']!r}"
        assert "#" not in r["n1"]  # fragment never survives
        assert "utm_" not in r["n1"].lower()
        head = r["n1"].split("://", 1)
        assert head[0] in ("http", "https")
        host = head[1].split("/", 1)[0]
        assert host == host.lower() and "@" not in host
        assert not host.startswith("www.")
        assert "/" in head[1]  # path never empty


def test_normalize_url_protocol_relative(spark):
    # protocol-relative hrefs must collapse with their absolute forms
    got = _norm_one(spark, "//CDN.Example.com/lib.js?utm_source=x")
    assert got == "http://cdn.example.com/lib.js"
    # and stay idempotent (pass 1 materialized; see the idempotence sweep)
    n1 = _norm_one(spark, "//a.com/x")
    assert n1 == "http://a.com/x" and _norm_one(spark, n1) == n1


def test_dedup_by_url_null_urls_pass_through(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.com/p", 0.9),
            (2, None, 0.5),
            (3, None, 0.7),  # both NULL-url rows must survive
            (4, "http://a.com/p", 0.1),  # http vs https: DIFFERENT pages
        ],
        "doc_id long, url string, score double",
    )
    kept = sorted(
        r["doc_id"] for r in text.dedup_by_url(df, prefer_col="score").collect()
    )
    assert kept == [1, 2, 3, 4]


def test_parse_robots_and_allowed(spark):
    robots = spark.createDataFrame(
        [
            ("a.test", "User-agent: *\nDisallow: /private\nAllow: /private/pub  # c\n"),
            ("b.test", "User-agent: bot\nDisallow: /\n\nUser-agent: *\nAllow: /"),
            ("c.test", "User-agent: *\nDisallow:"),  # empty = allow all
        ],
        "host string, robots_txt string",
    )
    rules = {
        (r["host"], r["agent"], r["allow"], r["path"])
        for r in text.parse_robots(robots).collect()
    }
    assert rules == {
        ("a.test", "*", False, "/private"),
        ("a.test", "*", True, "/private/pub"),
        ("b.test", "bot", False, "/"),
        ("b.test", "*", True, "/"),
        ("c.test", "*", True, ""),
    }
    urls = spark.createDataFrame(
        [
            (1, "https://a.test/private/x"),      # longest match: Disallow
            (2, "https://a.test/private/pub/x"),  # longer Allow overrides
            (3, "https://a.test/open"),           # no rule -> allowed
            (4, "https://b.test/anything"),       # '*' group, not 'bot'
            (5, "https://norobots.test/x"),       # no robots -> allowed
        ],
        "id long, url string",
    )
    got = {
        r["id"]: r["allowed"]
        for r in text.robots_allowed(urls, text.parse_robots(robots)).collect()
    }
    assert got == {1: False, 2: True, 3: True, 4: True, 5: True}
    # the bot group applies when asked for; hosts WITHOUT a bot group
    # fall back to their '*' group (RFC 9309), so a.test still disallows
    bot = {
        r["id"]: r["allowed"]
        for r in text.robots_allowed(
            urls, text.parse_robots(robots), agent="bot"
        ).collect()
    }
    assert bot == {1: False, 2: True, 3: True, 4: False, 5: True}


def test_parse_robots_multi_agent_runs(spark):
    """RFC 9309: a run of consecutive User-agent lines shares one rule
    set; unknown directives don't split the run; rules before any
    User-agent line are ignored."""
    robots = spark.createDataFrame(
        [
            (
                "a.test",
                "User-agent: a\nUser-agent: b\nDisallow: /x\n"
                "\nUser-agent: c\nCrawl-delay: 2\nUser-agent: d\nDisallow: /y",
            ),
            ("b.test", "Disallow: /orphan\nUser-agent: *\nDisallow: /z"),
        ],
        "host string, robots_txt string",
    )
    rules = {
        (r["host"], r["agent"], r["allow"], r["path"])
        for r in text.parse_robots(robots).collect()
    }
    assert rules == {
        ("a.test", "a", False, "/x"),
        ("a.test", "b", False, "/x"),
        ("a.test", "c", False, "/y"),
        ("a.test", "d", False, "/y"),
        ("b.test", "*", False, "/z"),  # /orphan (no group) dropped
    }


def test_robots_allowed_preserves_rows(spark):
    """The verdict is an array expression after a left join — duplicate
    frontier rows stay duplicates and non-groupable payload columns
    (maps) pass through (the old groupBy(*columns) design collapsed
    duplicates and threw on maps)."""
    robots = spark.createDataFrame(
        [("a.test", "User-agent: *\nDisallow: /x")],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [(1, "https://a.test/x/1"), (1, "https://a.test/x/1"), (2, "https://a.test/ok")],
        "id long, url string",
    ).withColumn("meta", F.create_map(F.lit("k"), F.col("id")))
    out = text.robots_allowed(
        urls, text.parse_robots(robots), broadcast=True
    ).collect()
    assert len(out) == 3  # both duplicates survive
    verdicts = sorted((r["id"], r["allowed"]) for r in out)
    assert verdicts == [(1, False), (1, False), (2, True)]
    assert all(dict(r["meta"]) == {"k": r["id"]} for r in out)


def test_robots_allowed_wildcards(spark):
    """RFC 9309 special characters (ADVICE r7): '*' matches any char run,
    a trailing '$' anchors the end of the URL; '$' elsewhere and LIKE
    metacharacters in rule paths are literal."""
    robots = spark.createDataFrame(
        [
            ("a.test", "User-agent: *\nDisallow: /*.php$\nAllow: /pub*.php$"),
            ("b.test", "User-agent: *\nDisallow: /a*b"),
            # '%' and '_' are literal in rule paths, not LIKE wildcards
            # (the %2A is a valid percent-escape so the URL parses)
            ("c.test", "User-agent: *\nDisallow: /p%2Aq_x"),
        ],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            (1, "https://a.test/dir/page.php"),    # *.php$ hits
            (2, "https://a.test/dir/page.php?q"),  # $ anchors: query -> no hit
            (3, "https://a.test/pubx.php"),        # longer Allow wins
            (4, "https://a.test/x.phpx"),          # not ending .php
            (5, "https://b.test/aXYb/tail"),       # mid '*' is a run
            (6, "https://b.test/ab"),              # '*' matches empty
            (7, "https://b.test/ax"),              # no trailing b
            (8, "https://c.test/p%2Aq_x/y"),       # literal % and _ match
            (9, "https://c.test/pX2Aq_x/y"),       # '%' is NOT any-run
            (10, "https://c.test/p%2AqAx/y"),      # '_' is NOT any-char
        ],
        "id long, url string",
    )
    got = {
        r["id"]: r["allowed"]
        for r in text.robots_allowed(urls, text.parse_robots(robots)).collect()
    }
    assert got == {
        1: False, 2: True, 3: True, 4: True,
        5: False, 6: False, 7: True,
        8: False, 9: True, 10: True,
    }


def test_parse_robots_empty_group_allows_all(spark):
    """RFC 9309: a matched group with no rule lines means everything is
    allowed for that agent — parse_robots emits the allow-all sentinel
    instead of dropping the group, so the agent doesn't inherit '*'
    (ADVICE r7).  Under the RFC grammar consecutive User-agent lines
    (blanks ignored) form ONE run, so an empty group can only sit at
    end-of-file — exactly the ADVICE example."""
    robots = spark.createDataFrame(
        [("a.test", "User-agent: *\nDisallow: /\n\nUser-agent: bot")],
        "host string, robots_txt string",
    )
    rules = {
        (r["host"], r["agent"], r["allow"], r["path"])
        for r in text.parse_robots(robots).collect()
    }
    assert rules == {
        ("a.test", "bot", True, ""),
        ("a.test", "*", False, "/"),
    }
    urls = spark.createDataFrame([(1, "https://a.test/x")], "id long, url string")
    parsed = text.parse_robots(robots)
    assert text.robots_allowed(urls, parsed, agent="bot").collect()[0]["allowed"]
    assert not text.robots_allowed(urls, parsed).collect()[0]["allowed"]


def test_robots_directives(spark):
    """Crawl-delay is agent-group-scoped (consecutive-UA-run semantics,
    pre-group delays ignored); Sitemap is host-global with NULL agent,
    even when it appears before any User-agent line."""
    robots = spark.createDataFrame(
        [
            (
                "a.test",
                "Sitemap: https://a.test/sm.xml\n"
                "User-agent: a\nUser-agent: b\nCrawl-delay: 2\nDisallow: /x\n"
                "\nUser-agent: c\nCrawl-delay: 10\n"
                "Sitemap: https://a.test/sm2.xml",
            ),
            ("b.test", "Crawl-delay: 9\nUser-agent: *\nDisallow: /z"),
        ],
        "host string, robots_txt string",
    )
    got = {
        (r["host"], r["agent"], r["directive"], r["value"])
        for r in text.robots_directives(robots).collect()
    }
    assert got == {
        ("a.test", "a", "crawl-delay", "2"),
        ("a.test", "b", "crawl-delay", "2"),
        ("a.test", "c", "crawl-delay", "10"),
        ("a.test", None, "sitemap", "https://a.test/sm.xml"),
        ("a.test", None, "sitemap", "https://a.test/sm2.xml"),
        # b.test's orphan Crawl-delay (no group) is ignored; no sitemap
    }
    # a Crawl-delay BETWEEN two User-agent lines of one run neither
    # splits the run (both agents share delay and rules — the lenient
    # grouping parse_robots also uses) nor leaks into the next group
    mid = spark.createDataFrame(
        [("c.test", "User-agent: a\nCrawl-delay: 2\nUser-agent: b\nDisallow: /x")],
        "host string, robots_txt string",
    )
    got_mid = {
        (r["agent"], r["value"])
        for r in text.robots_directives(mid).collect()
    }
    assert got_mid == {("a", "2"), ("b", "2")}
    rules_mid = {
        (r["agent"], r["path"]) for r in text.parse_robots(mid).collect()
    }
    assert rules_mid == {("a", "/x"), ("b", "/x")}


def test_schedule_fetches(spark):
    """Per-host politeness pacing: deterministic md5-order queue
    positions, fetch offsets = seq * the host's delay (default for
    undeclared hosts), NULL urls excluded, NULL host a real group."""
    frontier = spark.createDataFrame(
        [
            ("a.test", "https://a.test/1"),
            ("a.test", "https://a.test/2"),
            ("a.test", "https://a.test/3"),
            ("b.test", "https://b.test/1"),
            ("b.test", "https://b.test/2"),
            (None, "https://c.test/naked"),
            ("a.test", None),
        ],
        "host string, url string",
    )
    delays = spark.createDataFrame([("a.test", 5)], "host string, crawl_delay long")
    out = text.schedule_fetches(frontier, delays, seed=1).collect()
    assert len(out) == 6  # NULL url dropped; NULL host kept
    by_host: dict = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    # per-host seqs are 0..n-1 and offsets scale by the host's delay
    a = sorted(by_host["a.test"], key=lambda r: r["fetch_seq"])
    assert [r["fetch_seq"] for r in a] == [0, 1, 2]
    assert [r["fetch_offset_s"] for r in a] == [0.0, 5.0, 10.0]
    b = sorted(by_host["b.test"], key=lambda r: r["fetch_seq"])
    assert [r["fetch_offset_s"] for r in b] == [0.0, 1.0]  # default delay
    assert [r["fetch_seq"] for r in by_host[None]] == [0]
    # md5 order is stable: same seed -> same queue, new seed -> may differ
    again = {
        (r["host"], r["url"]): r["fetch_seq"]
        for r in text.schedule_fetches(frontier, delays, seed=1).collect()
    }
    assert all(again[(r["host"], r["url"])] == r["fetch_seq"] for r in out)
    # a multi-row delays frame (robots_directives emits one row per
    # (host, agent)) must NOT fan the frontier out: one row per URL,
    # max delay wins (code-review r8 finding)
    multi = spark.createDataFrame(
        [("a.test", "agenta", 5), ("a.test", "agentb", 2)],
        "host string, agent string, crawl_delay long",
    )
    out_multi = text.schedule_fetches(frontier, multi, seed=1).collect()
    assert len(out_multi) == 6
    a_multi = sorted(
        (r for r in out_multi if r["host"] == "a.test"),
        key=lambda r: r["fetch_seq"],
    )
    assert [r["fetch_offset_s"] for r in a_multi] == [0.0, 5.0, 10.0]
    # delay parsing is self-contained (VERDICT r8 item 7): a wild
    # non-numeric Crawl-delay value ('fast') try_casts to NULL inside
    # the operator and the host paces at the default — no caller-side
    # cast required, no ANSI cast error
    wild = spark.createDataFrame(
        [("a.test", "fast"), ("b.test", "2.5")],
        "host string, crawl_delay string",
    )
    out_wild = {
        (r["host"], r["fetch_seq"]): r["fetch_offset_s"]
        for r in text.schedule_fetches(frontier, wild, seed=1).collect()
    }
    assert out_wild[("a.test", 1)] == 1.0   # 'fast' -> default 1 s
    assert out_wild[("b.test", 1)] == 2.5   # numeric strings still parse


def test_fetch_waves(spark):
    """Dispatch waves from offsets: wave = floor(offset / window), one
    window count per (host, wave), NULL-host rows form a real group."""
    frontier = spark.createDataFrame(
        [("a.test", f"https://a.test/{i}") for i in range(7)]
        + [("b.test", "https://b.test/0")],
        "host string, url string",
    )
    delays = spark.createDataFrame(
        [("a.test", 4)], "host string, crawl_delay long"
    )
    sched = text.schedule_fetches(frontier, delays, seed=1)
    out = text.fetch_waves(sched, 10.0).collect()
    # a.test paces at 4 s: offsets 0,4,8 -> wave 0; 12,16 -> 1; 20,24 -> 2
    waves = {}
    for r in out:
        waves.setdefault((r["host"], r["wave"]), []).append(r["wave_size"])
    assert {k: v[0] for k, v in waves.items()} == {
        ("a.test", 0): 3, ("a.test", 1): 2, ("a.test", 2): 2,
        ("b.test", 0): 1,
    }
    # wave_size is constant within its group and matches the group size
    assert all(len(set(v)) == 1 and v[0] == len(v) for v in waves.values())
    # every row keeps its wave = floor(offset / window)
    assert all(r["wave"] == int(r["fetch_offset_s"] // 10.0) for r in out)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        text.fetch_waves(sched, 0)


def test_parse_robots_crlf(spark):
    """Real robots.txt files are CRLF: the \\n split leaves a trailing
    \\r per line, which the Java regexes treat as a line terminator
    ('.' excludes it, '$' anchors before it) — rules, delays and
    sitemap URLs must extract with no stray carriage returns."""
    robots = spark.createDataFrame(
        [
            (
                "a.test",
                "User-agent: *\r\nDisallow: /private\r\nAllow: /private/pub\r\n"
                "Crawl-delay: 3\r\nSitemap: https://a.test/sm.xml\r\n",
            )
        ],
        "host string, robots_txt string",
    )
    rules = {
        (r["agent"], r["allow"], r["path"])
        for r in text.parse_robots(robots).collect()
    }
    assert rules == {("*", False, "/private"), ("*", True, "/private/pub")}
    dirs = {
        (r["agent"], r["directive"], r["value"])
        for r in text.robots_directives(robots).collect()
    }
    assert dirs == {
        ("*", "crawl-delay", "3"),
        (None, "sitemap", "https://a.test/sm.xml"),
    }
    urls = spark.createDataFrame(
        [(1, "https://a.test/private/x"), (2, "https://a.test/private/pub/y")],
        "id long, url string",
    )
    got = {
        r["id"]: r["allowed"]
        for r in text.robots_allowed(urls, text.parse_robots(robots)).collect()
    }
    assert got == {1: False, 2: True}

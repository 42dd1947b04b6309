"""Capstone: the complete training-data pipeline composed end-to-end from
this engine's own operators — the workload the 100 TB design exists for.

documents → C4 page rules → global near-dup removal → quality scoring →
leakage-safe split → vocabulary → tokenize → pack → shard layout.
Each stage's output feeds the next as a plain DataFrame; the whole chain
is lazy until the final actions."""

from __future__ import annotations

import pyspark.sql.functions as F

from pathwaydataframework_spark.data import load_table
from pathwaydataframework_spark.operators import dedup, packing, sampling, text


def test_full_pipeline_documents_to_shards(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").df

    # 1. page-quality gate (C4 rules are too strict for the synthetic
    #    word-soup fixture — use the text-stats gate instead)
    gated = docs.filter(text.token_count(F.col("text")) >= 10)
    n_gated = gated.count()
    assert n_gated > 0

    # 2. corpus-level near-dup removal (MinHash → CC → exemplar)
    canon = dedup.corpus_dedup(
        gated, "doc_id", "text", n=3, num_hashes=16, bands=4, threshold=0.8
    )
    clean = gated.join(canon.filter("kept").select("doc_id"), on="doc_id")
    n_clean = clean.count()
    assert 0 < n_clean <= n_gated

    # 3. quality scoring (unigram LM proxy) — keep the upper half
    scored = text.unigram_logprob(clean, id_col="doc_id", text_col="text")
    med = scored.approxQuantile("mean_logp", [0.5], 0.0)[0]
    good = clean.join(
        scored.filter(F.col("mean_logp") >= F.lit(med)).select("doc_id"), on="doc_id"
    )
    n_good = good.count()
    assert 0 < n_good <= n_clean

    # 4. leakage-safe split — near-dups can't straddle train/val
    parts = sampling.leakage_safe_split(
        good, "doc_id", "text", {"train": 0.9, "val": 0.1},
        seed=0, num_hashes=16, bands=4, threshold=0.8,
    )
    train, val = parts["train"], parts["val"]
    t_ids = {r["doc_id"] for r in train.select("doc_id").collect()}
    v_ids = {r["doc_id"] for r in val.select("doc_id").collect()}
    assert t_ids.isdisjoint(v_ids) and len(t_ids) + len(v_ids) == n_good

    # 5. vocabulary on train ONLY (no val leakage), tokenize both
    vocab = text.vocabulary(train, text_col="text", min_count=1, k=None)
    ids = text.tokenize_to_ids(train, vocab, id_col="doc_id", text_col="text")
    sample = ids.first()
    assert sample is not None and len(sample["token_ids"]) > 0

    # 6. pack into 512-token training sequences, then shard layout
    counted = ids.select(
        "doc_id", F.size("token_ids").alias("n_tokens")
    )
    packed = packing.pack_by_offset(counted, "doc_id", "n_tokens", 512, shards=8)
    assert packed.filter(F.col("start_offset") < 0).count() == 0
    # offsets within a shard are non-overlapping: cumsum property
    from pyspark.sql import Window as W

    w = W.partitionBy("shard").orderBy("start_offset")
    gaps = packed.withColumn(
        "prev_end", F.lag(F.col("start_offset") + F.col("n_tokens")).over(w)
    ).filter(F.col("prev_end").isNotNull() & (F.col("start_offset") != F.col("prev_end")))
    assert gaps.count() == 0

    # 7. reproducible shard export layout for the packed docs
    shards = sampling.assign_shards(counted, "doc_id", rows_per_shard=64, seed=1)
    assert shards.count() == counted.count()
    assert shards.select("shard").distinct().count() >= 1

    # 8. terminal export + the trainer's rank slices (r11): no-straddle
    #    pack → materialize → parquet+manifest → per-rank read-back;
    #    the two ranks' slices are disjoint, complete, and each numbers
    #    its consumption order 0..n-1 — the whole chain documents →
    #    trainer loader end to end
    import shutil
    import tempfile

    layout = packing.pack_no_straddle(
        counted, "doc_id", "n_tokens", 512, shards=4
    )
    seqs = packing.materialize_sequences(
        ids, layout, max_tokens=512, pad_id=0
    ).localCheckpoint()
    want = {
        (r["shard"], r["seq_id"])
        for r in seqs.select("shard", "seq_id").collect()
    }
    tmp = tempfile.mkdtemp(prefix="pw_e2e_pack_")
    try:
        manifest = packing.write_packed_dataset(seqs, tmp, max_tokens=512)
        assert manifest["n_seqs"] == len(want)
        got: set = set()
        total = 0
        for r in range(2):
            sl, info = packing.read_packed_slices(spark, tmp, 2, r)
            rows = sl.select("shard", "seq_id", "position").collect()
            assert sorted(x["position"] for x in rows) == list(
                range(len(rows))
            )
            assert len(rows) == info["n_seqs"]
            got |= {(x["shard"], x["seq_id"]) for x in rows}
            total += len(rows)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert total == len(want)  # disjoint (no overlap lost in the union)
    assert got == want  # complete

    # 9. the UNPACKED (SFT) branch off the same chain (r14, VERDICT r13
    #    item 6): the tokenized train docs, a planted instruction
    #    prefix (first third of each doc's tokens = the "prompt"),
    #    quantile-suggested boundaries, then bucket → padded tensors —
    #    so the SFT path is exercised END-TO-END from raw documents
    #    exactly like the packed path above
    sft_src = ids.select(
        "doc_id",
        "token_ids",
        F.size("token_ids").cast("long").alias("n_tok"),
        (F.size("token_ids") / 3).cast("long").alias("plen"),
    )
    bnds = packing.suggest_boundaries_values(sft_src, "n_tok", 4)
    assert bnds == sorted(bnds) and len(bnds) >= 1
    batches = packing.materialize_padded_batches(
        sft_src, "doc_id", "token_ids", boundaries=bnds, batch_size=4,
        seed=0, pad_id=0, prompt_len_col="plen", drop_ragged=False,
    ).localCheckpoint()
    # suggested boundaries cover the max → no open bucket, every doc
    # keeps a non-NULL pad target and no row is dropped
    assert batches.filter(F.col("cap").isNull()).count() == 0
    assert batches.count() == sft_src.count()
    # tensor contract on the REAL chain output: fixed shape per batch,
    # attention = real tokens, loss = completion tokens only,
    # input_ids round-trips the tokenizer's ids
    bad = batches.filter(
        (F.size("input_ids") != F.col("pad_len"))
        | (F.size("attention_mask") != F.col("pad_len"))
        | (F.size("loss_mask") != F.col("pad_len"))
        | (
            F.aggregate(
                "attention_mask", F.lit(0).cast("long"),
                lambda a, x: a + x,
            )
            != F.col("n_tok")
        )
        | (
            F.aggregate(
                "loss_mask", F.lit(0).cast("long"), lambda a, x: a + x
            )
            != F.col("n_tok") - F.col("plen")
        )
        | (F.slice("input_ids", 1, F.size("token_ids")) != F.col("token_ids"))
    )
    assert bad.count() == 0
    # one pad target per (bucket, batch_id)
    multi = (
        batches.groupBy("bucket", "batch_id")
        .agg(F.countDistinct("pad_len").alias("n_pads"))
        .filter(F.col("n_pads") != 1)
    )
    assert multi.count() == 0


def test_crawl_front_end_pipeline(spark, sf_dir):
    """The crawl front-end, composed: planted page HTML → link
    extraction, plus a per-doc sitemap hop → robots politeness gate →
    canonicalization → URL-level dedup → per-site quota → bloom dedup
    against 'yesterday's' corpus → token-budget cut.  Every stage is
    this engine's own operator; counts are checked against the planted
    structure."""
    from pathwaydataframework_spark.operators.parsers import (
        extract_links,
        sitemap_locs,
    )

    docs = load_table(spark, sf_dir, "documents").df.limit(200)
    d = F.col("doc_id")
    # each page links to: a shared hub (every doc), and a per-doc page
    # in one of 5 sites with utm noise
    html = F.concat(
        F.lit('<a href="https://hub.test/home?utm_source=x">h</a>'),
        F.lit('<a href="https://site'), d % 5, F.lit(".test/p"), d,
        F.lit('#f">p</a>'),
    )
    # ... and serves a sitemap advertising one fresh page plus a
    # /private page that the robots gate must drop
    sitemap = F.concat(
        F.lit("<urlset><url><loc>https://site"), d % 5, F.lit(".test/sm"),
        d, F.lit("</loc></url><url><loc> https://site"), d % 5,
        F.lit(".test/private/x"), d, F.lit(" </loc></url></urlset>"),
    )
    pages = docs.select(
        "doc_id", "n_chars", html.alias("html"), sitemap.alias("sitemap_xml")
    )

    # 1. frontier: HTML links + sitemap <loc>s
    links = pages.select(
        "doc_id", "n_chars", F.explode(extract_links(F.col("html"))).alias("url")
    )
    sm = pages.select(
        "doc_id",
        "n_chars",
        F.explode(sitemap_locs(F.col("sitemap_xml"))).alias("url"),
    )
    frontier = links.unionByName(sm)
    n_docs = pages.count()
    assert frontier.count() == 4 * n_docs

    # 2. robots politeness: every site Disallows /private and declares a
    # Crawl-delay plus a robots-declared sitemap; hub allows all
    robots = spark.createDataFrame(
        [
            (
                f"site{i}.test",
                f"User-agent: *\nCrawl-delay: {i + 1}\nDisallow: /private\n"
                f"Sitemap: https://site{i}.test/sitemap.xml",
            )
            for i in range(5)
        ]
        + [("hub.test", "User-agent: *\nDisallow:")],
        "host string, robots_txt string",
    )

    # 2a. the discovery loop real crawlers run: robots_directives surfaces
    # the declared sitemaps + per-host politeness delays; fetching each
    # sitemap (modeled as a join on the declared URL) grows the frontier
    directives = text.robots_directives(robots)
    delays = {
        r["host"]: int(r["value"])
        for r in directives.filter(F.col("directive") == "crawl-delay").collect()
    }
    assert delays == {f"site{i}.test": i + 1 for i in range(5)}
    fetched = spark.createDataFrame(
        [
            (
                f"https://site{i}.test/sitemap.xml",
                f"<urlset><url><loc>https://site{i}.test/robotsm{i}"
                "</loc></url></urlset>",
            )
            for i in range(5)
        ],
        "sitemap_url string, xml string",
    )
    discovered = (
        directives.filter(F.col("directive") == "sitemap")
        .join(fetched, F.col("value") == F.col("sitemap_url"))
        .select(
            F.lit(-1).cast("long").alias("doc_id"),
            F.lit(0).cast("long").alias("n_chars"),
            F.explode(sitemap_locs(F.col("xml"))).alias("url"),
        )
    )
    frontier = frontier.unionByName(discovered)
    assert frontier.count() == 4 * n_docs + 5

    gated = text.robots_allowed(
        frontier, text.parse_robots(robots), agent="bot", broadcast=True
    )
    allowed = gated.filter(F.col("allowed")).drop("allowed")
    # exactly the sitemap /private rows drop; row multiplicity preserved
    assert allowed.count() == 3 * n_docs + 5

    # 3. canonicalize + URL-dedup
    deduped = text.dedup_by_url(allowed, tie_col="doc_id")
    # hub collapses to ONE row; per-doc page + sitemap pages + the 5
    # robots-discovered pages all survive
    assert deduped.count() == 1 + 2 * n_docs + 5

    # 4. per-site quota: at most 3 URLs per registrable domain
    quota = sampling.per_key_topk(
        deduped, "reg_domain", "n_chars", k=3, tie_col="doc_id"
    )
    per_site = {
        r["reg_domain"]: r["n"]
        for r in quota.groupBy("reg_domain").agg(F.count("*").alias("n")).collect()
    }
    assert per_site["hub.test"] == 1
    assert all(per_site[f"site{i}.test"] == 3 for i in range(5))

    # 5. bloom dedup vs an already-crawled corpus (every even doc's page)
    seen = quota.filter(d % 2 == 0)
    fresh = dedup.bloom_dedup(quota, seen, "norm_url", m_bits=1 << 14, k=5)
    assert fresh.count() == quota.filter(d % 2 == 1).count()

    # 6. token-budget cut on what's left
    budget = 2000
    cut = sampling.token_budget_sample(
        fresh, "doc_id", "n_chars", budget=budget, seed=2
    )
    assert 0 < cut.count() <= fresh.count()
    assert cut.agg(F.max("cum_tokens")).first()[0] <= budget

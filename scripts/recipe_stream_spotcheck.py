"""Spot-check: the FULL streaming corpus recipe (q_recipe_stream's
chain) over a long batch stream — what do the four carried states
actually cost, and does the stream reproduce the one-shot recipe?

Drives N id-ordered batches of synthetic multi-line documents through
c4_filter -> incremental_line_dedup -> bpe_encode_incremental ->
pack_no_straddle_incremental -> materialize_sequences_incremental with
all four states folding forward (plain function calls — the
foreachBatch body is exactly this), then checks:

- the three SUMMARY states saturate or stay bounded at every batch
  boundary: word table (distinct word forms — the synthetic vocabulary
  is bounded, so it must flatline), pack state (= shards rows), open
  rows (<= shards open sequences);
- the line index is corpus-PROPORTIONAL by design (each doc plants one
  unique line) — the check is that it grows by ~the batch's kept-line
  count and no faster, and that the per-batch wall does NOT grow with
  it (the anti-join is batch-probe-sized, history is never rescanned);
- emitted-per-batch ∪ final-flush reproduces the ONE-SHOT recipe
  (c4_filter -> dedup_lines_global -> bpe_encode -> pack_no_straddle ->
  materialize_sequences) exactly: sequence count, real-token sum, and
  span count all match;
- per-batch wall clock (second-half average — early batches pay
  codegen) and docs/s throughput.

Usage: python3 scripts/recipe_stream_spotcheck.py [batches] [docs_per_batch] [shards]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from pathwaydataframework_spark.operators import bpe, dedup, packing
from pathwaydataframework_spark.operators import text as text_ops

CAP = 512
FIRST_N = 8


def _vocab() -> dict[str, int]:
    vocab = {chr(97 + i): i for i in range(26)}
    for t in ("th", "the", "ta", "ab", "le", "tab", "table", "va", "al",
              "ue", "val", "value", "row", "ho", "ld", "hold", "cl", "ean"):
        vocab[t] = len(vocab)
    return vocab


def batch_df(spark, lo: int, hi: int):
    """Synthetic pages: three c4-keepable sentences per doc — two
    doc-flavored lines whose first 8 words come from a BOUNDED word set
    (the encoder's truncation window; the word table must saturate) and
    whose tail carries the raw doc id (each doc plants one unique line,
    so the line index grows like a real corpus), plus the corpus-wide
    banner line the dedup collapses.  Every 11th doc gets page poison
    (c4-dropped), so the id set narrows mid-pipeline like q_recipe's."""
    d = F.col("id")
    flav = d % 5000
    line_a = F.concat(
        F.lit("the table w"), flav, F.lit(" holds a value row cleanly for "),
        d, F.lit("."),
    )
    line_b = F.lit("every page shares this exact cookie banner line.")
    line_c = F.concat(
        F.lit("value row v"), flav, F.lit(" closes the table neatly for "),
        d, F.lit("."),
    )
    poison = F.when(d % 11 == 0, F.lit("\nlorem ipsum tail")).otherwise(
        F.lit("")
    )
    return spark.range(lo, hi).select(
        d.alias("doc_id"),
        F.concat(
            line_a, F.lit("\nshort line.\n"), line_b, F.lit("\n"), line_c,
            poison,
        ).alias("text"),
    )


def _first_words(df, n: int):
    return df.select(
        "doc_id",
        F.array_join(
            F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, n), " "
        ).alias("text"),
    )


def _clean_dedup_batch(b, lines):
    cleaned = text_ops.c4_filter(b)
    kept = cleaned.filter(F.col("kept")).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    return dedup.incremental_line_dedup(
        kept, lines, id_col="doc_id", text_col="text"
    )


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    shards = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    vocab = _vocab()

    wt = bpe.bpe_word_table(spark)
    ps = packing.pack_state(spark)
    orows = packing.open_rows_state(spark)
    lines = spark.createDataFrame([], "line string")
    emitted_seqs = 0
    emitted_tokens = 0
    emitted_spans = 0
    walls: list[float] = []
    print(
        f"batches={n_batches} per_batch={per_batch} shards={shards} "
        f"cap={CAP} first_n={FIRST_N}"
    )
    for i in range(n_batches):
        t0 = time.time()
        b = batch_df(spark, i * per_batch, (i + 1) * per_batch)
        deduped = _clean_dedup_batch(b, lines).localCheckpoint()
        lines = (
            lines.unionByName(dedup.line_index(deduped, text_col="clean_text"))
            .distinct()
            .localCheckpoint()
        )
        corpus = deduped.select("doc_id", F.col("clean_text").alias("text"))
        enc, wt = bpe.bpe_encode_incremental(
            _first_words(corpus, FIRST_N), wt, vocab, append_eos_id=55
        )
        enc = enc.localCheckpoint()
        packed, ps = packing.pack_no_straddle_incremental(
            enc, ps, "doc_id", "n_tokens", CAP, shards=shards
        )
        em, orows = packing.materialize_sequences_incremental(
            packed, enc, orows, ps, max_tokens=CAP, pad_id=-1
        )
        stats = em.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("tok"),
            F.coalesce(F.sum(F.size("doc_spans")), F.lit(0)).alias("sp"),
        ).first()
        emitted_seqs += int(stats["n"])
        emitted_tokens += int(stats["tok"])
        emitted_spans += int(stats["sp"])
        orows = orows.localCheckpoint()
        ps = ps.localCheckpoint()
        wall = time.time() - t0
        walls.append(wall)
        open_tok = orows.agg(
            F.coalesce(F.sum(F.size("token_ids")), F.lit(0))
        ).first()[0]
        print(
            f"batch {i:>3}: wall={wall:6.2f}s lines={lines.count():>9} "
            f"word_table={wt.count():>6} open_rows_tokens={int(open_tok):>7} "
            f"(bound {shards * CAP}) emitted_seqs={int(stats['n']):>6}"
        )
        assert int(open_tok) <= shards * CAP, "open-rows bound violated"

    flushed = packing.materialize_sequences(
        orows.select("doc_id", "token_ids"),
        orows.select("doc_id", "shard", "seq_id", "start_offset"),
        max_tokens=CAP,
        pad_id=-1,
    )
    fstats = flushed.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("tok"),
        F.coalesce(F.sum(F.size("doc_spans")), F.lit(0)).alias("sp"),
    ).first()
    got = (
        emitted_seqs + int(fstats["n"]),
        emitted_tokens + int(fstats["tok"]),
        emitted_spans + int(fstats["sp"]),
    )

    # one-shot reference over the whole corpus
    t0 = time.time()
    full = batch_df(spark, 0, n_batches * per_batch)
    cleaned = text_ops.c4_filter(full)
    kept = cleaned.filter(F.col("kept")).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    deduped = dedup.dedup_lines_global(kept, "doc_id", "text")
    corpus = deduped.select("doc_id", F.col("clean_text").alias("text"))
    enc = bpe.bpe_encode(
        _first_words(corpus, FIRST_N), vocab, append_eos_id=55
    )
    layout = packing.pack_no_straddle(
        enc, "doc_id", "n_tokens", CAP, shards=shards
    )
    seqs = packing.materialize_sequences(enc, layout, max_tokens=CAP, pad_id=-1)
    ostats = seqs.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("tok"),
        F.coalesce(F.sum(F.size("doc_spans")), F.lit(0)).alias("sp"),
    ).first()
    oneshot_wall = time.time() - t0
    want = (int(ostats["n"]), int(ostats["tok"]), int(ostats["sp"]))

    half = walls[len(walls) // 2 :]
    print(
        f"\nstream: seqs={got[0]} tokens={got[1]} spans={got[2]}\n"
        f"one-shot: seqs={want[0]} tokens={want[1]} spans={want[2]} "
        f"(wall {oneshot_wall:.1f}s)\n"
        f"second-half per-batch wall avg {sum(half) / len(half):6.2f}s "
        f"({per_batch / (sum(half) / len(half)):,.0f} docs/s); "
        f"first-vs-last batch wall {walls[0]:.2f}s -> {walls[-1]:.2f}s"
    )
    assert got == want, f"stream != one-shot: {got} vs {want}"
    print("PARITY OK")
    spark.stop()


if __name__ == "__main__":
    main()

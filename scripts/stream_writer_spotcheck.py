"""Spot-check: the streaming sequence writer
(materialize_sequences_incremental) over a long batch stream — is the
carried open-rows state really stream-length-independent, and what does
the per-batch emit cost?

Drives N id-ordered batches of synthetic (doc_id, n_tok, token_ids)
through pack_no_straddle_incremental -> materialize_sequences_incremental
with both states folding forward (plain function calls, no stream
machinery — the foreachBatch body is exactly this), then checks:

- open-rows state stays bounded at EVERY batch boundary: one open
  SEQUENCE per shard, so <= shards distinct (shard, seq) pairs and
  <= shards * cap carried tokens, whatever the stream length (rows =
  docs in open tails, bounded by shards * cap / min_doc_tokens);
- emitted-per-batch ∪ final-flush reproduces the one-shot writer
  exactly (count + token-sum parity);
- per-batch wall clock (second half average — the first batches pay
  codegen) and docs/s throughput.

Usage: python3 scripts/stream_writer_spotcheck.py [batches] [docs_per_batch] [shards]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from pathwaydataframework_spark.operators import packing

CAP = 2048


def batch_df(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 900 + 10).alias("n_tok"),
        # bounded fake ids — the writer moves arrays, content is irrelevant
        F.array_repeat(
            F.col("id") % 1000, (F.col("id") % 900 + 10).cast("int")
        ).alias("token_ids"),
    )


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    shards = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    ps = packing.pack_state(spark)
    open_rows = packing.open_rows_state(spark)
    emitted_seqs = 0
    emitted_tokens = 0
    state_sizes = []
    times = []
    for b in range(n_batches):
        lo, hi = b * per_batch, (b + 1) * per_batch
        bdf = batch_df(spark, lo, hi).localCheckpoint()
        t0 = time.perf_counter()
        packed, ps_new = packing.pack_no_straddle_incremental(
            bdf.select("doc_id", "n_tok"), ps, "doc_id", "n_tok", CAP,
            shards=shards,
        )
        emitted, open_rows_new = packing.materialize_sequences_incremental(
            packed, bdf.select("doc_id", "token_ids"), open_rows, ps_new,
            max_tokens=CAP,
        )
        agg = emitted.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("t"),
        ).collect()[0]
        ps = ps_new.localCheckpoint()
        open_rows = open_rows_new.localCheckpoint()
        dt = time.perf_counter() - t0
        times.append(dt)
        emitted_seqs += agg["n"]
        emitted_tokens += int(agg["t"])
        st = open_rows.agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct("shard", "seq_id").alias("open_seqs"),
            F.coalesce(F.sum(F.size("token_ids")), F.lit(0)).alias("toks"),
        ).collect()[0]
        state_sizes.append((st["rows"], st["open_seqs"], int(st["toks"])))
        print(
            f"batch {b}: {dt:.2f}s, emitted {agg['n']} seqs, open state: "
            f"{st['rows']} rows / {st['open_seqs']} seqs / {st['toks']} toks"
        )
        assert st["open_seqs"] <= shards, "more than one open seq per shard"
        assert int(st["toks"]) <= shards * CAP, "state outgrew shards*cap tokens"

    flushed = packing.materialize_sequences(
        open_rows.select("doc_id", "token_ids"),
        open_rows.select("doc_id", "shard", "seq_id", "start_offset"),
        max_tokens=CAP,
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("t"),
    ).collect()[0]
    total_seqs = emitted_seqs + flushed["n"]
    total_tokens = emitted_tokens + int(flushed["t"])

    # one-shot reference over the whole stream
    full = batch_df(spark, 0, n_batches * per_batch)
    layout = packing.pack_no_straddle(
        full.select("doc_id", "n_tok"), "doc_id", "n_tok", CAP, shards=shards
    )
    ref = packing.materialize_sequences(
        full.select("doc_id", "token_ids"), layout, max_tokens=CAP
    ).agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t")
    ).collect()[0]
    assert (total_seqs, total_tokens) == (ref["n"], int(ref["t"])), (
        (total_seqs, total_tokens), (ref["n"], int(ref["t"])))

    half = times[len(times) // 2 :]
    steady = sum(half) / len(half)
    print(
        f"\nPARITY OK: {total_seqs} seqs / {total_tokens} tokens "
        f"(streamed == one-shot)\n"
        f"open state per boundary: max {max(s[0] for s in state_sizes)} "
        f"rows / {max(s[1] for s in state_sizes)} seqs / "
        f"{max(s[2] for s in state_sizes)} toks "
        f"(bounds: seqs <= {shards}, toks <= {shards * CAP})\n"
        f"steady per-batch: {steady:.2f}s  "
        f"({per_batch / steady:,.0f} docs/s)"
    )


if __name__ == "__main__":
    main()

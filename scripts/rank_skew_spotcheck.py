"""Rank-skew measurement for the packed layout (VERDICT r11 item 7).

read_packed_slices assigns shards to data-parallel ranks by
``shard % world_size``; ``equalize=True`` drops a per-epoch tail of
``max(rank_seqs) - min(rank_seqs)`` sequences on the larger ranks.  This
script measures that spread with MANIFEST ARITHMETIC ONLY (per-shard
n_seqs from the pack layout — the same numbers the manifest stores; no
data scan beyond the pack itself) on the real fixture pipeline, across
world sizes that do and do not divide the shard count, and compares it
against the structural prediction:

    spread/total ≈ (ceil(S/W) - floor(S/W)) / S   [0 when W | S]
                   + O(sqrt(W·ln W / n))          [multinomial hash noise]

Usage:  python3 scripts/rank_skew_spotcheck.py [sf_dir] [shards...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pathwaydataframework_spark as pw  # noqa: E402
from pathwaydataframework_spark.data import load_table  # noqa: E402
from pathwaydataframework_spark.operators import bpe, packing  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    shard_counts = [int(a) for a in sys.argv[2:]] or [16, 64]
    spark = pw.get_spark(app_name="rank_skew", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").df
    # the q_train_sequences fixture pipeline's encode step: real doc-id
    # hashing, real token-count variation
    vocab = {w: i for i, w in enumerate(
        ["a", "b", "c", "d", "e", "th", "the", "an", "and", "of"]
    )}
    enc = bpe.bpe_encode(
        docs.select("doc_id", F.col("text")), vocab, mode="longest",
        append_eos_id=55,
    )
    for shards in shard_counts:
        layout = packing.pack_no_straddle(
            enc, "doc_id", "n_tokens", 64, shards=shards
        )
        per_shard = {
            int(r["shard"]): int(r["n"])
            for r in layout.groupBy("shard")
            .agg(F.countDistinct("seq_id").alias("n"))
            .collect()
        }
        total = sum(per_shard.values())
        print(f"\n== shards={shards}, total sequences={total} "
              f"(sf_dir={sf_dir}) ==")
        print(f"{'W':>3} {'min':>7} {'max':>7} {'spread':>7} "
              f"{'spread/total':>13} {'structural':>11} {'noise_pred':>11}")
        for w in (2, 3, 4, 5, 8, 16):
            if w > shards:
                continue
            rank_seqs = [0] * w
            for s, n in per_shard.items():
                rank_seqs[s % w] += n
            mn, mx = min(rank_seqs), max(rank_seqs)
            structural = (math.ceil(shards / w) - shards // w) / shards
            noise = math.sqrt(w * math.log(max(w, 2)) / max(total, 1))
            print(f"{w:>3} {mn:>7} {mx:>7} {mx - mn:>7} "
                  f"{(mx - mn) / total:>13.4f} {structural:>11.4f} "
                  f"{noise:>11.4f}")
    spark.stop()


if __name__ == "__main__":
    main()

"""sf0.1 → sf1 scale spot-check for the heaviest LLM-pipeline operators.

Synthesizes a 10× corpus from sf0.1 documents (each replica gets a
vowel-rotation of the text, so replicas are lexically distinct and do NOT
near-duplicate each other — the duplicate-structure density stays that of
the original corpus) and times corpus_dedup / span_dedup /
quality_classifier at both scales on the same local[32] session.

r6 adds the similarity stack (the bench's heaviest lines): minhash_lsh
pairs over the same 10× documents, and bm25 / knn_lsh with a FIXED query
set against a 10× corpus — the realistic scale-up shape (corpus grows,
workload doesn't).  The 10× embeddings replicas keep their vectors
verbatim, which is the conservative worst case for LSH: every bucket gets
exactly 10× denser, so candidate generation cannot scale better than the
data.  knn_lsh runs the 64-bit/8-band SCALE configuration (what bench.py
times as q_knn_lsh_tight), not the provable-recall oracle parameters.

Appends nothing; prints a markdown table to paste into SCALE.md.

Run: python3 scripts/scale_spotcheck.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

import pathwaydataframework_spark as pw  # noqa: E402
from pathwaydataframework_spark.ml import quality  # noqa: E402
from pathwaydataframework_spark.operators import dedup  # noqa: E402

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SCALE_WORK_DIR", "/tmp/spark_graft_scale")
REPLICAS = int(os.environ.get("SCALE_REPLICAS", "10"))

VOWELS = "aeiou"


def build_synthetic(spark, out_dir: str) -> None:
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    parts = []
    for i in range(REPLICAS):
        rot = VOWELS[i % 5 :] + VOWELS[: i % 5]
        d = docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            (F.translate("text", VOWELS, rot) if i else F.col("text")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(out_dir)


def build_synthetic_embeddings(spark, out_dir: str) -> None:
    emb = spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))
    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"), "embedding"
        )
        for i in range(REPLICAS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(out_dir)


def timed(fn, reps: int = 2) -> tuple[float, int]:
    """Best-of-reps wall clock with a noop sink: count() would let
    Catalyst prune expensive computed columns (span_dedup's rewritten
    text, the classifier's scores) right out of the plan — the noop
    writer materializes every output column."""
    best, n = float("inf"), 0
    for _ in range(reps):
        t0 = time.perf_counter()
        df = fn()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    n = fn().count()
    return best, n


def main() -> None:
    from pathwaydataframework_spark.operators import ranking, similarity

    spark = pw.get_spark(app_name="scale-spotcheck")
    spark.sparkContext.setLogLevel("ERROR")
    synth = os.path.join(WORK, f"docs_x{REPLICAS}")
    if not os.path.isdir(synth):
        build_synthetic(spark, synth)
    synth_emb = os.path.join(WORK, f"emb_x{REPLICAS}")
    if not os.path.isdir(synth_emb):
        build_synthetic_embeddings(spark, synth_emb)
    small = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    big = spark.read.parquet(synth)
    small_emb = spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))
    big_emb = spark.read.parquet(synth_emb)
    queries_txt = spark.createDataFrame(
        [(1, "spark query window"), (2, "batch data table")],
        "query_id long, query string",
    )
    queries_vec = small_emb.filter(F.col("vec_id") < 10)
    print(
        f"# rows: sf0.1={small.count()}  synthetic={big.count()}  "
        f"emb={small_emb.count()}  emb_synth={big_emb.count()}"
    )

    ops = {
        "corpus_dedup": lambda df: dedup.corpus_dedup(
            df, "doc_id", "text", n=3, num_hashes=16, bands=4, threshold=0.8
        ),
        "span_dedup": lambda df: dedup.remove_duplicate_spans(
            df, "doc_id", "text", k=13
        ),
        "quality_classifier": lambda df: quality.predict_logreg(
            df,
            quality.train_logreg(
                df.withColumn(
                    "y", F.coalesce((F.col("lang") == "en").cast("int"), F.lit(0))
                ),
                "doc_id",
                "text",
                "y",
                buckets=1024,
                iterations=4,
                lr=2.0,
                seed=0,
            ),
            "doc_id",
            "text",
            buckets=1024,
            seed=0,
        ),
    }
    # similarity stack (r6): fixed workload, corpus scales
    sim_ops = {
        "minhash_lsh_pairs": lambda df: dedup.minhash_lsh_pairs(
            df, "doc_id", "text", n=3, num_hashes=16, bands=4, threshold=0.8
        ),
        "bm25": lambda df: ranking.bm25_scores(df, queries_txt, k=5),
    }
    knn_ops = {
        "knn_lsh(64b/8bands)": lambda emb: similarity.knn_lsh(
            emb, queries_vec, dim=64, k=5, bits=64, bands=8
        ),
    }

    # untimed warmup: compile the codegen classes every op hits, so the
    # FIRST timed measurement isn't charged for JIT (same rationale as
    # bench.py's warmup pass)
    for op in ops.values():
        op(small).write.format("noop").mode("overwrite").save()
    for op in sim_ops.values():
        op(small).write.format("noop").mode("overwrite").save()
    for op in knn_ops.values():
        op(small_emb).write.format("noop").mode("overwrite").save()

    print(f"| operator | sf0.1 (s) | rows | {REPLICAS}× (s) | rows | ratio |")
    print("|---|---|---|---|---|---|")
    for name, op in {**ops, **sim_ops}.items():
        t1, n1 = timed(lambda: op(small))
        t10, n10 = timed(lambda: op(big))
        print(f"| {name} | {t1:.2f} | {n1} | {t10:.2f} | {n10} | {t10 / t1:.1f}× |")
    for name, op in knn_ops.items():
        t1, n1 = timed(lambda: op(small_emb))
        t10, n10 = timed(lambda: op(big_emb))
        print(f"| {name} | {t1:.2f} | {n1} | {t10:.2f} | {n10} | {t10 / t1:.1f}× |")
    spark.stop()


if __name__ == "__main__":
    main()

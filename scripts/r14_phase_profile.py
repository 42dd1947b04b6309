"""r14 optimization-round phase profiler.

Times the expensive headline queries phase by phase (noop sink per guide
S1.4, labeled jobs per S1.5) so the optimization targets are attributed,
not guessed.  Usage: python scripts/r14_phase_profile.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pathwaydataframework_spark as pw  # noqa: E402
from pathwaydataframework_spark.data import load_table  # noqa: E402
from pathwaydataframework_spark.operators import dedup, similarity  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

spark = pw.get_spark(app_name="r14_profile", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext


def timed(label, fn):
    best = None
    for _ in range(reps):
        sc.setJobDescription(label)
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        sc.setJobDescription(None)
    print(f"{label:55s} {best:7.3f}s")
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# (an earlier jobs_between() helper was deleted — ADVICE r14: it was
# never called and getJobIdsForGroup(None) returns ALL default-group job
# ids, so its counts would have been wrong; job censuses are taken with
# an explicit setJobGroup instead, as in train_epochs_spotcheck.py)

# ---- warmup (codegen) at sf0.001
docs_w = load_table(spark, "/root/testdata/sf0.001", "documents").df
dedup.minhash_lsh_pairs(docs_w, "doc_id", "text", n=3, num_hashes=16, bands=4, threshold=0.8).count()

docs = load_table(spark, sf, "documents").df

print("== q_minhash_lsh phases ==")
timed("minhash: shingle+sig agg (no ckpt)", lambda: noop(
    dedup.minhash_signatures(docs, "doc_id", "text", n=3, num_hashes=16)))
timed("minhash: compact bands (no ckpt)", lambda: noop(
    dedup._minhash_compact_bands(docs, "doc_id", "text", n=3, num_hashes=16, bands=4)))
timed("minhash: full pipeline (count)", lambda:
    dedup.minhash_lsh_pairs(docs, "doc_id", "text", n=3, num_hashes=16, bands=4, threshold=0.8).count())

# verify-pass cost in isolation: shingle_sets over the whole corpus
timed("minhash: whole-corpus shingle sets", lambda: noop(
    dedup._ensure_parallelism(docs).select(
        F.col("doc_id"), dedup._word_shingles(F.col("text"), 3).alias("g"))))

print("== q_knn_lsh (tight) phases ==")
emb = load_table(spark, sf, "embeddings").df
queries = emb.filter(F.col("vec_id") < 10)
timed("knn: corpus signatures", lambda: noop(
    similarity.lsh_signatures(emb, id_col="vec_id", vec_col="embedding", dim=64, bits=64, seed=42)))
timed("knn: full tight (count)", lambda:
    similarity.knn_lsh(emb, queries, dim=64, k=5, bits=64, bands=8).count())

print("== q_bm25 phases ==")
from pathwaydataframework_spark.operators import ranking  # noqa: E402
bm_queries = spark.createDataFrame(
    [(1, "spark query window"), (2, "batch data table")],
    "query_id long, query string",
)
timed("bm25: full (count)", lambda: ranking.bm25_scores(docs, bm_queries, k=5).count())

print("== q_recipe phases ==")
import __spark_entry__ as entry  # noqa: E402
from pathwaydataframework_spark.operators import bpe, packing  # noqa: E402
from pathwaydataframework_spark.operators import text as text_ops  # noqa: E402

planted = entry._recipe_planted(docs)
timed("recipe: c4_filter", lambda: noop(text_ops.c4_filter(planted)))
kept = text_ops.c4_filter(planted).filter(F.col("kept")).select(
    "doc_id", F.col("clean_text").alias("text"))
timed("recipe: + dedup_lines_global", lambda: noop(
    dedup.dedup_lines_global(kept, "doc_id", "text")))
corpus = dedup.dedup_lines_global(kept, "doc_id", "text").select(
    "doc_id", F.col("clean_text").alias("text"))
trunc = entry._first_words(corpus, 12)
timed("recipe: + bpe_encode", lambda: noop(
    bpe.bpe_encode(trunc, entry._bpe_fixture_vocab(), mode="longest", append_eos_id=55)))
timed("recipe: full (count)", lambda: entry.q_recipe(spark, sf).count())

print("== q_train_epochs phases ==")
timed("epochs: full (count)", lambda: entry.q_train_epochs(spark, sf).count())

print("== q_connected_components ==")
timed("cc: full (count)", lambda: entry.q_connected_components(spark, sf).count())

spark.stop()

"""Capture library-level sub-plans into plans/r15/ (guide §7.2).

The checkpoint-backed entry queries' final plans are scan stubs by
design (localCheckpoint truncates lineage), so the r15 optimization
claims are carried by these pre-checkpoint sub-plans:

- sub_slices_union_{before,after}: the q_train_epochs union frame —
  before = the r14 per-(epoch, rank) read_packed_slices loop (one
  position-machinery chain per slice), after = the r15 batched
  packing.read_packed_epochs (ONE plan, one scan, one grouped
  running-total).
- sub_materialize_write_{before,after}: the frame write_packed_dataset
  executes (repartition("shard") + sortWithinPartitions on top of
  materialize_sequences) — before = the r13 shape WITHOUT
  materialize's internal shard repartition (reconstructed inline:
  groupBy straight after the join, so the agg exchange keys on
  (shard, seq_id) and the write repartition adds a second exchange),
  after = the current tree (hash(shard) shared by the agg and the
  write: exactly ONE hashpartitioning(shard) exchange — the
  VERDICT r14 item 5 artifact; pinned in tests/test_plans.py).

Usage: python scripts/r15_capture_subplans.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pyspark.sql.functions as F  # noqa: E402

import pathwaydataframework_spark as pw  # noqa: E402
import __spark_entry__ as entry  # noqa: E402
from pathwaydataframework_spark.data import load_table  # noqa: E402
from pathwaydataframework_spark.operators import bpe, packing  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out_dir = os.path.join(
    HERE, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
)
os.makedirs(out_dir, exist_ok=True)

spark = pw.get_spark(
    app_name="r15_subplans", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
)
spark.sparkContext.setLogLevel("ERROR")


def dump(df, name: str) -> None:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(out_dir, f"{name}.txt")
    with open(path, "w") as fh:
        fh.write(plan)
    print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")


docs = load_table(spark, sf, "documents").df
trunc = entry._first_words(docs, 8)
enc = bpe.bpe_encode(
    trunc, entry._bpe_fixture_vocab(), mode="longest", append_eos_id=55
).localCheckpoint(eager=False)
layout = packing.pack_no_straddle(enc, "doc_id", "n_tokens", 32, shards=16)
seqs = packing.materialize_sequences(enc, layout, max_tokens=32, pad_id=-1)

# ---- sub_materialize_write: the exact pre-write frame write_packed_dataset
# builds, on the current tree (after) and on the r13 shape (before)
dump(
    seqs.repartition("shard").sortWithinPartitions("shard", "seq_id"),
    "sub_materialize_write_after",
)

# r13 reconstruction: materialize_sequences WITHOUT the internal shard
# repartition — the re-assembly groupBy keys its own exchange on
# (shard, seq_id), and the write's repartition("shard") adds a second one
joined13 = layout.join(enc.select("doc_id", "token_ids"), on="doc_id")
assembled13 = (
    joined13.groupBy("shard", "seq_id")
    .agg(
        F.sort_array(
            F.collect_list(F.struct("start_offset", "doc_id", "token_ids"))
        ).alias("__docs")
    )
    .select(
        "shard",
        "seq_id",
        F.flatten(F.transform("__docs", lambda s: s["token_ids"])).alias(
            "token_ids"
        ),
    )
    .withColumn("n_tokens", F.size("token_ids").cast("long"))
)
dump(
    assembled13.repartition("shard").sortWithinPartitions("shard", "seq_id"),
    "sub_materialize_write_before",
)

# ---- sub_slices_union: the q_train_epochs union frame, pre-checkpoint
tmp = tempfile.mkdtemp(prefix="pw_r15_plans_")
try:
    packing.write_packed_dataset(seqs, tmp, max_tokens=32)
    # before: the r14 per-(epoch, rank) loop
    union = None
    for pass_i, e in enumerate((0, 1)):
        for r in range(2):
            sl, _ = packing.read_packed_slices(
                spark, tmp, 2, r, epoch_seed=e,
                skip_seqs=3 if (e, r) == (1, 0) else 0,
                equalize=True, validate=(pass_i == 0),
            )
            sl = sl.withColumn("epoch", F.lit(e).cast("long"))
            sl = sl.withColumn("rank", F.lit(r).cast("long"))
            union = sl if union is None else union.unionByName(sl)
    dump(union, "sub_slices_union_before")
    # after: the r15 batched loader
    batched, _ = packing.read_packed_epochs(
        spark, tmp, 2, epochs=(0, 1), skip_seqs={(1, 0): 3}, equalize=True
    )
    dump(batched, "sub_slices_union_after")
finally:
    shutil.rmtree(tmp, ignore_errors=True)

spark.stop()

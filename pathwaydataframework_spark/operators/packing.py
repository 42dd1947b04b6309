"""Sequence packing — concatenate documents into fixed-size training
sequences, the standard LLM pre-training batch-prep step.

Semantics: documents are laid out in one deterministic order (by id)
inside each shard; each document's start offset is the running sum of
token counts before it, and it is assigned to sequence
``floor(start_offset / max_tokens)`` — i.e. "concatenate the stream and
cut every max_tokens", the classic packed-dataset layout (documents may
straddle a cut; the trainer's loader handles boundary masking).

Scale design: a single global running sum would serialize into one task,
so packing is SHARDED — a deterministic md5 hash of the id picks one of
``shards`` independent streams, and the window cumsum runs per shard
(``shards`` ≈ cluster cores at 100 TB).  Offsets are deterministic given
(id, shards): reproducible across runs and engines, so the whole layout
is exactly SQL-oracle-checkable.

>>> from pathwaydataframework_spark.operators import packing
>>> import pyspark.sql.functions as F
>>> docs = spark.range(100).select(F.col("id").alias("doc_id"),
...     (F.col("id") % 7 + 1).alias("n_tok"))
>>> p = packing.pack_by_offset(docs, "doc_id", "n_tok", max_tokens=16, shards=4)
>>> p.columns
['doc_id', 'shard', 'seq_id', 'start_offset', 'n_tok']
>>> p.count()
100
>>> # every sequence's documents start inside the sequence's token range
>>> bad = p.filter((F.col("start_offset") < F.col("seq_id") * 16)
...     | (F.col("start_offset") >= (F.col("seq_id") + 1) * 16))
>>> bad.count()
0
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window as W

from pathwaydataframework_spark.operators.sampling import hash_bucket


def pack_by_offset(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    max_tokens: int,
    *,
    shards: int = 32,
    seed: int = 0,
) -> DataFrame:
    """Assign each document a (shard, seq_id, start_offset) packing slot.

    Returns (id, shard, seq_id, start_offset, token_count) — enough for a
    writer to materialize packed sequences with ``groupBy(shard, seq_id)``.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    shard = F.pmod(hash_bucket(F.col(id_col), seed), F.lit(shards)).alias("shard")
    # explicit exclusive ROWS frame: the default RANGE frame treats rows
    # with equal ids as peers and hands them the SAME cumulative sum —
    # overlapping offsets if ids ever duplicate
    # duplicate ids would leave the intra-tie order undefined and the
    # ROWS-frame cumsum nondeterministic; the token count as a second key
    # makes the layout stable (rows identical in BOTH id and count are
    # interchangeable — same offset multiset either way)
    w = (
        W.partitionBy("shard")
        .orderBy(id_col, token_count_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(token_count_col).over(w), F.lit(0))
    return (
        df.select(id_col, shard, F.col(token_count_col))
        .withColumn("start_offset", cum.cast("long"))
        .withColumn("seq_id", F.floor(F.col("start_offset") / F.lit(max_tokens)))
        .select(id_col, "shard", "seq_id", "start_offset", token_count_col)
    )

"""Scale utilities: skew-salted joins and bucketed co-located joins.

These are the two knobs AQE doesn't fully cover at 100 TB (SURVEY.md §7 /
north-star "Partitioning & shuffle"):

- **Salting** handles a hot key on the *probe* side when the build side is
  too large to broadcast: explode the build side ``salt`` ways, scatter the
  probe side across salts, join on (key, salt).  AQE's skew-join splitting
  only helps sort-merge joins after the fact; salting fixes the partition
  sizes by construction and also covers aggregations.
- **Bucketing** pre-shuffles a table by its join key at write time
  (``spark.sql.sources`` bucketed tables), so repeated joins/aggregations
  on that key run with ZERO exchanges — the right layout for fact tables
  that are joined daily.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str] | str,
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to probe-side key skew.

    The probe side gets a uniform random-ish salt derived from its row
    content (deterministic: xxhash64 of all columns, so plans are
    reproducible); the build side is replicated ``salt`` ways.  Join runs
    on (key…, __salt) — a hot key's rows now spread over ``salt``
    partitions instead of one.

    Use when: one side has heavy key skew AND the other side is too big to
    broadcast but small enough to replicate ``salt``×.
    """
    # replicating the build side is only correct when unmatched/matched
    # BUILD rows are never emitted on their own: a right/full outer would
    # emit each build replica (salt copies of unmatched keys, salt-1
    # spurious null-padded rows for matched ones)
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"):
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins, got {how!r} "
            "(build-side replication would duplicate right/full-outer rows)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    # salt from a per-row counter, NOT a hash of the row's values: skew
    # usually IS duplicated rows, and hashing identical rows would land
    # them all on one salt, defeating the spread.  The assignment is
    # run-dependent but the join RESULT is salt-invariant.
    probe_s = probe.withColumn(
        "__salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int"),
    )
    build_s = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = probe_s.join(build_s, on=keys + ["__salt"], how=how).drop("__salt")
    return out


def salted_groupby_count(
    df: DataFrame, keys: list[str] | str, *, salt: int = 16
) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys: partial count per
    (key, salt), then final sum per key.  Spark's partial aggregation
    already does this per-partition; explicit salting additionally bounds
    the *reduce*-side partition for a hot key."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    # per-row counter salt (see salted_join): identical hot-key rows must
    # spread across salts, which a value hash cannot do
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(*keys).agg(F.sum("__c").alias("n"))


def write_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    bucket_by: list[str] | str,
    num_buckets: int = 32,
    sort_by: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table: co-locates rows by join key so
    later joins/aggs on that key skip the exchange entirely."""
    bucket_by = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        sort_by = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sort_by)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)

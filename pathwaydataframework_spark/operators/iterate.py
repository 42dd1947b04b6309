"""Fixed-point iteration — reference ``pw.iterate`` (internals/common.py:39,
IterateOperator internals/operator.py:316; engine graph.rs:941 runs nested
differential-dataflow scopes with bi-temporal timestamps).

Spark has no nested-scope incremental runtime; the idiomatic equivalent is a
driver-side loop (SURVEY.md §7 M7): re-apply the transform until the table(s)
stop changing, cutting lineage each round with ``localCheckpoint`` so plans
don't grow unboundedly.  Batch-only, like the reference's practical usage.
"""

from __future__ import annotations

from typing import Callable

import pyspark.sql.functions as F

from pathwaydataframework_spark.internals.table import Table


def _multiset_signature_metrics(df):
    """(count, Σ rowhash, Σ rowhash²) metric expressions for an
    ``observe()`` on the round's checkpoint action.

    Equality of the signature across rounds ⟺ equal row multisets up to an
    xxhash64 collision (< 2⁻⁶⁴ per pair; the second independently-seeded
    hash sum squeezes the residual sum-cancellation risk).  This replaces
    the previous two-sided ``exceptAll`` check, which cost two extra
    full-shuffle jobs per table per round — the signature costs ZERO extra
    jobs because the metrics are collected by the checkpoint job itself.
    Hash columns interleave an isnull flag per column (hash fns SKIP nulls,
    so (1, NULL) and (NULL, 1) would otherwise collide); the decimal(38,0)
    sums cannot overflow below ~10¹⁸ rows.
    """
    parts = []
    for c in df.columns:
        parts.extend([df[c], F.isnull(df[c])])
    h1 = F.xxhash64(*parts).cast("decimal(38,0)")
    h2 = F.xxhash64(F.lit("pw-seed-2"), *parts).cast("decimal(38,0)")
    return [
        F.count(F.lit(1)).alias("n"),
        F.sum(h1).alias("s1"),
        F.sum(h2).alias("s2"),
    ]


def iterate(
    func: Callable[..., dict[str, Table] | Table],
    iteration_limit: int | None = None,
    **tables: Table,
):
    """Iterate ``func`` on ``tables`` until fixpoint or ``iteration_limit``.

    ``func(**tables)`` must return a dict with the same keys (or a single
    Table when one table was passed).  Returns the fixed point in the same
    shape.
    """
    from pyspark.sql import Observation

    def _ckpt_with_sig(df):
        obs = Observation()
        t = Table(
            df.observe(obs, *_multiset_signature_metrics(df)).localCheckpoint(
                eager=True
            )
        )
        m = obs.get
        return t, (m["n"], m["s1"], m["s2"])

    single = len(tables) == 1
    cur: dict[str, Table] = {}
    prev_sig: dict[str, tuple] = {}
    for k, v in tables.items():
        cur[k], prev_sig[k] = _ckpt_with_sig(v.df)
    rounds = 0
    while True:
        out = func(**cur)
        if isinstance(out, Table):
            if not single:
                raise ValueError("func must return a dict when given multiple tables")
            out = {next(iter(tables)): out}
        if set(out) != set(cur):
            raise ValueError(
                f"iterate: func must return exactly the input table keys "
                f"{sorted(cur)}, got {sorted(out)}"
            )
        nxt: dict[str, Table] = {}
        sig: dict[str, tuple] = {}
        for k, v in out.items():
            nxt[k], sig[k] = _ckpt_with_sig(v.df)
        rounds += 1
        converged = sig == prev_sig
        cur = nxt
        prev_sig = sig
        if converged or (iteration_limit is not None and rounds >= iteration_limit):
            break
    if single:
        return next(iter(cur.values()))
    return cur

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

from pathwaydataframework_spark.internals.table import Table


def _tables_equal(a: Table, b: Table) -> bool:
    adf, bdf = a.df, b.df
    # two-sided multiset difference — cheap on checkpointed inputs
    return adf.exceptAll(bdf).isEmpty() and bdf.exceptAll(adf).isEmpty()


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
    single = len(tables) == 1
    cur = {k: Table(v.df.localCheckpoint(eager=True)) for k, v in tables.items()}
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
        nxt = {k: Table(v.df.localCheckpoint(eager=True)) for k, v in out.items()}
        rounds += 1
        converged = all(_tables_equal(cur[k], nxt[k]) for k in nxt)
        cur = nxt
        if converged or (iteration_limit is not None and rounds >= iteration_limit):
            break
    if single:
        return next(iter(cur.values()))
    return cur

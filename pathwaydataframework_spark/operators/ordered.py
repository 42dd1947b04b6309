"""Ordered / analytic operators.

Reference equivalents (SURVEY.md §2.5):
- ``Table.sort(key, instance)`` → prev/next pointer columns
  (reference table.py:2157; engine sort_table graph.rs:854, DD op
  prev_next.rs:770 — ~800 LoC of custom dataflow).  In Spark this is just
  ``lag/lead over Window.partitionBy(instance).orderBy(key)`` — a single
  shuffle on the instance key, sorted within partitions, no custom operator.
- ``Table.diff`` (stdlib/ordered/diff.py:10)
- ``Table.interpolate`` (stdlib/statistical/_interpolate.py:33)
- top-k (absent in the reference; standard row_number pattern).

Scale note: a window with ``partitionBy(instance)`` distributes by instance —
fine at 100 TB when instances are plentiful.  A window with NO partition key
funnels everything through one task; we only allow that for explicitly-small
data (interpolate over a global series), and document it.
"""

from __future__ import annotations

import enum as _enum

import pyspark.sql.functions as F
from pyspark.sql import Window

from pathwaydataframework_spark.internals.expression import lift
from pathwaydataframework_spark.internals.table import Table


def _window(table: Table, order_expr, instance, descending: bool = False):
    order_col = table._resolve(order_expr)
    if descending:
        order_col = order_col.desc()
    if instance is not None:
        return Window.partitionBy(table._resolve(instance)).orderBy(order_col)
    return Window.partitionBy().orderBy(order_col)


def sort(table: Table, key, instance=None) -> Table:
    """Add ``prev``/``next`` row-pointer columns (reference table.py:2157)."""
    w = _window(table, key, instance)
    df = table.materialize_id()._df
    from pathwaydataframework_spark.internals.table import ID_COL

    out = df.withColumns(
        {
            "prev": F.lag(F.col(ID_COL)).over(w),
            "next": F.lead(F.col(ID_COL)).over(w),
        }
    )
    return Table(out)


def diff(table: Table, timestamp, *values, instance=None) -> Table:
    """value − previous value, ordered by timestamp (diff.py:10).

    Output columns are named ``diff_<col>`` like the reference.
    """
    w = _window(table, timestamp, instance)
    mapping = {}
    for v in values:
        col = table._resolve(v)
        name = v.name if hasattr(v, "name") else str(v)
        mapping[f"diff_{name}"] = col - F.lag(col).over(w)
    return Table(table._df.withColumns(mapping), table._id_cols)


class InterpolateMode(_enum.Enum):
    """Reference stdlib/statistical/_interpolate.py:28."""

    LINEAR = 0


def interpolate(table: Table, timestamp, *values, mode="linear") -> Table:
    """Linear interpolation of null values over time
    (stdlib/statistical/_interpolate.py:33).

    Global ordering (the reference's interpolate has no instance either) —
    intended for series that fit a single partition; for partitioned series
    compose with groupby-style instance manually.
    """
    if isinstance(mode, InterpolateMode):
        mode = mode.name.lower()
    if mode != "linear":
        raise ValueError("only linear interpolation is supported")
    from pathwaydataframework_spark.operators.temporal import _epoch_seconds

    t = table._resolve(timestamp)
    # Both directions use RUNNING frames (unboundedPreceding → current):
    # Spark evaluates those incrementally in O(n), while an
    # (0, unboundedFollowing) frame re-scans current→end per row — O(n²),
    # ~10 s for a 10k-row series.  "Next non-null" is therefore "last
    # non-null over the DESC ordering", at the cost of one extra sort of
    # the same partition (still O(n log n) total).
    w_prev = Window.partitionBy().orderBy(t.asc()).rowsBetween(Window.unboundedPreceding, 0)
    w_next = (
        Window.partitionBy().orderBy(t.desc()).rowsBetween(Window.unboundedPreceding, 0)
    )
    tsec = _epoch_seconds(t)
    mapping = {}
    for v in values:
        col = table._resolve(v)
        name = v.name if hasattr(v, "name") else str(v)
        pv = F.last(col, ignorenulls=True).over(w_prev)
        nv = F.last(col, ignorenulls=True).over(w_next)
        pt = F.last(F.when(col.isNotNull(), tsec), ignorenulls=True).over(w_prev)
        nt = F.last(F.when(col.isNotNull(), tsec), ignorenulls=True).over(w_next)
        interp = F.when(col.isNotNull(), col).otherwise(
            F.when(pv.isNull(), nv)
            .when(nv.isNull(), pv)
            .when(nt == pt, pv)
            .otherwise(pv + (nv - pv) * (tsec - pt) / (nt - pt))
        )
        mapping[name] = interp
    return Table(table._df.withColumns(mapping), table._id_cols)


def topk(table: Table, k: int, order_by, *, instance=None, descending: bool = True) -> Table:
    """Top-k rows per instance — row_number over a partitioned window.

    At scale this is the right plan: one shuffle on instance, per-partition
    sort, early-stop at k via the rank filter (Spark pushes a
    WindowGroupLimit when AQE sees the rank predicate).
    """
    w = _window(table, order_by, instance, descending=descending)
    out = (
        table._df.withColumn("__pw_rank", F.row_number().over(w))
        .filter(F.col("__pw_rank") <= k)
        .drop("__pw_rank")
    )
    return Table(out, table._id_cols)


def retrieve_prev_next_values(table: Table, key, value, instance=None) -> Table:
    """Reference stdlib/indexing/sorting.py:195 — prev/next *values*."""
    w = _window(table, key, instance)
    col = table._resolve(value)
    out = table._df.withColumns(
        {
            "prev_value": F.lag(col).over(w),
            "next_value": F.lead(col).over(w),
        }
    )
    return Table(out, table._id_cols)

"""Aggregation reducers — reference ``internals/reducers.py`` /
``src/engine/reduce.rs:22`` (Count, FloatSum, IntSum, ArraySum, Unique, Min,
ArgMin, Max, ArgMax, SortedTuple, Tuple, Any, Earliest, Latest).

Each reducer is a :class:`ReducerExpr`: an :class:`Expr` whose resolution
yields an *aggregate* Spark Column, so post-aggregation arithmetic like
``reducers.sum(x) / reducers.count()`` composes naturally (the reference
needs an expression splitter for this — ``internals/groupbys.py:369``; in
Catalyst expressions-over-aggregates are native).

All reducers lower to JVM hash-aggregates with map-side partial aggregation —
no Python in the hot path — so they scale linearly with executors.
"""

from __future__ import annotations

from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import Column

from pathwaydataframework_spark.internals.expression import (
    Expr,
    FuncExpr,
    ResolutionContext,
    lift,
)


class ReducerExpr(Expr):
    """Marker base: resolves to an aggregate Column."""


class _Agg(ReducerExpr):
    def __init__(self, fn, *children: Expr):
        self._fn = fn
        self._children = children

    def _resolve(self, ctx: ResolutionContext) -> Column:
        return self._fn(*[c._resolve(ctx) for c in self._children], ctx=ctx)


def _no_ctx(fn):
    return lambda *cols, ctx: fn(*cols)


def count() -> ReducerExpr:
    """reducers.py:552 → F.count."""
    return _Agg(lambda ctx: F.count(F.lit(1)))


def sum(expr) -> ReducerExpr:
    """reducers.py:317 (int/float dispatch is implicit in Spark)."""
    return _Agg(_no_ctx(F.sum), lift(expr))


def avg(expr) -> ReducerExpr:
    """reducers.py:586."""
    return _Agg(_no_ctx(F.avg), lift(expr))


def min(expr) -> ReducerExpr:
    return _Agg(_no_ctx(F.min), lift(expr))


def max(expr) -> ReducerExpr:
    return _Agg(_no_ctx(F.max), lift(expr))


def argmin(expr) -> ReducerExpr:
    """Row id of the minimum — reference reducers.py:360.

    Lowered to ``F.min_by(_pw_id, value)``; the id column comes from the
    grouping context (deterministic xxhash64 of the row, see table.py).
    """
    a = _Agg(lambda c, ctx: F.min_by(ctx.id_column(), c), lift(expr))
    # markers for the Table.ix(argmin(...), context=pw.this).col sugar
    a._arg_kind = "min"
    a._arg_value = lift(expr)
    return a


def argmax(expr) -> ReducerExpr:
    """reducers.py:393 → F.max_by(_pw_id, value)."""
    a = _Agg(lambda c, ctx: F.max_by(ctx.id_column(), c), lift(expr))
    a._arg_kind = "max"
    a._arg_value = lift(expr)
    return a


def min_by(value, key) -> ReducerExpr:
    """Extension: value at the minimum key (deterministic argmin projection)."""
    return _Agg(_no_ctx(F.min_by), lift(value), lift(key))


def max_by(value, key) -> ReducerExpr:
    return _Agg(_no_ctx(F.max_by), lift(value), lift(key))


def unique(expr) -> ReducerExpr:
    """All values equal, else error — reference reducers.py:426.

    Spark has no per-cell Error value (SURVEY.md §7): non-unique groups yield
    null (detectable via ``remove_errors``-style filtering downstream).
    """
    # count_distinct skips nulls, so [1, null] would wrongly look unique;
    # require all rows non-null too (an all-null group IS uniform → null,
    # indistinguishable from the error marker — documented limitation)
    return _Agg(
        lambda c, ctx: F.when(
            (F.count_distinct(c) == 1) & (F.count(c) == F.count(F.lit(1))),
            F.min(c),
        ).otherwise(F.lit(None)),
        lift(expr),
    )


def any(expr) -> ReducerExpr:
    """Arbitrary value from the group (reducers.py:457). We pick min() so the
    result is deterministic and oracle-checkable."""
    return _Agg(_no_ctx(F.min), lift(expr))


def sorted_tuple(expr, skip_nones: bool = False) -> ReducerExpr:
    """reducers.py:485 → sort_array(collect_list).

    ``skip_nones=False`` (the default, matching the reference) KEEPS null
    values: collect_list drops them, so nulls ride inside single-field
    structs and unwrap after the sort (nulls first, Spark's sort_array
    null ordering)."""

    def _fn(c, ctx):
        if skip_nones:
            return F.sort_array(F.collect_list(c))
        return F.transform(
            F.sort_array(F.collect_list(F.struct(c.alias("v")))),
            lambda s: s["v"],
        )

    return _Agg(_fn, lift(expr))


def tuple(expr, sort_by=None, skip_nones: bool = False) -> ReducerExpr:
    """reducers.py:516: values ordered by ``sort_by`` (or unspecified order).

    Implemented as sort_array over (key, value) structs then projecting the
    value — one JVM aggregate, no UDF.
    """
    if sort_by is None:
        if skip_nones:
            return _Agg(_no_ctx(F.collect_list), lift(expr))
        # keep nulls (reference default): structs survive collect_list
        return _Agg(
            lambda c, ctx: F.transform(
                F.collect_list(F.struct(c.alias("v"))), lambda s: s["v"]
            ),
            lift(expr),
        )

    def _fn(c, k, ctx):
        pairs = F.sort_array(F.collect_list(F.struct(k.alias("k"), c.alias("v"))))
        return F.transform(pairs, lambda p: p["v"])

    return _Agg(_fn, lift(expr), lift(sort_by))


def ndarray(expr) -> ReducerExpr:
    """reducers.py:618 → array column."""
    return _Agg(_no_ctx(F.collect_list), lift(expr))


def earliest(expr, time) -> ReducerExpr:
    """Value at the minimum event time (reducers.py:653) → F.min_by."""
    return _Agg(_no_ctx(F.min_by), lift(expr), lift(time))


def latest(expr, time) -> ReducerExpr:
    """reducers.py:687 → F.max_by."""
    return _Agg(_no_ctx(F.max_by), lift(expr), lift(time))


def count_distinct(expr) -> ReducerExpr:
    """Extension (absent in reference; needed for analytics parity)."""
    return _Agg(_no_ctx(F.count_distinct), lift(expr))


def approx_count_distinct(expr, rsd: float = 0.05) -> ReducerExpr:
    """Extension: HLL sketch — the 100 TB-scale variant of count_distinct."""
    return _Agg(lambda c, ctx: F.approx_count_distinct(c, rsd), lift(expr))


def stddev(expr) -> ReducerExpr:
    return _Agg(_no_ctx(F.stddev_samp), lift(expr))


def hll_sketch(expr, lg_k: int = 12) -> ReducerExpr:
    """Extension: mergeable HyperLogLog sketch (Apache DataSketches HllSketch,
    Spark ``hll_sketch_agg``) as a BINARY column.  The rollup primitive for
    distinct counting at 100 TB: build one sketch per fine-grained group
    (day × source), store it, and answer ANY coarser distinct-count
    (month, all-sources) by :func:`hll_union` over the stored sketches —
    no rescan of the raw data.  Estimate with
    ``pathwaydataframework_spark.hll_estimate``."""
    return _Agg(lambda c, ctx: F.hll_sketch_agg(c, F.lit(lg_k)), lift(expr))


def hll_union(expr, allow_different_lgk: bool = False) -> ReducerExpr:
    """Extension: merge BINARY sketches produced by :func:`hll_sketch`
    (Spark ``hll_union_agg``) — the reduce side of the rollup."""
    return _Agg(
        lambda c, ctx: F.hll_union_agg(c, F.lit(allow_different_lgk)), lift(expr)
    )


def percentile(expr, p: float) -> ReducerExpr:
    """Extension: exact continuous-interpolation percentile (Spark
    ``percentile`` ≡ ANSI percentile_cont / DuckDB quantile_cont).  Exact
    needs the group's values collected per group — fine for grouped aggs,
    use :func:`approx_percentile` for global quantiles at 100 TB."""
    return _Agg(lambda c, ctx: F.percentile(c, F.lit(p)), lift(expr))


def approx_percentile(expr, p: float, accuracy: int = 10_000) -> ReducerExpr:
    """Extension: t-digest-style sketch quantile — the scale path
    (mergeable partial state, map-side combine)."""
    return _Agg(
        lambda c, ctx: F.percentile_approx(c, F.lit(p), F.lit(accuracy)), lift(expr)
    )


# deprecated aliases kept for API parity (reducers.py:547,611)
npsum = sum
int_sum = sum


def __getattr__(name):
    # the reference's pw.reducers module also exports the custom-reducer
    # trio (reference reducers.py:23-27); lazy to avoid an import cycle
    if name in ("stateful_many", "stateful_single", "udf_reducer",
                "BaseCustomAccumulator", "udaf_reduce"):
        from pathwaydataframework_spark.internals import custom_reducers

        return getattr(custom_reducers, name)
    raise AttributeError(name)

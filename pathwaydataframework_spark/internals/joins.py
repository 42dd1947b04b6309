"""Joins — reference ``internals/joins.py`` (Table.join :135, JoinResult
select/filter/groupby/reduce :643-808) / engine join_tables (graph.rs:932).

The reference supports only equi-joins (validate_join_condition,
joins.py:1071) and expresses theta predicates as ``join(...).filter(...)``.
We accept the same surface but lower to ``DataFrame.join`` so Catalyst picks
broadcast-hash / shuffled-hash / sort-merge per side sizes, and AQE re-plans
at runtime — strictly better than the reference's always-arrange-both-sides
strategy (dataflow.rs:2341).
"""

from __future__ import annotations

import itertools
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from pathwaydataframework_spark.internals.expression import (
    LEFT,
    RIGHT,
    THIS,
    BinOp,
    ColumnRef,
    Expr,
    ResolutionContext,
    lift,
)

_alias_counter = itertools.count()

_HOW = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "outer": "full_outer",
    "full": "full_outer",
}


class JoinContext(ResolutionContext):
    def __init__(self, left_table, right_table, lalias: str, ralias: str):
        self._lt, self._rt = left_table, right_table
        self._la, self._ra = lalias, ralias

    def resolve_ref(self, ref: ColumnRef) -> Column:
        owner = ref.owner
        # chained joins (reference Joinable: JoinResult.join): a side built
        # by _flat_table carries its source tables, so refs owned by the
        # ORIGINAL tables keep resolving through the chain
        lsrc = getattr(self._lt, "_join_sources", ())
        rsrc = getattr(self._rt, "_join_sources", ())
        if owner is LEFT or owner is self._lt or owner in lsrc:
            return F.col(f"{self._la}.{ref.name}")
        if owner is RIGHT or owner is self._rt or owner in rsrc:
            return F.col(f"{self._ra}.{ref.name}")
        if owner is THIS:
            # unqualified: prefer unambiguous side
            in_l = ref.name in self._lt._df.columns
            in_r = ref.name in self._rt._df.columns
            if in_l and in_r:
                raise ValueError(f"ambiguous column {ref.name!r}; use pw.left/pw.right")
            if in_l:
                return F.col(f"{self._la}.{ref.name}")
            if in_r:
                return F.col(f"{self._ra}.{ref.name}")
        raise ValueError(f"cannot resolve {ref.name!r} in join")

    def id_column(self, owner: Any = THIS) -> Column:
        raise NotImplementedError("argmin/argmax over a join: select first, then group")

    def probe_df(self):
        # analysis-only frame with both aliases visible; never executed
        return self._lt._df.alias(self._la).crossJoin(self._rt._df.alias(self._ra))


class JoinResult:
    """Lazy join: materialized on .select()/.reduce() so late projection can
    prune columns before the shuffle (Catalyst does the pruning)."""

    def __init__(self, left_table, right_table, on: tuple, how: str, id=None):
        self._lt = left_table
        self._rt = right_table
        self._on = on
        self._how = _HOW[how]
        self._id = id
        n = next(_alias_counter)
        self._la, self._ra = f"__pwl{n}", f"__pwr{n}"
        self._ctx = JoinContext(left_table, right_table, self._la, self._ra)
        self._filters: list[Expr] = []

    def _cond(self) -> Column | None:
        cond = None
        for e in self._on:
            c = lift(e)._resolve(self._ctx)
            cond = c if cond is None else (cond & c)
        return cond

    def _joined(self) -> DataFrame:
        ldf = self._lt._df.alias(self._la)
        rdf = self._rt._df.alias(self._ra)
        cond = self._cond()
        if cond is None:
            out = ldf.crossJoin(rdf)
        else:
            out = ldf.join(rdf, cond, self._how)
        for f in self._filters:
            out = out.filter(lift(f)._resolve(self._ctx))
        return out

    def filter(self, expr) -> "JoinResult":
        """Theta predicates post equi-join — reference joins.py:693."""
        out = JoinResult(self._lt, self._rt, self._on, "inner", id=self._id)
        out._la, out._ra, out._ctx, out._how = self._la, self._ra, self._ctx, self._how
        out._filters = self._filters + [expr]
        return out

    def _flat_table(self):
        """Flatten this join into a Table for chaining — reference
        JoinResult is Joinable (joins.py:493), so ``t1.join(t2).join(t3)``
        works.  The flat table remembers its source tables so refs owned by
        t1/t2 still resolve in the NEXT join's conditions and select."""
        from pathwaydataframework_spark.internals.table import Table

        # equal-named equi-key columns merge into ONE output column, like
        # the reference's common_column_names handling (joins.py:977);
        # coalesce covers the outer modes' padded side
        common: set[str] = set()
        for e in self._on:
            if (
                isinstance(e, BinOp)
                and isinstance(e._l, ColumnRef)
                and isinstance(e._r, ColumnRef)
                and e._l.name == e._r.name
            ):
                common.add(e._l.name)
        lcols = self._lt._df.columns
        rcols = self._rt._df.columns
        out_cols: list[Column] = []
        names: list[str] = []
        for c in lcols:
            if c in common and c in rcols:
                out_cols.append(
                    F.coalesce(
                        F.col(f"{self._la}.{c}"), F.col(f"{self._ra}.{c}")
                    ).alias(c)
                )
            else:
                out_cols.append(F.col(f"{self._la}.{c}").alias(c))
            names.append(c)
        for c in rcols:
            if c in common and c in lcols:
                continue
            out_cols.append(F.col(f"{self._ra}.{c}").alias(c))
            names.append(c)
        dupes = sorted({n for n in names if names.count(n) > 1})
        if dupes:
            raise ValueError(
                f"cannot chain join over ambiguous columns {dupes}; "
                "project them apart with .select() first"
            )
        if self._id is not None:
            # thread join(id=side.id) through chaining: the flat table
            # carries the promised row id so downstream ix/update_rows —
            # or the next join in the chain — still see it.
            from pathwaydataframework_spark.internals.table import ID_COL

            out_cols.append(lift(self._id)._resolve(self._ctx).alias(ID_COL))
        t = Table(self._joined().select(*out_cols))
        t._join_sources = (
            (self._lt, self._rt)
            + tuple(getattr(self._lt, "_join_sources", ()))
            + tuple(getattr(self._rt, "_join_sources", ()))
        )
        return t

    def join(self, other, *on, how: str = "inner", id=None,
             left_instance=None, right_instance=None) -> "JoinResult":
        """Chained join — reference Joinable.join over a JoinResult."""
        return join(
            self._flat_table(), other, *on, how=how, id=id,
            left_instance=left_instance, right_instance=right_instance,
        )

    def join_inner(self, other, *on, **kw) -> "JoinResult":
        return self.join(other, *on, how="inner", **kw)

    def join_left(self, other, *on, **kw) -> "JoinResult":
        return self.join(other, *on, how="left", **kw)

    def join_right(self, other, *on, **kw) -> "JoinResult":
        return self.join(other, *on, how="right", **kw)

    def join_outer(self, other, *on, **kw) -> "JoinResult":
        return self.join(other, *on, how="outer", **kw)

    def select(self, *args, **kwargs):
        """Reference joins.py:643."""
        from pathwaydataframework_spark.internals.table import Table

        cols: list[Column] = []
        for a in args:
            if isinstance(a, ColumnRef):
                cols.append(lift(a)._resolve(self._ctx).alias(a.name))
            else:
                raise TypeError("positional join-select args must be column refs")
        for name, e in kwargs.items():
            cols.append(lift(e)._resolve(self._ctx).alias(name))
        if self._id is not None:
            # join(..., id=side.id) keys the result by that side's row id
            # (reference joins.py:958-962) so downstream ix/update_rows see
            # the promised universe.
            from pathwaydataframework_spark.internals.table import ID_COL

            cols.append(lift(self._id)._resolve(self._ctx).alias(ID_COL))
        return Table(self._joined().select(*cols))

    def groupby(self, *cols, instance=None):
        """Reference joins.py:748 — join → groupBy without materializing an
        intermediate projection."""
        from pathwaydataframework_spark.internals.table import Table
        from pathwaydataframework_spark.internals.groupbys import GroupedTable

        if self._id is not None:
            # an aggregation replaces the join's universe with one keyed by
            # the grouping columns — honoring id= here has no meaning, and
            # silently dropping it would break the caller's keying promise
            raise NotImplementedError(
                "join(..., id=...) followed by groupby()/reduce() is not "
                "supported: the aggregation re-keys the result. Call "
                ".select() first if you need the join keyed by id."
            )
        named = []
        for r in cols:
            if not isinstance(r, ColumnRef):
                raise TypeError("groupby keys must be column refs")
            named.append(r)
        full = Table(self._joined())
        # keep the ORIGINAL side-qualified refs and the join's context:
        # resolving by bare name over the joined frame raises
        # AMBIGUOUS_REFERENCE whenever both sides share a column name
        keys = [(r.name, r) for r in named]
        return GroupedTable(full, keys, sort_by=None, ctx=self._ctx)

    def reduce(self, *args, **kwargs):
        from pathwaydataframework_spark.internals.table import Table
        from pathwaydataframework_spark.internals.groupbys import GroupedTable

        if self._id is not None:
            raise NotImplementedError(
                "join(..., id=...) followed by groupby()/reduce() is not "
                "supported: the aggregation re-keys the result. Call "
                ".select() first if you need the join keyed by id."
            )
        return GroupedTable(Table(self._joined()), [], ctx=self._ctx).reduce(
            *args, **kwargs
        )


def join(
    left_table,
    right_table,
    *on,
    how: str = "inner",
    id=None,
    left_instance=None,
    right_instance=None,
) -> JoinResult:
    how = getattr(how, "value", how)  # accept pw.JoinMode enum anywhere
    if how not in _HOW:
        raise ValueError(f"how must be one of {sorted(_HOW)}")
    # either side may itself be a JoinResult (reference Joinable.join):
    # flatten it, keeping source-table refs resolvable through the chain
    if isinstance(left_table, JoinResult):
        left_table = left_table._flat_table()
    if isinstance(right_table, JoinResult):
        right_table = right_table._flat_table()
    if left_table is right_table:
        # reference joins.py:946-949 — with one table OBJECT on both sides
        # a condition like t.foo == t.bar cannot be attributed to sides
        # (both refs resolve left); refuse rather than silently mis-join
        raise ValueError(
            "Cannot join table with itself. Use <table>.copy() as one of "
            "the arguments of the join."
        )
    if (left_instance is None) != (right_instance is None):
        # reference arg_handlers.py:160-164: both or neither
        raise ValueError(
            "`left_instance` and `right_instance` arguments to join "
            "should always be provided simultaneously"
        )
    if left_instance is not None:
        # reference joins.py:965-967: the instance pair is just one more
        # equi-condition — Catalyst folds it into the same hash key, so the
        # shuffle co-partitions by (on-keys, instance) exactly as the
        # reference's per-instance shards do.
        on = (*on, lift(left_instance) == lift(right_instance))
    return JoinResult(left_table, right_table, on, how, id=id)

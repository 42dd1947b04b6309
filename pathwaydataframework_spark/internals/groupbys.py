"""GroupedTable.reduce — reference ``internals/groupbys.py:71,158`` /
engine group_by_table (graph.rs:885).

Lowered to ``df.groupBy(...).agg(...)``: a hash aggregate with map-side
partial aggregation (the scalable plan — one shuffle keyed on the grouping
columns, no driver-side state).  Post-aggregate expressions (the reference's
``_ReducerExpressionSplitter``, groupbys.py:369) are native in Catalyst:
``reducers.sum(x)/reducers.count()`` resolves to a single Aggregate node.
"""

from __future__ import annotations

from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import Column

from pathwaydataframework_spark.internals.expression import (
    THIS,
    ColumnRef,
    Expr,
    ResolutionContext,
    lift,
)


class GroupedContext(ResolutionContext):
    def __init__(self, table):
        self._table = table

    def resolve_ref(self, ref: ColumnRef) -> Column:
        from pathwaydataframework_spark.internals.expression import LEFT, RIGHT

        owner = ref.owner
        if owner is THIS or owner is self._table:
            return self._table._df[ref.name]
        # grouping over a flattened join: pw.left/pw.right (or original-table
        # refs) resolve by name — join output column names are unique
        if ref.name in self._table._df.columns:
            return self._table._df[ref.name]
        raise ValueError(f"cannot resolve {ref.name!r} in groupby context")

    def id_column(self, owner: Any = THIS) -> Column:
        return self._table.id_expr()

    def probe_df(self):
        return self._table._df


class GroupedTable:
    def __init__(self, table, grouping: list, sort_by=None, ctx=None, set_id=False):
        self._table = table
        self._sort_by = sort_by
        # groupby(id=...): the single grouping column's values BECOME the
        # result row ids (reference table.py:985-997, groupbys.py _set_id)
        self._set_id = set_id
        # joins pass their side-aware context so pw.left/pw.right refs
        # resolve over a joined frame whose sides share column names
        self._ctx = ctx
        # grouping entries: ColumnRef (keeps name) or (name, Expr)
        self._grouping: list[tuple[str, Expr]] = []
        for g in grouping:
            if isinstance(g, ColumnRef):
                self._grouping.append((g.name, g))
            elif isinstance(g, str):
                self._grouping.append((g, ColumnRef(THIS, g)))
            elif isinstance(g, tuple) and len(g) == 2:
                self._grouping.append((g[0], lift(g[1])))
            else:
                raise TypeError(f"bad grouping key {g!r}")

    def _subset_reduce(self, aggs: dict):
        """Internal: run reduce() for a subset of the aggregate kwargs with
        the same grouping/sort/ctx (used to split pandas UDAFs from JVM
        aggregates)."""
        sub = GroupedTable.__new__(GroupedTable)
        sub._table = self._table
        sub._sort_by = self._sort_by
        sub._ctx = self._ctx
        sub._set_id = False
        sub._grouping = self._grouping
        return sub.reduce(**aggs)

    def reduce(self, *args, **kwargs):
        """Reference GroupedTable.reduce (groupbys.py:158).

        Positional args must be grouping columns; kwargs are reducer (or
        post-reducer) expressions.
        """
        from pathwaydataframework_spark.internals.table import Table

        ctx = self._ctx if self._ctx is not None else GroupedContext(self._table)
        group_cols = [e._resolve(ctx).alias(name) for name, e in self._grouping]
        group_names = [name for name, _ in self._grouping]

        out_cols: list[Column] = []
        for a in args:
            if isinstance(a, ColumnRef) and a.name in group_names:
                continue  # grouping cols are included automatically
            raise ValueError("positional reduce args must be grouping columns")

        # Spark cannot mix GROUPED_AGG pandas UDFs (udf_reducer) with JVM
        # aggregates in one agg() — split them into two aggregate passes
        # over the same keys and join null-safely on the group columns
        pandas_names = [
            n for n, e in kwargs.items() if getattr(e, "_pandas_udaf", False)
        ]
        if pandas_names and len(pandas_names) < len(kwargs):
            normal = {n: e for n, e in kwargs.items() if n not in pandas_names}
            pandas_part = {n: kwargs[n] for n in pandas_names}
            left = self._subset_reduce(normal)
            right = self._subset_reduce(pandas_part)
            from pathwaydataframework_spark.internals.table import Table

            names = [name for name, _ in self._grouping]
            if names:
                cond = None
                for n in names:
                    c = left._df[n].eqNullSafe(right._df[n])
                    cond = c if cond is None else (cond & c)
                joined = left._df.join(right._df, cond, "inner").select(
                    *[left._df[n] for n in names],
                    *[left._df[n] for n in normal],
                    *[right._df[n] for n in pandas_names],
                )
            else:
                joined = left._df.crossJoin(right._df)
            out = joined.select(*names, *list(kwargs.keys()))
            if self._set_id:
                from pathwaydataframework_spark.internals.table import ID_COL

                # same keying as the single-pass path below: groupby(id=ptr)
                # must survive the pandas/JVM split too
                out = out.withColumn(ID_COL, F.col(names[0]).cast("long"))
            return Table(out)

        agg_cols: list[Column] = []
        for name, e in kwargs.items():
            agg_cols.append(lift(e)._resolve(ctx).alias(name))

        df = self._table._df
        if self._sort_by is not None and group_cols:
            # honor groupby(sort_by=...): repartition on the grouping keys
            # and sort within partitions BEFORE the aggregation — the hash
            # aggregate then consumes rows in that order, so order-sensitive
            # reducers (tuple/ndarray/collect_list) see the declared order.
            # The explicit exchange replaces (not adds to) the groupBy's own
            # shuffle; the window alternative would be a second exchange.
            sort_col = lift(self._sort_by)._resolve(ctx)
            df = df.repartition(
                *[e._resolve(ctx) for _, e in self._grouping]
            ).sortWithinPartitions(sort_col)
        if group_cols:
            out = df.groupBy(*group_cols).agg(*agg_cols) if agg_cols else df.groupBy(
                *group_cols
            ).agg(F.count(F.lit(1)).alias("__pw_cnt")).drop("__pw_cnt")
            # keep only requested columns, grouping first
            out = out.select(*group_names, *list(kwargs.keys()))
        else:
            out = df.agg(*agg_cols)
        if self._set_id:
            from pathwaydataframework_spark.internals.table import ID_COL

            # the (single) grouping column is a pointer; its value is the
            # result row id — downstream ix/joins see the promised universe
            key_name = group_names[0]
            out = out.withColumn(ID_COL, F.col(key_name).cast("long"))
        return Table(out)

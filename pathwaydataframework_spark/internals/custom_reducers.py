"""Custom reducers / UDAFs — reference ``internals/custom_reducers.py``
(stateful_many :35, stateful_single :108, BaseCustomAccumulator :174,
udf_reducer :271).

Arbitrary Python aggregation logic can't be a JVM hash-agg, so these lower
to ``applyInPandas``: one shuffle on the grouping key, then the accumulator
runs per group over Arrow batches.  Retraction (``retract``) only matters
for streaming update-mode and lands with the streaming round — batch tables
are insert-only, exactly like the reference's batch execution.
"""

from __future__ import annotations

from typing import Any, Callable

from pathwaydataframework_spark.internals.expression import ColumnRef
from pathwaydataframework_spark.internals.table import Table


class BaseCustomAccumulator:
    """Subclass with ``from_row(row) -> acc``, ``update(other_acc)``,
    ``compute_result() -> value`` — reference custom_reducers.py:174."""

    @classmethod
    def from_row(cls, row: list):  # pragma: no cover — abstract
        raise NotImplementedError

    def update(self, other) -> None:  # pragma: no cover — abstract
        raise NotImplementedError

    def retract(self, other) -> None:
        raise NotImplementedError("retraction is a streaming-only concern")

    def compute_result(self) -> Any:  # pragma: no cover — abstract
        raise NotImplementedError


def udaf_reduce(
    table: Table,
    *,
    instance,
    accumulator: type[BaseCustomAccumulator],
    value_cols: list,
    result_name: str = "result",
    result_type: str = "double",
) -> Table:
    """Reference ``udf_reducer`` semantics: fold every group's rows through
    the accumulator; output (instance, result)."""
    iname = instance.name if isinstance(instance, ColumnRef) else instance
    vnames = [c.name if isinstance(c, ColumnRef) else c for c in value_cols]
    schema = f"{iname} {dict(table.df.dtypes)[iname]}, {result_name} {result_type}"

    def _apply(pdf):
        import pandas as pd

        acc = None
        for row in pdf[vnames].itertuples(index=False):
            cur = accumulator.from_row(list(row))
            if acc is None:
                acc = cur
            else:
                acc.update(cur)
        return pd.DataFrame(
            [{iname: pdf[iname].iloc[0], result_name: acc.compute_result()}]
        )

    return Table(table.df.groupBy(iname).applyInPandas(_apply, schema))


def stateful_many(
    table: Table,
    *,
    instance,
    combine: Callable[[Any, list[list]], Any],
    value_cols: list,
    result_name: str = "result",
    result_type: str = "double",
) -> Table:
    """Reference ``stateful_many`` (custom_reducers.py:35): fold a batch of
    rows into a state with an arbitrary Python function
    ``combine(state, rows) -> state``; the final state is the result."""
    iname = instance.name if isinstance(instance, ColumnRef) else instance
    vnames = [c.name if isinstance(c, ColumnRef) else c for c in value_cols]
    schema = f"{iname} {dict(table.df.dtypes)[iname]}, {result_name} {result_type}"

    def _apply(pdf):
        import pandas as pd

        rows = [list(r) for r in pdf[vnames].itertuples(index=False)]
        state = combine(None, rows)
        return pd.DataFrame([{iname: pdf[iname].iloc[0], result_name: state}])

    return Table(table.df.groupBy(iname).applyInPandas(_apply, schema))


def stateful_single(
    table: Table,
    *,
    instance,
    combine: Callable[[Any, list], Any],
    value_cols: list,
    result_name: str = "result",
    result_type: str = "double",
) -> Table:
    """Reference ``stateful_single`` (custom_reducers.py:108): per-row fold."""

    def many(state, rows):
        for r in rows:
            state = combine(state, r)
        return state

    return stateful_many(
        table,
        instance=instance,
        combine=many,
        value_cols=value_cols,
        result_name=result_name,
        result_type=result_type,
    )

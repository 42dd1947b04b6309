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


_PY2SPARK = {float: "double", int: "bigint", str: "string", bool: "boolean"}
_STR2PY = {"float": float, "int": int, "str": str, "bool": bool}


def udf_reducer(reducer_cls: type[BaseCustomAccumulator]):
    """Reference custom_reducers.py:271 — decorator turning a
    BaseCustomAccumulator subclass into a reducer usable inside the normal
    ``groupby(...).reduce(name=reducer(expr, ...))`` call shape.

    Lowered to a GROUPED_AGG (series-to-scalar) pandas UDF: Spark's hash
    aggregate ships each group's argument columns as Arrow batches, the
    accumulator folds them (``from_row`` then ``update``), and the scalar
    ``compute_result`` comes back as the aggregate value — so the custom
    reducer composes with built-in reducers in the same ``.reduce()``.
    The result dtype follows ``compute_result``'s return annotation
    (reference behavior); ``retract``/``neutral`` are streaming-only
    refinements and are not consulted in batch folds.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ret = getattr(reducer_cls.compute_result, "__annotations__", {}).get(
        "return", float
    )
    if isinstance(ret, str):
        ret = _STR2PY.get(ret, float)
    spark_type = _PY2SPARK.get(ret, "double")

    def make(*exprs):
        from pathwaydataframework_spark.internals.expression import lift
        from pathwaydataframework_spark.internals.reducers import _Agg

        n = max(len(exprs), 1)

        def _fold_impl(*cols):
            acc = None
            for row in zip(*cols):
                cur = reducer_cls.from_row(list(row))
                if acc is None:
                    acc = cur
                else:
                    acc.update(cur)
            return None if acc is None else acc.compute_result()

        args = ", ".join(f"c{i}" for i in range(n))
        ns: dict = {"_fold_impl": _fold_impl}
        exec(f"def _fold({args}):\n    return _fold_impl({args})\n", ns)
        fold = ns["_fold"]
        # real annotation objects: (pd.Series, ...) -> scalar marks the UDF
        # as SERIES_TO_SCALAR (grouped aggregate) for pandas_udf inference
        fold.__annotations__ = {f"c{i}": pd.Series for i in range(n)}
        fold.__annotations__["return"] = ret if ret in _PY2SPARK else float
        udf = pandas_udf(fold, spark_type)
        agg = _Agg(lambda *cs, ctx: udf(*cs), *[lift(e) for e in exprs])
        # Spark forbids GROUPED_AGG pandas UDFs beside JVM aggregates in
        # one agg() (INVALID_PANDAS_UDF_PLACEMENT) — GroupedTable.reduce
        # splits on this marker and joins the two aggregate passes
        agg._pandas_udaf = True
        return agg

    return make

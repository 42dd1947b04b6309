"""Reference stdlib/utils/filtering.py — keep each group's argmax/argmin
row.  One window per call, deterministic tie-break on the full row's id."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window as W

from pathwaydataframework_spark.internals.expression import ColumnRef
from pathwaydataframework_spark.internals.table import Table


def _rows_by(table: Table, on, what, descending: bool) -> Table:
    keys = [table._resolve(c) for c in on]
    val = table._resolve(what)
    order = [val.desc() if descending else val.asc(), table.id_expr().asc()]
    w = W.partitionBy(*keys).orderBy(*order)
    df = (
        table._df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return Table(df, table._id_cols)


def argmax_rows(table: Table, *on, what) -> Table:
    """Reference filtering.py:8."""
    return _rows_by(table, on, what, descending=True)


def argmin_rows(table: Table, *on, what) -> Table:
    """Reference filtering.py:20."""
    return _rows_by(table, on, what, descending=False)

"""Column/table utilities — reference ``stdlib/utils/col.py``:
``unpack_col`` (:60), ``flatten_column`` (:16), ``groupby_reduce_majority``
(:326), ``apply_all_rows`` (:276).
"""

from __future__ import annotations

from typing import Callable

import pyspark.sql.functions as F

from pathwaydataframework_spark.internals.expression import ColumnRef
from pathwaydataframework_spark.internals.table import Table


def unpack_col(table: Table, col, *names: str) -> Table:
    """Split a struct/array column into named columns — reference col.py:60."""
    name = col.name if isinstance(col, ColumnRef) else col
    df = table.df
    dtype = dict(df.dtypes)[name]
    others = [c for c in df.columns if c != name]
    if dtype.startswith("struct"):
        if names:
            cols = [F.col(f"{name}.{f}").alias(n) for f, n in zip(
                [f.name for f in df.schema[name].dataType.fields], names
            )]
        else:
            cols = [F.col(f"{name}.*")]
        return Table(df.select(*others, *cols))
    # array column: positional unpack
    cols = [F.element_at(F.col(name), i + 1).alias(n) for i, n in enumerate(names)]
    return Table(df.select(*others, *cols))


def flatten_column(table: Table, col, origin_id: str | None = None) -> Table:
    """Explode an iterable column — reference col.py:16 (alias of
    Table.flatten with the reference's legacy name)."""
    return table.flatten(col, origin_id=origin_id)


def groupby_reduce_majority(table: Table, key, value) -> Table:
    """Majority value per key — reference col.py:326.

    mode() as two hash-aggs: count per (key, value), then max_by(value,
    (count, value)) per key — deterministic tie-break on the larger value.
    """
    kname = key.name if isinstance(key, ColumnRef) else key
    vname = value.name if isinstance(value, ColumnRef) else value
    counts = table.df.groupBy(kname, vname).agg(F.count(F.lit(1)).alias("__c"))
    out = counts.groupBy(kname).agg(
        F.max_by(F.col(vname), F.struct(F.col("__c"), F.col(vname))).alias("majority")
    )
    return Table(out)


def apply_all_rows(
    table: Table, *cols, fun: Callable, result_col_name: str, schema: str | None = None
) -> Table:
    """Apply a Python function over ALL rows' values at once — reference
    col.py:276 (used for whole-column transforms like PCA).

    Lowered to ``mapInPandas`` so each Arrow batch crosses once; the
    function receives per-column lists and returns a list of results.  For
    genuinely global functions (needing every row together) this collapses
    to one partition — the reference has the same constraint (single-node
    UDF state).
    """
    names = [c.name if isinstance(c, ColumnRef) else c for c in cols]
    df = table.df.coalesce(1)
    out_schema = f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)}, {result_col_name} {schema or 'double'}"

    def _mapper(batches):
        import pandas as pd

        pdf = pd.concat(list(batches), ignore_index=True)
        args = [pdf[n].tolist() for n in names]
        pdf[result_col_name] = fun(*args)
        yield pdf

    return Table(df.mapInPandas(_mapper, out_schema))

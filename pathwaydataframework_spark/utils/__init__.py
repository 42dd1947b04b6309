"""Reference ``pathway.stdlib.utils`` package parity (reference
stdlib/utils/__init__.py): col / bucketing / filtering /
async_transformer / pandas_transformer submodules, with the col helpers
also exported flat (as our earlier alias did)."""

from __future__ import annotations

from pathwaydataframework_spark.operators import col_utils as col  # noqa: F401
from pathwaydataframework_spark.operators.col_utils import (  # noqa: F401
    apply_all_rows,
    flatten_column,
    groupby_reduce_majority,
    unpack_col,
)

from . import bucketing, filtering  # noqa: F401,E402
from . import async_transformer, pandas_transformer  # noqa: F401,E402

__all__ = [
    "col",
    "bucketing",
    "filtering",
    "async_transformer",
    "pandas_transformer",
    "apply_all_rows",
    "flatten_column",
    "groupby_reduce_majority",
    "unpack_col",
]

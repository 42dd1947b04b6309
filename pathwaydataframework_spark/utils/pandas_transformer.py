"""Reference stdlib/utils/pandas_transformer.py — module alias; the
decorator lives in compat.py."""

from __future__ import annotations

from pathwaydataframework_spark.compat import pandas_transformer  # noqa: F401

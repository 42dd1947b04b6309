"""Plan-inspection utilities.

The reference exposes its dataflow graph only implicitly; on Spark the
logical/physical plan is first-class.  These helpers are used by tests and
benchmarks to assert that the *right* plan was produced (filters pushed to
the scan, joins broadcast when a side is small, no unexpected shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def assert_pushed_filters(df: DataFrame) -> bool:
    """True when the physical plan shows parquet PushedFilters."""
    return "PushedFilters: [" in formatted_plan(df)


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle Exchange NODES in the physical plan.

    Counts only the detail-section headers ``(n) Exchange`` so each node is
    counted once (the formatted output also repeats every node in the tree
    sketch), and excludes BroadcastExchange — a broadcast is not a shuffle.
    """
    import re

    return len(re.findall(r"\(\d+\) Exchange\b", formatted_plan(df)))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")

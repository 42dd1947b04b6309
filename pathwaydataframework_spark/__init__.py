"""pathwaydataframework_spark — a PySpark-native engine with the query
surface of bhardwajDeepik21/PathwayDataFramework.

Usage mirrors the reference's ``import pathway as pw``::

    import pathwaydataframework_spark as pw

    spark = pw.get_spark()
    t = pw.Table.from_parquet(spark, ".../lineitem.parquet")
    out = (
        t.filter(pw.this.l_quantity > 0)
         .groupby(pw.this.l_returnflag)
         .reduce(n=pw.reducers.count(), qty=pw.reducers.sum(pw.this.l_quantity))
    )
    out.df.show()

Design: tables are thin façades over ``pyspark.sql.DataFrame``; expressions
lower to Catalyst ``Column`` trees; every operator picks the physical plan
that scales (SURVEY.md §7).
"""

from __future__ import annotations

from pathwaydataframework_spark.internals import reducers
from pathwaydataframework_spark.internals.expression import (
    ColumnRef,
    Expr,
    apply,
    apply_with_type,
    cast,
    coalesce,
    declare_type,
    fill_error,
    hll_estimate,
    if_else,
    left,
    lift,
    make_tuple,
    require,
    right,
    this,
    unwrap,
)
from pathwaydataframework_spark.internals.schema import (
    DateTimeNaive,
    DateTimeUtc,
    Duration,
    Json,
    Pointer,
    PyObjectWrapper,
    Schema,
    assert_table_has_schema,
    column_definition,
    schema_builder,
    schema_from_csv,
    schema_from_dict,
    schema_from_pandas,
    schema_from_types,
    unwrap_py_object,
    wrap_py_object,
)
from pathwaydataframework_spark.internals.table import Table
from pathwaydataframework_spark.internals.udfs import (
    UDF,
    ExponentialBackoffRetryStrategy,
    FixedDelayRetryStrategy,
    DiskCache,
    InMemoryCache,
    apply_with_disk_cache,
    udf,
)
from pathwaydataframework_spark.internals import custom_reducers
from pathwaydataframework_spark.internals.custom_reducers import BaseCustomAccumulator
from pathwaydataframework_spark.operators import (
    behaviors,
    clustering,
    col_utils,
    decontam,
    dedup,
    embedders,
    graphs,
    ml_index,
    multimodal,
    ordered,
    packing,
    parsers,
    ranking,
    rerankers,
    sampling,
    similarity,
    splitters,
    stateful,
    text,
)
from pathwaydataframework_spark.operators.behaviors import (
    common_behavior,
    exactly_once_behavior,
    inactivity_detection,
)
from pathwaydataframework_spark.operators import temporal
from pathwaydataframework_spark.operators.iterate import iterate
from pathwaydataframework_spark.operators.temporal import (
    asof_join,
    asof_now_join,
    interval,
    interval_join,
    intervals_over,
    session,
    sliding,
    tumbling,
    window_join,
    windowby,
)
from pathwaydataframework_spark.spark_session import get_spark
from pathwaydataframework_spark import asynchronous
from pathwaydataframework_spark.compat import (
    AsofJoinResult,
    SchemaProperties,
    GroupedJoinResult,
    GroupedTable,
    IntervalJoinResult,
    JoinMode,
    JoinResult,
    Joinable,
    MonitoringLevel,
    OuterJoinResult,
    PersistenceMode,
    TableLike,
    TableSlice,
    Type,
    WindowJoinResult,
    global_error_log,
    iterate_universe,
    load_yaml,
    local_error_log,
    pandas_transformer,
    set_monitoring_config,
    table_transformer,
)
from pathwaydataframework_spark.operators import temporal as window  # pw.window alias

# bind the reference's Table-level temporal method variants (reference
# __init__.py:252-265 does the same monkey-binding)
from pathwaydataframework_spark.internals.table import _bind_temporal_methods as _btm
_btm()
del _btm
from pathwaydataframework_spark.sql import sql
from pathwaydataframework_spark import sources as io
from pathwaydataframework_spark.sources import debug
from pathwaydataframework_spark.sources import demo
from pathwaydataframework_spark import persistence
from pathwaydataframework_spark import universes
from pathwaydataframework_spark import monitoring


# reference free-function forms of the Table methods (pathway/__init__.py
# exports join/groupby at module level; they desugar to method calls)
def join(left, right, *on, how: str = "inner", id=None,
         left_instance=None, right_instance=None):
    return left.join(
        right, *on, how=how, id=id,
        left_instance=left_instance, right_instance=right_instance,
    )


def join_inner(left, right, *on, **kw):
    return left.join(right, *on, how="inner", **kw)


def join_left(left, right, *on, **kw):
    return left.join(right, *on, how="left", **kw)


def join_right(left, right, *on, **kw):
    return left.join(right, *on, how="right", **kw)


def join_outer(left, right, *on, **kw):
    return left.join(right, *on, how="outer", **kw)


def set_license_key(key=None, *args, **kwargs) -> None:
    """Reference ``pw.set_license_key`` — licensing configures the hosted
    runtime there; this engine has no license-gated paths, so the call is
    an accepted no-op kept for ported-code compatibility."""
    return None


def groupby(table, *cols, **kwargs):
    return table.groupby(*cols, **kwargs)


def run(spark=None, timeout: float | None = None) -> None:
    """Reference ``pw.run()`` (internals/run.py:12) — the execution trigger.

    On Spark, batch plans execute at each action (Catalyst is the lazy
    graph), so for batch pipelines this is a documented no-op.  For
    streaming pipelines it blocks on every active StreamingQuery — the
    direct analogue of the reference's blocking dataflow run.
    """
    from pyspark.sql import SparkSession

    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        return
    for q in spark.streams.active:
        q.awaitTermination(timeout)


run_all = run  # reference alias

# reference submodule aliases (pathway exposes ml/indexing/utils/udfs)
from pathwaydataframework_spark.operators import ml_index as indexing  # noqa: E402
from pathwaydataframework_spark import ml  # noqa: E402
from pathwaydataframework_spark import xpacks  # noqa: E402
from pathwaydataframework_spark import utils  # noqa: E402
from pathwaydataframework_spark.operators import ordered as statistical  # noqa: E402
from pathwaydataframework_spark.internals import udfs  # noqa: E402
from pathwaydataframework_spark.operators.stateful import AsyncTransformer  # noqa: E402

# reference class/function aliases kept for drop-in imports
ColumnExpression = Expr
ColumnReference = ColumnRef
UDFSync = UDF  # deprecated reference names
UDFAsync = UDF
udf_async = udf


def apply_async(fn, *args, result_type: str = "string"):
    """Reference ``pw.apply_async`` (common.py:170) — coroutine fns are
    bridged by the UDF layer's per-call event loop; for high-fanout async
    I/O use ``AsyncTransformer``."""
    return apply(fn, *args, result_type=result_type)

__all__ = [
    "run",
    "run_all",
    "debug",
    "demo",
    "persistence",
    "universes",
    "join",
    "join_inner",
    "join_left",
    "join_right",
    "join_outer",
    "groupby",
    "DateTimeNaive",
    "DateTimeUtc",
    "Duration",
    "Json",
    "Pointer",
    "PyObjectWrapper",
    "schema_from_types",
    "schema_from_pandas",
    "schema_from_dict",
    "schema_builder",
    "assert_table_has_schema",
    "indexing",
    "xpacks",
    "ml",
    "utils",
    "udfs",
    "asynchronous",
    "window",
    "compat",
    "AsofJoinResult",
    "GroupedJoinResult",
    "GroupedTable",
    "IntervalJoinResult",
    "JoinMode",
    "JoinResult",
    "Joinable",
    "MonitoringLevel",
    "OuterJoinResult",
    "PersistenceMode",
    "TableLike",
    "TableSlice",
    "Type",
    "WindowJoinResult",
    "SchemaProperties",
    "global_error_log",
    "iterate_universe",
    "load_yaml",
    "local_error_log",
    "pandas_transformer",
    "set_monitoring_config",
    "table_transformer",
    "Table",
    "this",
    "left",
    "right",
    "reducers",
    "temporal",
    "io",
    "sql",
    "get_spark",
    "apply",
    "apply_with_type",
    "cast",
    "coalesce",
    "declare_type",
    "fill_error",
    "hll_estimate",
    "if_else",
    "lift",
    "make_tuple",
    "require",
    "unwrap",
    "tumbling",
    "sliding",
    "session",
    "intervals_over",
    "interval",
    "interval_join",
    "window_join",
    "asof_join",
    "asof_now_join",
    "windowby",
    "dedup",
    "decontam",
    "text",
    "similarity",
    "ordered",
    "graphs",
    "ranking",
    "iterate",
    "udf",
    "UDF",
    "Schema",
    "column_definition",
    "FixedDelayRetryStrategy",
    "ExponentialBackoffRetryStrategy",
    "InMemoryCache",
    "DiskCache",
    "apply_with_disk_cache",
    "behaviors",
    "col_utils",
    "ml_index",
    "multimodal",
    "stateful",
    "custom_reducers",
    "BaseCustomAccumulator",
    "common_behavior",
    "exactly_once_behavior",
    "inactivity_detection",
    "set_license_key",
]

__version__ = "0.1.0"

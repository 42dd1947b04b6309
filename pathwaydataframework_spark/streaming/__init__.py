"""Structured-Streaming surface (reference SURVEY.md §2.9).

Round-1 scope: batch parity first.  This module holds the streaming
entry points that are already semantically settled; the stateful operators
(deduplicate-with-acceptor, predicate sessions, _forget/_buffer behaviors)
land in the next round on applyInPandasWithState.

Mapping (SURVEY.md §2.9):
- common_behavior(cutoff)  → ``withWatermark``
- persistence / recovery   → ``checkpointLocation``
- subscribe                → ``writeStream.foreach``
- asof_now_join            → stream-static join
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from pathwaydataframework_spark.internals.table import Table


def with_watermark(table: Table, time_col: str, delay: str) -> Table:
    """Late-data cutoff — the analogue of the reference's
    ``common_behavior(cutoff=...)`` (temporal_behavior.py:29).

    Event-time columns must be TIMESTAMP (LTZ); NTZ inputs are cast, which
    is value-preserving under the engine's pinned UTC session timezone."""
    df = table.df
    if dict(df.dtypes).get(time_col) == "timestamp_ntz":
        import pyspark.sql.functions as F

        df = df.withColumn(time_col, F.col(time_col).cast("timestamp"))
    return Table(df.withWatermark(time_col, delay))


def write_console(table: Table, **options: Any):
    """Debug sink — reference pw.debug.compute_and_print on a stream."""
    return table.df.writeStream.format("console").options(**options).start()


def write_memory(table: Table, query_name: str, output_mode: str = "append"):
    return (
        table.df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .start()
    )

"""Demo stream generators — reference ``python/pathway/demo/__init__.py``
(generate_custom_stream :28, noisy_linear_stream :118, range_stream :165,
replay_csv :212, replay_csv_with_time :258) and
``pw.temporal.utc_now`` (stdlib/temporal/time_utils.py:31).

Streaming variants build on Spark's ``rate`` source (one row per tick);
batch variants produce deterministic static tables for tests/docs.
"""

from __future__ import annotations

from typing import Any, Callable

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from pathwaydataframework_spark.internals.table import Table


def range_stream(
    spark: SparkSession,
    nb_rows: int = 30,
    offset: int = 0,
    *,
    input_rate: float = 1.0,
    mode: str = "static",
) -> Table:
    """Stream of increasing integers (column ``value``) — demo/__init__.py:165."""
    if mode == "streaming":
        df = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", max(int(input_rate), 1))
            .load()
            .select((F.col("value") + offset).alias("value"))
        )
        return Table(df)
    return Table(spark.range(offset, offset + nb_rows).select(F.col("id").alias("value")))


def noisy_linear_stream(
    spark: SparkSession, nb_rows: int = 10, *, input_rate: float = 1.0, mode: str = "static"
) -> Table:
    """(x, y≈x) points with deterministic pseudo-noise — demo/__init__.py:118.

    Noise is a hash-derived uniform in [-1, 1] so results are reproducible
    across engines (no RNG state).
    """
    base = range_stream(spark, nb_rows, mode=mode).df.select(F.col("value").alias("x"))
    noise = (F.pmod(F.xxhash64(F.col("x")), F.lit(2001)) - 1000) / 1000.0
    return Table(base.select("x", (F.col("x") + noise).alias("y")))


def generate_custom_stream(
    spark: SparkSession,
    value_generators: dict[str, Callable[[int], Any]],
    *,
    nb_rows: int = 30,
    schema: str | None = None,
    input_rate: float = 1.0,
) -> Table:
    """Apply per-column Python generators to row indices —
    demo/__init__.py:28.  Batch variant (generators run driver-side over the
    index range, like the reference's single connector thread)."""
    rows = [
        tuple(gen(i) for gen in value_generators.values()) for i in range(nb_rows)
    ]
    names = list(value_generators)
    if schema is None:
        schema = ", ".join(f"{n} string" for n in names)
    return Table(spark.createDataFrame(rows, schema))


def replay_csv(
    spark: SparkSession, path: str, *, schema: str | None = None, input_rate: float = 1.0
) -> Table:
    """Replay a CSV as a stream — demo/__init__.py:212."""
    reader = spark.readStream.format("csv").option("header", "true").option(
        "maxFilesPerTrigger", 1
    )
    if schema:
        reader = reader.schema(schema)
    return Table(reader.load(path))


def replay_csv_with_time(
    spark: SparkSession,
    path: str,
    *,
    schema: str,
    time_column: str,
    unit: str = "s",
    speedup: float = 1.0,
    spool_dir: str | None = None,
) -> Table:
    """Replay a CSV respecting inter-row timestamp gaps — reference
    demo/__init__.py:258.  A producer thread (ConnectorSubject) sleeps
    ``gap/speedup`` between rows and spools committed batches; the table is
    a file-stream source, so downstream event-time processing (watermarks,
    windows) sees realistic arrival pacing."""
    import csv as _csv
    import tempfile
    import time as _time

    from pathwaydataframework_spark.sources.python_connector import (
        ConnectorSubject,
        read as _py_read,
    )

    mult = {"s": 1.0, "ms": 1e-3, "us": 1e-6, "ns": 1e-9}[unit]

    class _Replay(ConnectorSubject):
        def run(self) -> None:
            with open(path, newline="") as f:
                prev_t = None
                for row in _csv.DictReader(f):
                    t = float(row[time_column])
                    if prev_t is not None and t > prev_t:
                        _time.sleep((t - prev_t) * mult / speedup)
                    prev_t = t
                    self.next(**row)
                    self.commit()

    return _py_read(
        spark,
        _Replay(),
        schema=schema,
        spool_dir=spool_dir or tempfile.mkdtemp(prefix="pw_replay_"),
    )


def utc_now(spark: SparkSession, refresh_rate_ms: int = 1000) -> Table:
    """Clock-tick stream — reference stdlib/temporal/time_utils.py:31.

    ``rate`` source at 1000/refresh_rate rows per second with the tick
    timestamp."""
    rps = max(int(1000 / max(refresh_rate_ms, 1)), 1)
    df = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rps)
        .load()
        .select(F.col("timestamp").alias("now"))
    )
    return Table(df)

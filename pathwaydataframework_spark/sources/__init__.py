"""Connectors — reference ``pw.io.*`` (SURVEY.md §2.1).

Batch readers/writers lower to ``spark.read`` / ``df.write``; streaming
variants (``mode='streaming'``) to ``readStream`` / ``writeStream`` where the
format supports it.  Formats without a local test path (kafka, jdbc, delta)
are thin wrappers that surface clear errors when the runtime lacks the
connector jar — the call shape and options match what a cluster deployment
needs.

Reference: python/pathway/io/fs/__init__.py:31 (read), :281 (write);
io/csv :18/:186, io/jsonlines :18/:189, io/plaintext :15, io/kafka :27/:502,
io/deltalake :38/:170, io/postgres :18.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession

from pathwaydataframework_spark.internals.table import Table

_FORMAT_BY_KIND = {
    "csv": "csv",
    "json": "json",
    "jsonlines": "json",
    "plaintext": "text",
    "binary": "binaryFile",
    "parquet": "parquet",
}


class fs:
    """File-system connector (reference io/fs/__init__.py:31)."""

    @staticmethod
    def read(
        spark: SparkSession,
        path: str,
        *,
        format: str = "csv",
        schema: str | None = None,
        mode: str = "static",
        with_metadata: bool = False,
        **options: Any,
    ) -> Table:
        fmt = _FORMAT_BY_KIND.get(format, format)
        reader = spark.readStream if mode == "streaming" else spark.read
        r = reader.format(fmt)
        if schema:
            r = r.schema(schema)
        elif fmt in ("csv", "json") and mode == "static":
            r = r.option("inferSchema", "true")
        if fmt == "csv":
            r = r.option("header", options.pop("header", "true"))
        for k, v in options.items():
            r = r.option(k, v)
        df = r.load(path)
        if with_metadata:
            import pyspark.sql.functions as F

            df = df.withColumn("_metadata_path", F.input_file_name())
        return Table(df)

    @staticmethod
    def write(table: Table, path: str, *, format: str = "csv", mode: str = "overwrite", **options: Any) -> None:
        fmt = _FORMAT_BY_KIND.get(format, format)
        w = table.df.write.format(fmt).mode(mode)
        if fmt == "csv":
            w = w.option("header", "true")
        for k, v in options.items():
            w = w.option(k, v)
        w.save(path)


class csv:
    """Reference io/csv/__init__.py:18/:186."""

    @staticmethod
    def read(spark: SparkSession, path: str, *, schema: str | None = None, mode: str = "static", **opts) -> Table:
        return fs.read(spark, path, format="csv", schema=schema, mode=mode, **opts)

    @staticmethod
    def write(table: Table, path: str, **opts) -> None:
        fs.write(table, path, format="csv", **opts)


class jsonlines:
    """Reference io/jsonlines/__init__.py:18/:189."""

    @staticmethod
    def read(spark: SparkSession, path: str, *, schema: str | None = None, mode: str = "static", **opts) -> Table:
        return fs.read(spark, path, format="jsonlines", schema=schema, mode=mode, **opts)

    @staticmethod
    def write(table: Table, path: str, **opts) -> None:
        fs.write(table, path, format="jsonlines", **opts)


class plaintext:
    """Reference io/plaintext/__init__.py:15."""

    @staticmethod
    def read(spark: SparkSession, path: str, *, mode: str = "static", **opts) -> Table:
        return fs.read(spark, path, format="plaintext", mode=mode, **opts)


class parquet:
    @staticmethod
    def read(spark: SparkSession, path: str, *, mode: str = "static", **opts) -> Table:
        return fs.read(spark, path, format="parquet", mode=mode, **opts)

    @staticmethod
    def write(table: Table, path: str, **opts) -> None:
        fs.write(table, path, format="parquet", **opts)


class kafka:
    """Reference io/kafka/__init__.py:27/:502 → Spark's kafka source/sink.

    Requires the spark-sql-kafka package on the cluster; the local test
    container has no kafka, so this surfaces the standard Spark error if
    used without it.
    """

    @staticmethod
    def read(
        spark: SparkSession,
        brokers: str | Sequence[str],
        topic: str,
        *,
        mode: str = "streaming",
        starting_offsets: str = "earliest",
        **options: Any,
    ) -> Table:
        if not isinstance(brokers, str):
            brokers = ",".join(brokers)
        reader = spark.readStream if mode == "streaming" else spark.read
        r = (
            reader.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
        )
        for k, v in options.items():
            r = r.option(k, v)
        return Table(r.load())

    @staticmethod
    def write(table: Table, brokers: str, topic: str, **options: Any) -> Any:
        w = (
            table.df.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("topic", topic)
        )
        for k, v in options.items():
            w = w.option(k, v)
        return w.start()


class deltalake:
    """Reference io/deltalake/__init__.py:38/:170 → delta format (needs
    delta-spark on the cluster)."""

    @staticmethod
    def read(spark: SparkSession, path: str, *, mode: str = "static", **opts) -> Table:
        reader = spark.readStream if mode == "streaming" else spark.read
        return Table(reader.format("delta").load(path))

    @staticmethod
    def write(table: Table, path: str, *, mode: str = "append", **opts) -> None:
        table.df.write.format("delta").mode(mode).save(path)


class postgres:
    """Reference io/postgres/__init__.py:18 → JDBC sink."""

    @staticmethod
    def write(table: Table, *, url: str, table_name: str, mode: str = "append", **props) -> None:
        table.df.write.jdbc(url=url, table=table_name, mode=mode, properties=props)


class sqlite:
    """Reference io/sqlite/__init__.py:19 → JDBC source."""

    @staticmethod
    def read(spark: SparkSession, url: str, table_name: str, **props) -> Table:
        return Table(spark.read.jdbc(url=url, table=table_name, properties=props))


class null:
    """Reference io/null/__init__.py:13 — sink that discards (noop format)."""

    @staticmethod
    def write(table: Table) -> None:
        table.df.write.format("noop").mode("overwrite").save()


def subscribe(table: Table, on_change, mode: str = "batch"):
    """Per-row callback sink — reference io/_subscribe.py:13.

    Batch: foreach over the final rows (diff=+1, single time).  Streaming:
    ``writeStream.foreach`` — ``on_change`` runs ON THE EXECUTORS (it must
    be picklable and side-effect through shared storage or a service, not
    driver memory), which is what keeps the sink distributed at scale.
    Returns the StreamingQuery in streaming mode.
    """
    if mode == "batch":
        for row in table.df.toLocalIterator():
            on_change(key=None, row=row.asDict(), time=0, is_addition=True)
        return None

    def _fn(row):
        on_change(key=None, row=row.asDict(), time=0, is_addition=True)

    return (
        table.df.writeStream.foreach(_fn)
        .trigger(availableNow=True)
        .start()
    )


class debug:
    """Reference pw.debug helpers (debug/__init__.py)."""

    @staticmethod
    def table_from_pandas(spark: SparkSession, pdf) -> Table:
        return Table(spark.createDataFrame(pdf))

    @staticmethod
    def table_from_markdown(spark: SparkSession, md: str) -> Table:
        """Parse the reference's markdown-table test format
        (debug/__init__.py:429; tests/utils.py:531 `T()`)."""
        import io as _io

        import pandas as pd

        lines = [ln.strip() for ln in md.strip().splitlines() if ln.strip()]
        rows = []
        for ln in lines:
            cells = [c.strip() for c in ln.strip("|").split("|")]
            if all(set(c) <= {"-", ":", " "} for c in cells):
                continue  # separator row
            rows.append(cells)
        header, data = rows[0], rows[1:]
        pdf = pd.DataFrame(data, columns=header)
        for c in pdf.columns:
            converted = pd.to_numeric(pdf[c], errors="coerce")
            if not converted.isna().any():
                pdf[c] = converted
        return Table(spark.createDataFrame(pdf))

    @staticmethod
    def compute_and_print(table: Table, n: int = 100) -> None:
        table.df.show(n, truncate=False)

    @staticmethod
    def compute_and_print_update_stream(table: Table, n: int = 100) -> None:
        """Reference debug/__init__.py:235 — expose the changelog view.

        A batch table is a changelog with a single timestamp and diff=+1
        (SURVEY.md §1.1); the streaming update-stream view arrives with the
        foreachBatch sinks."""
        import pyspark.sql.functions as F

        table.df.withColumns(
            {"__time__": F.lit(0).cast("long"), "__diff__": F.lit(1)}
        ).show(n, truncate=False)

    @staticmethod
    def table_from_parquet(spark: SparkSession, path: str) -> Table:
        """Reference debug/__init__.py:464."""
        return Table(spark.read.parquet(path))


class debezium:
    """CDC ingestion — reference io/debezium/__init__.py:20.

    ``read`` consumes the Debezium topic via the Kafka source;
    ``parse_envelope`` unwraps the Debezium JSON envelope (op/before/after)
    into typed change rows with pure column expressions — usable on any
    DataFrame that has a JSON ``value`` column (tested without a broker).
    """

    @staticmethod
    def parse_envelope(df: DataFrame, after_schema: str) -> Table:
        import pyspark.sql.functions as F

        payload = F.get_json_object(F.col("value").cast("string"), "$.payload")
        parsed = df.select(
            F.get_json_object(payload, "$.op").alias("op"),
            F.from_json(F.get_json_object(payload, "$.before"), after_schema).alias("before"),
            F.from_json(F.get_json_object(payload, "$.after"), after_schema).alias("after"),
            F.get_json_object(payload, "$.source.ts_ms").cast("long").alias("source_ts_ms"),
        )
        return Table(parsed)

    @staticmethod
    def read(
        spark: SparkSession,
        brokers: str,
        topic: str,
        *,
        after_schema: str,
        mode: str = "streaming",
        **options: Any,
    ) -> Table:
        raw = kafka.read(spark, brokers, topic, mode=mode, **options)
        return debezium.parse_envelope(raw.df, after_schema)


class http:
    """REST ingress/egress — reference io/http/__init__.py:28,158.

    ``read`` starts a spooling HTTP server (see ``sources.http_ingress``)
    and returns (streaming Table, server handle — call ``.stop()``).
    ``write`` posts each row via a Python callable (the requests library is
    not in this container; inject ``sender=``).
    """

    @staticmethod
    def read(
        spark: SparkSession,
        *,
        schema: str,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        from pathwaydataframework_spark.sources.http_ingress import HttpIngressServer

        srv = HttpIngressServer(
            spark, schema=schema, spool_dir=spool_dir, host=host, port=port
        )
        return srv.table(), srv

    @staticmethod
    def write(table: Table, url: str, *, sender=None, format: str = "json") -> None:
        if sender is None:
            raise NotImplementedError(
                "inject sender=callable(url, payload) — no HTTP client is "
                "baked into this container"
            )
        for row in table.df.toJSON().toLocalIterator():
            sender(url, row)

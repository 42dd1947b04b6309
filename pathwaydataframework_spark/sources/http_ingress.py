"""REST ingress — the reference's ``pw.io.http.read`` (io/http/__init__.py:28).

The reference runs an HTTP server whose POST bodies become stream rows.
Spark-first shape: a tiny stdlib ``http.server`` on a daemon thread spools
each accepted payload as a jsonlines file into a watch directory, and the
table is a plain file-stream source over that directory — so the ingest
path gets Structured Streaming's offsets/checkpointing for free, and the
ingest rate is bounded by disk, not by the Python server (which only
appends; parsing happens distributed, JVM-side, via the json reader).

Files are written atomically (tmp name + rename) so the file source never
lists a half-written spool file.  At cluster scale the spool directory
lives on shared storage (s3a://...) and multiple ingress servers can spool
into it concurrently — uuid names cannot collide.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from pathwaydataframework_spark.internals.table import Table


class HttpIngressServer:
    """Accepts POSTed JSON rows (single object or newline-delimited) and
    exposes them as a streaming Table.

    >>> srv = HttpIngressServer(spark, schema="k string, v long",
    ...                         spool_dir="/tmp/spool", port=0)
    >>> t = srv.table()           # streaming Table
    >>> srv.url                   # POST rows here
    >>> srv.stop()
    """

    def __init__(
        self,
        spark: SparkSession,
        *,
        schema: str,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
    ) -> None:
        self._spark = spark
        self._schema = schema
        self._spool = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        spool = self._spool

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self) -> None:  # noqa: N802 — stdlib API name
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                try:
                    # validate: each non-empty line must be a JSON object
                    lines = [ln for ln in body.decode("utf-8").splitlines() if ln.strip()]
                    for ln in lines:
                        json.loads(ln)
                except (UnicodeDecodeError, json.JSONDecodeError):
                    self.send_response(400)
                    self.end_headers()
                    return
                name = uuid.uuid4().hex + ".jsonl"
                tmp = os.path.join(spool, "." + name)
                with open(tmp, "w", encoding="utf-8") as f:
                    f.write("\n".join(lines) + "\n")
                os.rename(tmp, os.path.join(spool, name))
                self.send_response(202)
                self.end_headers()

            def log_message(self, *args) -> None:  # silence per-request noise
                pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()

    @property
    def url(self) -> str:
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}/"

    def table(self) -> Table:
        df = self._spark.readStream.schema(self._schema).json(self._spool)
        return Table(df)

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)

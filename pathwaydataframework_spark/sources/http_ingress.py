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


class RestIngressServer:
    """Request/response REST ingress — reference ``pw.io.http.rest_connector``
    (io/http/_server.py:624).

    Each accepted request is assigned a ``query_id``, spooled into the
    streaming ingress directory (same file-stream spool pattern as
    :class:`HttpIngressServer` — the data plane never funnels through the
    driver), and the HTTP response BLOCKS until the response writer
    delivers a row with that ``query_id`` (or the timeout passes).  The
    response path intentionally runs driver-side: responses leave through
    this very HTTP server, so they are the server's working set, not a
    data-plane funnel.
    """

    def __init__(
        self,
        spark: SparkSession,
        *,
        schema,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        route: str = "/",
        methods=("POST",),
        request_validator=None,
        response_timeout_s: float = 30.0,
        webserver=None,
    ) -> None:
        self._spark = spark
        self._schema = schema
        self._spool = spool_dir
        self._route = route
        self._timeout = response_timeout_s
        self._validator = request_validator
        self._allowed = {m.upper() for m in methods}
        os.makedirs(spool_dir, exist_ok=True)
        self._pending: dict[str, threading.Event] = {}
        self._results: dict[str, object] = {}
        self._lock = threading.Lock()
        self._server = None
        self._thread = None
        self._webserver = webserver
        if webserver is not None:
            # shared PathwayWebserver: it owns the socket and dispatches to
            # this route's _handle_request
            webserver.register(route, self)
            return
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self) -> None:  # noqa: N802 — stdlib API name
                outer._handle_request(self, "POST")

            def do_GET(self) -> None:  # noqa: N802
                outer._handle_request(self, "GET")

            def log_message(self, *args) -> None:
                pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()

    def _handle_request(self, handler, method: str) -> None:
        """Shared request path for the standalone server and the
        PathwayWebserver dispatcher."""
        from urllib.parse import parse_qsl, urlparse

        if method not in self._allowed:
            handler.send_response(405)
            handler.end_headers()
            return
        if self._webserver is None and self._route != "/" and (
            urlparse(handler.path).path != self._route
        ):
            handler.send_response(404)
            handler.end_headers()
            return
        if method == "POST":
            length = int(handler.headers.get("Content-Length", 0))
            body = handler.rfile.read(length)
            try:
                payload = json.loads(body.decode("utf-8") or "{}")
            except (UnicodeDecodeError, json.JSONDecodeError):
                handler.send_response(400)
                handler.end_headers()
                return
        else:
            payload = dict(parse_qsl(urlparse(handler.path).query))
        self._process(handler, payload)

    def _process(self, handler, payload: dict) -> None:
        if self._validator is not None:
            try:
                verdict = self._validator(payload)
            except Exception as exc:  # noqa: BLE001 — validator contract
                verdict = str(exc)
            if verdict is not None:
                handler.send_response(400)
                handler.end_headers()
                handler.wfile.write(str(verdict).encode("utf-8"))
                return
        qid = uuid.uuid4().hex
        ev = threading.Event()
        with self._lock:
            self._pending[qid] = ev
        row = dict(payload)
        row["query_id"] = qid
        name = qid + ".jsonl"
        tmp = os.path.join(self._spool, "." + name)
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(json.dumps(row) + "\n")
        os.rename(tmp, os.path.join(self._spool, name))
        if ev.wait(self._timeout):
            with self._lock:
                result = self._results.pop(qid, None)
                self._pending.pop(qid, None)
            handler.send_response(200)
            handler.send_header("Content-Type", "application/json")
            handler.end_headers()
            handler.wfile.write(json.dumps(result).encode("utf-8"))
        else:
            with self._lock:
                # deliver() may race the timeout: it can store the result
                # between ev.wait() expiring and this cleanup — pop BOTH
                # maps so an abandoned result can't accumulate forever.
                self._pending.pop(qid, None)
                self._results.pop(qid, None)
            handler.send_response(504)
            handler.end_headers()

    @property
    def url(self) -> str:
        if self._server is None and self._webserver is not None:
            return self._webserver.url + self._route
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}{self._route}"

    def table(self) -> Table:
        schema = self._schema
        if isinstance(schema, type) and hasattr(schema, "to_spark"):
            import pyspark.sql.types as T

            st = schema.to_spark()
            st = T.StructType(list(st.fields) + [T.StructField("query_id", T.StringType())])
            df = self._spark.readStream.schema(st).json(self._spool)
        else:
            df = self._spark.readStream.schema(
                f"{schema}, query_id string"
            ).json(self._spool)
        return Table(df)

    def deliver(self, query_id: str, result) -> None:
        """Resolve one pending request (used by the response writer)."""
        with self._lock:
            ev = self._pending.get(query_id)
            if ev is None:
                return
            self._results[query_id] = result
            ev.set()

    def response_writer(self, result_table: Table) -> None:
        """The callable returned by rest_connector: feed it the result
        table — columns ``query_id`` and ``result`` (reference contract).
        Streaming tables deliver via foreachBatch; batch tables deliver
        their rows once."""
        df = result_table.df if hasattr(result_table, "df") else result_table

        def _deliver_batch(batch_df, _batch_id=None) -> None:
            for row in batch_df.select("query_id", "result").collect():
                self.deliver(row["query_id"], row["result"])

        if df.isStreaming:
            q = df.writeStream.outputMode("append").foreachBatch(_deliver_batch).start()
            self._response_query = q
        else:
            _deliver_batch(df)

    def stop(self) -> None:
        q = getattr(self, "_response_query", None)
        if q is not None:
            q.stop()
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._thread.join(timeout=5)


def rest_connector(
    spark: SparkSession,
    host: str | None = None,
    port: int | str | None = None,
    *,
    schema,
    spool_dir: str,
    webserver=None,
    route: str = "/",
    methods=("POST",),
    request_validator=None,
    delete_completed_queries: bool | None = None,
    response_timeout_s: float = 30.0,
    **_accepted,
):
    """Reference ``pw.io.http.rest_connector`` (io/http/_server.py:624):
    returns ``(table, response_writer)`` — POST a JSON payload, the row
    (plus its ``query_id``) streams into the table, and the HTTP response
    blocks until ``response_writer``'s table yields a matching
    ``(query_id, result)`` row.

    ``delete_completed_queries`` is accepted for call-shape parity; the
    file-stream ingress is append-only (no retraction channel — same
    deviation as io.pyfilesystem deletions, DEVIATIONS #2), so completed
    queries are simply dropped from the server's pending map.
    """
    srv = RestIngressServer(
        spark,
        schema=schema,
        spool_dir=spool_dir,
        host=host or "127.0.0.1",
        port=int(port or 0),
        route=route,
        methods=methods,
        request_validator=request_validator,
        response_timeout_s=response_timeout_s,
        webserver=webserver,
    )
    table = srv.table()

    def writer(result_table):
        return srv.response_writer(result_table)

    # expose the server handle for shutdown/url access
    writer.server = srv  # type: ignore[attr-defined]
    return table, writer


class PathwayWebserver:
    """Reference io/http/_server.py:329 — shared host/port configuration
    for ``rest_connector``: several connectors can register distinct
    routes on ONE webserver instance.  Each registered route keeps its own
    spool directory and pending-request map; the dispatcher routes by
    ``self.path``."""

    def __init__(self, host: str, port: int, *, with_schema_endpoint: bool = True,
                 with_cors: bool = False):
        self.host = host
        self.port = int(port)
        self.with_schema_endpoint = with_schema_endpoint
        self.with_cors = with_cors
        self._routes: dict[str, RestIngressServer] = {}
        self._server = None
        self._thread = None

    def _ensure_started(self) -> None:
        if self._server is not None:
            return
        outer = self

        class Dispatcher(BaseHTTPRequestHandler):
            def _dispatch(self, method: str) -> None:
                from urllib.parse import urlparse

                path = urlparse(self.path).path
                if outer.with_schema_endpoint and path == "/_schema":
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(
                        json.dumps(
                            {r: str(s._schema) for r, s in outer._routes.items()}
                        ).encode()
                    )
                    return
                srv = outer._routes.get(path)
                if srv is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                # delegate to the route's own handler logic
                srv._handle_request(self, method)

            def do_POST(self) -> None:  # noqa: N802
                self._dispatch("POST")

            def do_GET(self) -> None:  # noqa: N802
                self._dispatch("GET")

            def log_message(self, *args) -> None:
                pass

        self._server = ThreadingHTTPServer((self.host, self.port), Dispatcher)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    @property
    def url(self) -> str:
        self._ensure_started()
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}"

    def register(self, route: str, srv: "RestIngressServer") -> None:
        self._routes[route] = srv
        self._ensure_started()

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._thread.join(timeout=5)
            self._server = None

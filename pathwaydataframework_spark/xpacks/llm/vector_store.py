"""VectorStoreServer / VectorStoreClient — reference xpacks/llm/vector_store.py.

Reference: ``VectorStoreServer`` (vector_store.py:38) builds the parse →
split → embed → index pipeline and serves ``/v1/retrieve``,
``/v1/statistics``, ``/v1/inputs`` over its engine's HTTP connector;
``VectorStoreClient`` (:629) is the matching REST client.

Here the pipeline IS a :class:`DocumentStore` (the distributed plan), and
the server is a plain stdlib ``ThreadingHTTPServer`` adapter that turns
each REST request into a 1-row batch query against that plan.  The HTTP
surface exists for API parity and interactive debugging — the scale path
is calling ``DocumentStore.retrieve_query`` with a DataFrame of MANY
queries, which answers them all in one distributed job instead of one job
per request.

No external HTTP libraries: the server is ``http.server`` and the client
is ``urllib`` — both stdlib, so this works in a hermetic executor image.
"""

from __future__ import annotations

import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Iterable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from pathwaydataframework_spark.internals.table import Table
from pathwaydataframework_spark.xpacks.llm.document_store import DocumentStore

__all__ = ["VectorStoreServer", "SlidesVectorStoreServer", "VectorStoreClient"]


class VectorStoreServer:
    """Reference VectorStoreServer (vector_store.py:38): a DocumentStore
    plus a REST facade.

    Args mirror the reference: ``docs`` (binary ``data`` + ``_metadata``
    sources), ``embedder`` (Column→Column; default the hashing embedder via
    DocumentStore), ``parser``/``splitter`` as in DocumentStore, and
    ``index_factory`` (any ml_index retriever factory)."""

    def __init__(
        self,
        docs: DataFrame | Table | Iterable[DataFrame | Table],
        embedder: Callable[[Column], Column] | None = None,
        parser: Callable | None = None,
        splitter: Callable | None = None,
        doc_post_processors: Sequence[Callable] | None = None,
        index_factory=None,
        *,
        dim: int = 64,
    ):
        self.store = DocumentStore(
            docs,
            retriever_factory=index_factory,
            parser=parser,
            splitter=splitter,
            doc_post_processors=doc_post_processors,
            embedder=embedder,
            dim=dim,
        )
        self._spark = self.store.chunked_docs.sparkSession
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- one-request batch queries ------------------------------------------

    def _one_query_df(self, payload: dict) -> DataFrame:
        return self._spark.createDataFrame(
            [
                (
                    0,
                    payload.get("query", ""),
                    int(payload.get("k", 3)),
                    payload.get("metadata_filter"),
                    payload.get("filepath_globpattern"),
                )
            ],
            "query_id long, query string, k int, "
            "metadata_filter string, filepath_globpattern string",
        )

    def _handle(self, route: str, payload: dict):
        if route == "/v1/retrieve":
            row = self.store.retrieve_query(self._one_query_df(payload)).first()
            return [
                {"dist": h["dist"], "text": h["text"],
                 "metadata": json.loads(h["metadata"] or "{}")}
                for h in (row["result"] if row else [])
            ]
        if route == "/v1/statistics":
            row = self.store.statistics_query(
                self._spark.range(1).select(F.lit(0).alias("query_id"))
            ).first()
            r = row["result"]
            return {
                "file_count": r["file_count"],
                "last_modified": r["last_modified"],
                "last_indexed": r["last_indexed"],
            }
        if route == "/v1/inputs":
            row = self.store.inputs_query(self._one_query_df(payload)).first()
            return [json.loads(m or "{}") for m in (row["result"] if row else [])]
        raise KeyError(route)

    # -- server lifecycle ----------------------------------------------------

    def run_server(
        self,
        host: str = "127.0.0.1",
        port: int = 0,
        *,
        threaded: bool = True,
        with_cache: bool = False,  # accepted for signature parity; caching is
        # the engine's own UDF-cache concern here
    ):
        """Start the REST facade.  ``threaded=True`` (default) serves from a
        daemon thread and returns immediately; ``port=0`` picks a free port
        (read it back from ``.port``).  Reference run_server
        (vector_store.py:456)."""
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 — http.server API
                length = int(self.headers.get("Content-Length", 0))
                try:
                    payload = json.loads(self.rfile.read(length) or b"{}")
                    body = json.dumps(outer._handle(self.path, payload)).encode()
                    status = 200
                except KeyError:
                    body, status = b'{"error": "unknown route"}', 404
                except Exception as exc:  # surface errors as JSON, not a stack
                    body = json.dumps({"error": str(exc)}).encode()
                    status = 500
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):  # silence per-request stderr noise
                pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._server.server_address[:2]
        if threaded:
            self._thread = threading.Thread(
                target=self._server.serve_forever, daemon=True
            )
            self._thread.start()
            return self._thread
        self._server.serve_forever()

    def shutdown(self):
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

    def __repr__(self):
        return f"{type(self).__name__}({self.store.retriever_factory!r})"


class SlidesVectorStoreServer(VectorStoreServer):
    """Reference SlidesVectorStoreServer (vector_store.py:566) — the
    slide-search profile; shares the DocumentStore pipeline."""


class VectorStoreClient:
    """Reference VectorStoreClient (vector_store.py:629), on stdlib urllib.

    Provide either ``url`` or ``host``+``port``."""

    def __init__(
        self,
        host: str | None = None,
        port: int | None = None,
        url: str | None = None,
        timeout: int | None = 15,
        additional_headers: dict | None = None,
    ):
        err = "Either (`host` and `port`) or `url` must be provided, but not both."
        if url is not None:
            if host or port:
                raise ValueError(err)
            self.url = url
        else:
            if host is None:
                raise ValueError(err)
            self.url = f"http://{host}:{port or 80}"
        self.timeout = timeout
        self.additional_headers = additional_headers or {}

    def _post(self, route: str, payload: dict):
        req = urllib.request.Request(
            self.url + route,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json", **self.additional_headers},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read())

    def query(
        self,
        query: str,
        k: int = 3,
        metadata_filter: str | None = None,
        filepath_globpattern: str | None = None,
    ) -> list[dict]:
        data = {"query": query, "k": k}
        if metadata_filter is not None:
            data["metadata_filter"] = metadata_filter
        if filepath_globpattern is not None:
            data["filepath_globpattern"] = filepath_globpattern
        return sorted(self._post("/v1/retrieve", data), key=lambda x: x["dist"])

    __call__ = query

    def get_vectorstore_statistics(self) -> dict:
        return self._post("/v1/statistics", {})

    def get_input_files(
        self,
        metadata_filter: str | None = None,
        filepath_globpattern: str | None = None,
    ) -> list[dict]:
        return self._post(
            "/v1/inputs",
            {
                "metadata_filter": metadata_filter,
                "filepath_globpattern": filepath_globpattern,
            },
        )

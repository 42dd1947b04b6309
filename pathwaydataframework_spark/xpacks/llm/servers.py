"""REST servers for LLM apps — reference ``xpacks/llm/servers.py``.

Reference: ``BaseRestServer`` (:16, route registry over the engine's HTTP
connector), ``DocumentStoreServer`` (:92), ``QARestServer`` (:140),
``QASummaryRestServer`` (:193), plus ``serve_callable`` (:227).

Same stance as vector_store.py: the REST facade is stdlib
``ThreadingHTTPServer`` turning each request into a 1-row batch query
against the distributed plan — an interactive/parity surface, not the
scale path (batch DataFrame endpoints answer many queries in one job).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable

import pyspark.sql.functions as F

from pathwaydataframework_spark.xpacks.llm.document_store import DocumentStore
from pathwaydataframework_spark.xpacks.llm.question_answering import (
    BaseRAGQuestionAnswerer,
)

__all__ = [
    "BaseRestServer",
    "DocumentStoreServer",
    "QARestServer",
    "QASummaryRestServer",
]


class BaseRestServer:
    """Route registry + stdlib HTTP runner (reference BaseRestServer:16).

    ``serve(route, handler)`` registers ``handler(payload: dict) ->
    json-able``; ``run(threaded=True)`` starts serving (``port=0`` picks a
    free port, read back from ``.port``)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0, **kwargs):
        self.host = host
        self.port = port
        self._routes: dict[str, Callable[[dict], object]] = {}
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def serve(self, route: str, handler: Callable[[dict], object], **kwargs):
        self._routes[route] = handler
        return handler

    def serve_callable(self, route: str, callable_func: Callable | None = None, **kw):
        """Reference serve_callable (:227): expose a plain Python callable
        at a route; payload keys become keyword arguments.  Usable as a
        decorator: ``@server.serve_callable("/my_route")``."""

        def register(fn):
            self.serve(route, lambda payload: fn(**payload))
            return fn

        if callable_func is not None:
            return register(callable_func)
        return register

    def run(self, *, threaded: bool = True, **kwargs):
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 — http.server API
                length = int(self.headers.get("Content-Length", 0))
                try:
                    payload = json.loads(self.rfile.read(length) or b"{}")
                    fn = outer._routes.get(self.path)
                    if fn is None:
                        body, status = b'{"error": "unknown route"}', 404
                    else:
                        body = json.dumps(fn(payload)).encode()
                        status = 200
                except Exception as exc:
                    body = json.dumps({"error": str(exc)}).encode()
                    status = 500
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):
                pass

        self._server = ThreadingHTTPServer((self.host, self.port), Handler)
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


def _query_frame(spark, payload: dict, *, query_key: str = "query"):
    return spark.createDataFrame(
        [
            (
                0,
                payload.get(query_key, ""),
                int(payload.get("k", 3)),
                payload.get("metadata_filter"),
                payload.get("filepath_globpattern"),
            )
        ],
        "query_id long, query string, k int, "
        "metadata_filter string, filepath_globpattern string",
    )


class DocumentStoreServer(BaseRestServer):
    """Reference DocumentStoreServer (:92) — /v1/retrieve, /v1/statistics,
    /v1/inputs over a :class:`DocumentStore`."""

    def __init__(
        self, host: str = "127.0.0.1", port: int = 0,
        document_store: DocumentStore | None = None, **kwargs,
    ):
        super().__init__(host, port, **kwargs)
        if document_store is None:
            raise ValueError("document_store is required")
        self.store = document_store
        self._spark = document_store.chunked_docs.sparkSession
        self.serve("/v1/retrieve", self._retrieve)
        self.serve("/v1/statistics", self._statistics)
        self.serve("/v1/inputs", self._inputs)

    def _retrieve(self, payload: dict):
        row = self.store.retrieve_query(_query_frame(self._spark, payload)).first()
        return [
            {"dist": h["dist"], "text": h["text"],
             "metadata": json.loads(h["metadata"] or "{}")}
            for h in (row["result"] if row else [])
        ]

    def _statistics(self, payload: dict):
        row = self.store.statistics_query(
            self._spark.range(1).select(F.lit(0).alias("query_id"))
        ).first()
        r = row["result"]
        return {
            "file_count": r["file_count"],
            "last_modified": r["last_modified"],
            "last_indexed": r["last_indexed"],
        }

    def _inputs(self, payload: dict):
        row = self.store.inputs_query(_query_frame(self._spark, payload)).first()
        return [json.loads(m or "{}") for m in (row["result"] if row else [])]


class QARestServer(DocumentStoreServer):
    """Reference QARestServer (:140) — adds /v1/pw_list_documents and
    /v1/pw_ai_answer over a :class:`BaseRAGQuestionAnswerer`."""

    def __init__(
        self, host: str = "127.0.0.1", port: int = 0,
        rag_question_answerer: BaseRAGQuestionAnswerer | None = None, **kwargs,
    ):
        if rag_question_answerer is None:
            raise ValueError("rag_question_answerer is required")
        self.rag = rag_question_answerer
        super().__init__(
            host, port, document_store=rag_question_answerer.indexer, **kwargs
        )
        self.serve("/v1/pw_list_documents", self._inputs)
        self.serve("/v1/pw_ai_answer", self._answer)

    def _answer(self, payload: dict):
        q = self._spark.createDataFrame(
            [
                (
                    0,
                    payload.get("prompt", ""),
                    payload.get("filters"),
                    payload.get("response_type", "short"),
                )
            ],
            "query_id long, prompt string, filters string, response_type string",
        )
        row = self.rag.answer_query(q).first()
        return {"response": row["result"] if row else None}


class QASummaryRestServer(QARestServer):
    """Reference QASummaryRestServer (:193) — adds /v1/pw_ai_summary."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.serve("/v1/pw_ai_summary", self._summarize)

    def _summarize(self, payload: dict):
        q = self._spark.createDataFrame(
            [(payload.get("text_list", []),)], "text_list array<string>"
        )
        row = self.rag.summarize_query(q).first()
        return {"response": row["result"] if row else None}

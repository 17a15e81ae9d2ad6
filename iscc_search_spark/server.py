"""S7 — HTTP serving layer over a built index.

The reference's primary user surface is a REST API over its index protocol
(iscc_search/protocols/index.py:39-98; server/search.py:13-46 routes search
requests and maps errors to 400/404).  This shim re-expresses that surface
over the Spark engine with the stdlib http.server (zero new dependencies;
a production deployment would put the same handlers behind any ASGI stack
or a Spark Connect client):

    GET /health                          -> {"status": "ok"}
    GET /stats                           -> index meta + table counts (S8)
    GET /search?q=...&k=10               -> BM25 top-k (driver-local fast
                                            path; falls back to the
                                            distributed scorer over the cap)
    GET /more_like_this?doc_id=...&k=10  -> J5 (404 unknown doc)
    GET /similar?doc_id=...&k=10         -> multi-unit ISCC search from the
                                            PERSISTED units table (404
                                            unknown doc)
    GET /granular?q=...&k=10&max_hamming=8
                                         -> chunk-level simprint search
                                            from the PERSISTED simprints

Error mapping mirrors the reference: missing/invalid parameters -> 400,
unknown doc_id -> 404 (server/search.py:31-44).  Responses are JSON rows.

Queries run on the server's long-lived SparkSession; the underlying
IndexReader revalidates against meta.json mtime per query, so in-place
upsert/delete are picked up without restarting the server.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import functions as F


class ApiError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


def _rows(df) -> list[dict]:
    return [r.asDict() for r in df.collect()]


class SearchApp:
    """Route table + handlers, independent of the HTTP plumbing (testable
    directly; the reference keeps the same split between protocol and
    server, protocols/index.py vs server/search.py)."""

    def __init__(self, spark, index_dir: str):
        from iscc_search_spark.plans.search import SearchIndex

        self.index = SearchIndex(spark, index_dir)
        self.spark = spark

    # --- param helpers -------------------------------------------------------

    @staticmethod
    def _int(params: dict, name: str, default: int | None = None) -> int:
        vals = params.get(name)
        if not vals:
            if default is None:
                raise ApiError(400, f"missing required parameter: {name}")
            return default
        try:
            return int(vals[0])
        except ValueError:
            raise ApiError(400, f"invalid integer for {name}: {vals[0]!r}")

    @staticmethod
    def _str(params: dict, name: str) -> str:
        vals = params.get(name)
        if not vals or not vals[0]:
            raise ApiError(400, f"missing required parameter: {name}")
        return vals[0]

    def _require_doc(self, doc_id: int) -> None:
        hit = (
            self.spark.read.parquet(self.index.cat.docs)
            .filter(F.col("doc_id") == doc_id)
            .select("doc_id")
            .limit(1)
            .collect()
        )
        if not hit:
            raise ApiError(404, f"doc_id {doc_id} not indexed")

    # --- endpoints -----------------------------------------------------------

    def handle(self, path: str, params: dict) -> tuple[int, object]:
        if path == "/health":
            return 200, {"status": "ok"}
        if path == "/stats":
            return 200, self.index.stats()
        if path == "/search":
            q = self._str(params, "q")
            k = self._int(params, "k", 10)
            from iscc_search_spark.operators.wand import bm25_wand_topk_local

            out = bm25_wand_topk_local(self.index.reader, q, k=k)
            return 200, out.to_dict(orient="records")
        if path == "/more_like_this":
            doc_id = self._int(params, "doc_id")
            k = self._int(params, "k", 10)
            try:
                return 200, _rows(self.index.more_like_this(doc_id, k=k))
            except KeyError:
                raise ApiError(404, f"doc_id {doc_id} not indexed")
        if path == "/similar":
            doc_id = self._int(params, "doc_id")
            k = self._int(params, "k", 10)
            self._require_doc(doc_id)
            return 200, _rows(self.index.search_similar(doc_id, k=k))
        if path == "/granular":
            q = self._str(params, "q")
            k = self._int(params, "k", 10)
            max_hamming = self._int(params, "max_hamming", 8)
            return 200, _rows(
                self.index.search_granular(q, k=k, max_hamming=max_hamming)
            )
        raise ApiError(404, f"no such endpoint: {path}")


def make_server(spark, index_dir: str, host: str = "127.0.0.1", port: int = 0):
    """ThreadingHTTPServer bound to (host, port); port=0 picks a free one.
    Returns the server; run with serve_forever() (or in a thread)."""
    app = SearchApp(spark, index_dir)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (http.server API)
            u = urlparse(self.path)
            try:
                status, body = app.handle(u.path, parse_qs(u.query))
            except ApiError as e:
                status, body = e.status, {"error": e.message}
            except Exception as e:  # internal error -> 500, never a hang
                status, body = 500, {"error": str(e)}
            data = json.dumps(body, default=str).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *args):  # quiet test output
            pass

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.app = app
    return srv


def serve_in_thread(spark, index_dir: str, host: str = "127.0.0.1", port: int = 0):
    """Start the server on a daemon thread; returns (server, base_url)."""
    srv = make_server(spark, index_dir, host, port)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    h, p = srv.server_address
    return srv, f"http://{h}:{p}"

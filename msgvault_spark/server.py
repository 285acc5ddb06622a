"""HTTP API server: the reference's read-side REST surface on stdlib.

Mirrors `internal/api/server.go:150-190`'s analytics routes over the
`api.py` QueryResult functions — the network edge the reference exposes
for remote TUIs and integrations. The Spark session is the engine; one
server wraps one (spark, sf_dir) pair the way the reference wraps one
DuckDB engine. Ingest-side routes (POST /accounts, /sync, OAuth token
upload) stay out of scope with the connectors.

Routes (GET unless noted):
    /health                      — no auth, {"status": "ok"}
    /api/v1/stats/total          — global stats row (handleTotalStats)
    /api/v1/aggregates?view=senders&limit=N   (handleAggregates)
    /api/v1/search/fast?q=<gmail-style query>&limit=N (handleFastSearch)
    /api/v1/messages/filter?domain=&label=&limit=&offset=
                                 — filtered listing page (handleFilteredMessages)
    /api/v1/messages?ids=1,2,3   — summary hydration (handleListMessages)
    /api/v1/accounts             — account stats (handleListAccounts)
    POST /api/v1/query {"sql": ..., "limit"?: N}   (handleQuery)

Auth mirrors the reference's API-key middleware: when the server is
constructed with ``api_key``, every /api/v1 request must carry it in the
``X-API-Key`` header (401 otherwise); /health stays open
(server.go:150-156).

Responses are the columnar QueryResult wire shape
``{"columns": [...], "rows": [...], "row_count": N}`` (views.go:11-16);
errors are ``{"error": msg}`` with 400/401/404 status.

Threading: HTTP handlers run on the serving thread(s) and call into the
shared SparkSession — safe because Spark driver APIs are thread-safe and
every route is read-only over memoized artifacts. This is a serving
edge, not a data-plane component: result sets are page-sized, the heavy
lifting stays in the cluster.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

from msgvault_spark import api


class MsgvaultHTTPServer:
    """One (spark, sf_dir) engine behind a stdlib HTTP listener."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        *,
        host: str = "127.0.0.1",
        port: int = 0,
        api_key: str | None = None,
    ):
        self.spark = spark
        self.sf_dir = sf_dir
        self.api_key = api_key
        # raw SQL needs the registered views (engine setup, §3.3)
        from msgvault_spark.sources.cache import get_archive
        from msgvault_spark.views import register_archive_views

        register_archive_views(spark, get_archive(spark, sf_dir))
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet test runs
                pass

            # ---- plumbing ------------------------------------------------
            def _send(self, code: int, payload: str) -> None:
                body = payload.encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _err(self, code: int, msg: str) -> None:
                self._send(code, json.dumps({"error": msg}))

            def _authed(self) -> bool:
                if outer.api_key is None:
                    return True
                return self.headers.get("X-API-Key") == outer.api_key

            # ---- routes --------------------------------------------------
            def do_GET(self):
                u = urlparse(self.path)
                # keep blank values: ?ids= must reach the route and fail
                # with the SAME ValueError the in-process api raises for
                # an empty id list (RemoteEngine symmetry), not a KeyError
                q = {
                    k: v[0]
                    for k, v in parse_qs(
                        u.query, keep_blank_values=True
                    ).items()
                }
                if u.path in ("/health", "/health/"):
                    return self._send(200, json.dumps({"status": "ok"}))
                if not u.path.startswith("/api/v1/"):
                    return self._err(404, f"no route {u.path}")
                if not self._authed():
                    return self._err(401, "missing or invalid X-API-Key")
                try:
                    r = self._route_get(u.path, q)
                except (KeyError, ValueError) as e:
                    return self._err(400, str(e))
                except Exception as e:  # noqa: BLE001 — engine errors from
                    # user-supplied params (negative limits, bad views)
                    # must produce a 400, never a dropped connection
                    return self._err(400, str(e).splitlines()[0][:500])
                if r is None:
                    return self._err(404, f"no route {u.path}")
                self._send(200, r.to_json())

            def _route_get(self, path: str, q: dict):
                spark, sf = outer.spark, outer.sf_dir
                if path == "/api/v1/stats/total":
                    return api.get_total_stats(spark, sf)
                if path == "/api/v1/aggregates":
                    return api.aggregate_view(
                        spark, sf, q["view"], limit=int(q.get("limit", 100))
                    )
                if path == "/api/v1/aggregates/sub":
                    opts = {
                        k: q[k] for k in api.FILTER_PARAM_KEYS if k in q
                    }
                    return api.sub_aggregate_view(
                        spark,
                        sf,
                        q["view"],
                        limit=int(q.get("limit", 100)),
                        **opts,
                    )
                if path.startswith("/api/v1/messages/") and path[
                    len("/api/v1/messages/"):
                ].isdigit():
                    mid = int(path.rsplit("/", 1)[1])
                    return api.get_messages(spark, sf, [mid])
                if path == "/api/v1/search/fast":
                    return api.search_messages(
                        spark, sf, q["q"], limit=int(q.get("limit", 50))
                    )
                if path == "/api/v1/messages/filter":
                    opts = {
                        k: q[k] for k in api.FILTER_PARAM_KEYS if k in q
                    }
                    return api.list_view(
                        spark,
                        sf,
                        limit=int(q.get("limit", 50)),
                        offset=int(q.get("offset", 0)),
                        **opts,
                    )
                if path == "/api/v1/messages":
                    ids = [int(i) for i in q["ids"].split(",") if i]
                    return api.get_message_summaries(spark, sf, ids)
                if path == "/api/v1/accounts":
                    return api.list_accounts(spark, sf)
                return None

            def do_POST(self):
                u = urlparse(self.path)
                if not self._authed():
                    return self._err(401, "missing or invalid X-API-Key")
                if u.path != "/api/v1/query":
                    return self._err(404, f"no route {u.path}")
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    if not isinstance(body, dict):
                        raise TypeError
                    sql = body["sql"]
                except (ValueError, KeyError, TypeError):
                    return self._err(
                        400, "body must be a JSON object with a 'sql' key"
                    )
                try:
                    r = api.query_sql(
                        outer.spark, sql, limit=body.get("limit")
                    )
                except Exception as e:  # noqa: BLE001 — user SQL errors
                    return self._err(400, str(e).splitlines()[0][:500])
                self._send(200, r.to_json())

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "MsgvaultHTTPServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=10)


def serve(
    spark: SparkSession,
    sf_dir: str,
    *,
    host: str = "127.0.0.1",
    port: int = 0,
    api_key: str | None = None,
) -> MsgvaultHTTPServer:
    """Start the API server on a background thread; returns the handle
    (``.port`` for an OS-assigned port, ``.shutdown()`` to stop)."""
    return MsgvaultHTTPServer(
        spark, sf_dir, host=host, port=port, api_key=api_key
    ).start()

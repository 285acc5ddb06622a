"""Remote engine client: the reference's `internal/remote/engine.go`
analog — the same query surface spoken OVER the HTTP API (server.py)
instead of an in-process SparkSession, so a thin TUI/agent host can sit
on a laptop while the engine sits on the cluster.

Every method returns the columnar ``api.QueryResult`` the local
functions return, reconstructed from the wire shape — callers cannot
tell a RemoteEngine from the in-process api.py surface (the reference's
Engine-interface symmetry, engine.go:392-702). Auth is the same
X-API-Key header the server's middleware checks. Errors surface as
``RemoteError`` carrying the HTTP status and the server's message.

stdlib-only (urllib); no connection pooling — each call is one request,
matching the reference's stateless http.Client usage.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from urllib.parse import urlencode

from msgvault_spark.api import QueryResult


class RemoteError(RuntimeError):
    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status
        self.message = message


class RemoteEngine:
    def __init__(self, base_url: str, *, api_key: str | None = None,
                 timeout: int = 120):
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.timeout = timeout

    # ---- transport -----------------------------------------------------
    def _request(self, path: str, *, body: dict | None = None) -> dict:
        req = urllib.request.Request(
            f"{self.base_url}{path}",
            data=None if body is None else json.dumps(body).encode(),
            method="GET" if body is None else "POST",
        )
        if self.api_key is not None:
            req.add_header("X-API-Key", self.api_key)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:
            try:
                msg = json.loads(e.read()).get("error", "")
            except ValueError:
                msg = ""
            raise RemoteError(e.code, msg) from None
        except (urllib.error.URLError, TimeoutError, OSError) as e:
            # connection refused / DNS / socket timeout: status 0 — the
            # documented contract is 'errors surface as RemoteError'
            raise RemoteError(0, str(e)) from None

    def _result(
        self,
        path: str,
        params: dict | None = None,
        *,
        body: dict | None = None,
    ) -> QueryResult:
        if params:
            path = f"{path}?{urlencode(params)}"
        d = self._request(path, body=body)
        return QueryResult(
            columns=d["columns"], rows=d["rows"], row_count=d["row_count"]
        )

    # ---- engine surface (engine.go:392-702 read side) -------------------
    def health(self) -> bool:
        return self._request("/health").get("status") == "ok"

    def query_sql(self, sql: str, limit: int | None = None) -> QueryResult:
        body = {"sql": sql}
        if limit is not None:
            body["limit"] = limit
        return self._result("/api/v1/query", body=body)

    def aggregate(self, view: str, *, limit: int = 100) -> QueryResult:
        return self._result(
            "/api/v1/aggregates", {"view": view, "limit": limit}
        )

    def search_fast(self, query: str, *, limit: int = 50) -> QueryResult:
        return self._result(
            "/api/v1/search/fast", {"q": query, "limit": limit}
        )

    def list_messages(
        self, *, limit: int = 50, offset: int = 0, **filter_opts
    ) -> QueryResult:
        return self._result(
            "/api/v1/messages/filter",
            {"limit": limit, "offset": offset, **filter_opts},
        )

    def get_message_summaries(self, ids: list[int]) -> QueryResult:
        return self._result(
            "/api/v1/messages", {"ids": ",".join(str(i) for i in ids)}
        )

    def get_total_stats(self) -> QueryResult:
        return self._result("/api/v1/stats/total")

    def list_accounts(self) -> QueryResult:
        return self._result("/api/v1/accounts")

    # ---- round-9 route mirrors (server.py /stats, /search, /search/deep,
    # /messages/{id}/inline — reference remote engine surface for
    # handleStats/handleSearch/handleDeepSearch/handleMessageInline) -----
    def get_stats(self) -> QueryResult:
        """GET /api/v1/stats: live-scoped archive summary (one row)."""
        return self._result("/api/v1/stats")

    def search(
        self,
        query: str,
        *,
        mode: str = "fts",
        page: int = 1,
        page_size: int = 20,
    ) -> dict:
        """GET /api/v1/search — returns the reference's paged envelope
        (query/total/page/page_size/messages for fts; query/mode/
        returned/took_ms/results for vector|hybrid), not a QueryResult:
        the envelope fields ARE the contract here."""
        return self._request(
            "/api/v1/search?"
            + urlencode(
                {"q": query, "mode": mode, "page": page,
                 "page_size": page_size}
            )
        )

    def search_deep(
        self, query: str, *, limit: int = 100, offset: int = 0,
        **filter_opts
    ) -> dict:
        """GET /api/v1/search/deep — body-search envelope with has_more."""
        return self._request(
            "/api/v1/search/deep?"
            + urlencode(
                {"q": query, "limit": limit, "offset": offset,
                 **filter_opts}
            )
        )

    def get_inline_part(self, message_id: int, cid: str) -> tuple[str, bytes]:
        """GET /api/v1/messages/{id}/inline — (content_type, bytes) of the
        CID-referenced inline image; RemoteError on 400/404/415."""
        req = urllib.request.Request(
            f"{self.base_url}/api/v1/messages/{int(message_id)}/inline?"
            + urlencode({"cid": cid})
        )
        if self.api_key is not None:
            req.add_header("X-API-Key", self.api_key)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.headers.get("Content-Type", ""), resp.read()
        except urllib.error.HTTPError as e:
            try:
                msg = json.loads(e.read()).get("error", "")
            except ValueError:
                msg = ""
            raise RemoteError(e.code, msg) from None
        except (urllib.error.URLError, TimeoutError, OSError) as e:
            raise RemoteError(0, str(e)) from None

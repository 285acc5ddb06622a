"""The HTTP API edge (msgvault_spark/server.py) end-to-end over a live
listener: the reference's read-side REST routes (api/server.go:150-190)
served from one SparkSession, exercised with stdlib urllib — auth
middleware, the columnar QueryResult wire shape, and error statuses."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def server(spark):
    from msgvault_spark.server import serve

    srv = serve(spark, SF_DIR, api_key="sekret")
    yield srv
    srv.shutdown()


def _get(srv, path, key="sekret"):
    req = urllib.request.Request(f"http://127.0.0.1:{srv.port}{path}")
    if key is not None:
        req.add_header("X-API-Key", key)
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, json.loads(resp.read())


def _post(srv, path, body, key="sekret"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(body).encode(),
        headers={"X-API-Key": key} if key else {},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, json.loads(resp.read())


def test_health_is_open_and_api_requires_key(server):
    status, body = _get(server, "/health", key=None)
    assert (status, body) == (200, {"status": "ok"})
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/api/v1/stats/total", key=None)
    assert e.value.code == 401
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/api/v1/stats/total", key="wrong")
    assert e.value.code == 401


def test_stats_aggregates_accounts_roundtrip(server, spark):
    status, stats = _get(server, "/api/v1/stats/total")
    assert status == 200
    assert set(stats) == {"columns", "rows", "row_count"}
    assert stats["row_count"] == 1
    assert "message_count" in stats["columns"]

    status, agg = _get(server, "/api/v1/aggregates?view=senders&limit=5")
    assert status == 200 and agg["row_count"] <= 5 and agg["rows"]

    status, accts = _get(server, "/api/v1/accounts")
    assert status == 200 and accts["row_count"] >= 1


def test_search_filter_and_hydration(server):
    status, hits = _get(
        server, "/api/v1/search/fast?q=order&limit=5"
    )
    assert status == 200 and hits["row_count"] <= 5

    status, page = _get(
        server,
        "/api/v1/messages/filter?domain=nation_3.example.com&limit=3",
    )
    assert status == 200 and 0 < page["row_count"] <= 3

    ids = [r[page["columns"].index("id")] for r in page["rows"]]
    status, summaries = _get(
        server, f"/api/v1/messages?ids={','.join(str(i) for i in ids)}"
    )
    assert status == 200 and summaries["row_count"] == len(ids)


def test_sub_aggregate_and_single_message_routes(server):
    status, sub = _get(
        server,
        "/api/v1/aggregates/sub?view=senders"
        "&domain=nation_3.example.com&limit=5",
    )
    assert status == 200 and 0 < sub["row_count"] <= 5
    # drill-down is a restriction: counts under the filter can't exceed
    # the unfiltered view's for the same keys
    status, full = _get(server, "/api/v1/aggregates?view=senders&limit=100")
    full_counts = {
        r[full["columns"].index("key")]: r[full["columns"].index("count")]
        for r in full["rows"]
    }
    ki, ci = sub["columns"].index("key"), sub["columns"].index("count")
    for r in sub["rows"]:
        if r[ki] in full_counts:
            assert r[ci] <= full_counts[r[ki]]

    status, one = _get(server, "/api/v1/messages/7")
    assert status == 200 and one["row_count"] <= 1
    if one["row_count"] == 1:
        assert one["rows"][0][one["columns"].index("id")] == 7


def test_remote_engine_matches_local_surface(server, spark):
    """RemoteEngine (remote.py, the remote/engine.go analog) returns the
    SAME QueryResult the in-process api functions return, over the wire."""
    from msgvault_spark import api
    from msgvault_spark.remote import RemoteEngine, RemoteError

    eng = RemoteEngine(
        f"http://127.0.0.1:{server.port}", api_key="sekret"
    )
    assert eng.health()
    local = api.get_total_stats(spark, SF_DIR)
    remote = eng.get_total_stats()
    assert remote.columns == local.columns
    assert remote.rows == [list(r) for r in local.rows]

    agg = eng.aggregate("domains", limit=7)
    assert 0 < agg.row_count <= 7
    sql = eng.query_sql("SELECT COUNT(*) AS n FROM v_messages")
    assert sql.columns == ["n"] and sql.row_count == 1

    page = eng.list_messages(domain="nation_3.example.com", limit=2)
    ids = [r[page.columns.index("id")] for r in page.rows]
    assert eng.get_message_summaries(ids).row_count == len(ids)
    assert eng.list_accounts().row_count >= 1

    bad = RemoteEngine(f"http://127.0.0.1:{server.port}", api_key="nope")
    with pytest.raises(RemoteError) as e:
        bad.get_total_stats()
    assert e.value.status == 401


def test_raw_sql_post_and_errors(server):
    status, res = _post(
        server,
        "/api/v1/query",
        {"sql": "SELECT COUNT(*) AS n FROM v_domains", "limit": 10},
    )
    assert status == 200 and res["columns"] == ["n"] and res["row_count"] == 1

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/api/v1/query", {"sql": "SELECT FROM nowhere"})
    assert e.value.code == 400
    assert "error" in json.loads(e.value.read())

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/api/v1/query", {"nosql": 1})
    assert e.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/api/v1/unknown")
    assert e.value.code == 404


def test_malformed_inputs_get_http_errors_not_dropped_connections(server):
    """Non-object JSON bodies, engine errors from bad params, and blank
    id lists must all come back as HTTP 400s — never a dropped
    connection (BadStatusLine) or a KeyError 400 masking the real
    message."""
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/api/v1/query", "just a string")
    assert e.value.code == 400

    # engine error from a user-supplied param (negative limit)
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/api/v1/aggregates?view=senders&limit=-1")
    assert e.value.code == 400

    # blank ids: the in-process api raises ValueError('empty id list');
    # the remote surface mirrors it as a 400 with that message
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/api/v1/messages?ids=")
    assert e.value.code == 400
    assert "empty id list" in json.loads(e.value.read())["error"]


def test_remote_engine_wraps_connection_errors(server):
    from msgvault_spark.remote import RemoteEngine, RemoteError

    dead = RemoteEngine("http://127.0.0.1:9", timeout=2)
    with pytest.raises(RemoteError) as e:
        dead.get_total_stats()
    assert e.value.status == 0


# ---------------------------------------------------------------------------
# round 9: the four reference routes that were still missing —
# /stats, /search, /search/deep, /messages/{id}/inline
# (api/server.go:162,167,170,179)
# ---------------------------------------------------------------------------


def _get_err(srv, path, key="sekret"):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(srv, path, key=key)
    return e.value.code, json.loads(e.value.read())


def test_stats_summary_route(server):
    status, body = _get(server, "/api/v1/stats")
    assert status == 200
    assert body["row_count"] == 1
    assert body["columns"] == [
        "total_messages", "total_threads", "total_accounts",
        "total_labels", "total_attachments", "database_size",
    ]
    row = dict(zip(body["columns"], body["rows"][0]))
    assert row["total_messages"] > 0
    assert row["total_accounts"] >= 1
    assert row["database_size"] > 0


def test_search_fts_paging_and_validation(server):
    status, p1 = _get(server, "/api/v1/search?q=order&page_size=5")
    assert status == 200
    assert p1["page"] == 1 and p1["page_size"] == 5
    assert p1["total"] > 5 and len(p1["messages"]) == 5
    assert {"id", "subject", "sent_at"} <= set(p1["messages"][0])

    _, p2 = _get(server, "/api/v1/search?q=order&page_size=5&page=2")
    ids1 = [m["id"] for m in p1["messages"]]
    ids2 = [m["id"] for m in p2["messages"]]
    assert ids1 and ids2 and not set(ids1) & set(ids2)

    code, err = _get_err(server, "/api/v1/search")
    assert code == 400 and "'q'" in err["error"]
    code, err = _get_err(server, "/api/v1/search?q=x&mode=nope")
    assert code == 400 and "fts|vector|hybrid" in err["error"]


def test_search_vector_and_hybrid_modes(server):
    # vector/hybrid need a free-text term and only serve page 1
    code, err = _get_err(server, "/api/v1/search?q=x&mode=vector&page=2")
    assert code == 400 and "page=1" in err["error"]
    code, err = _get_err(
        server, "/api/v1/search?q=from:a@b.com&mode=hybrid"
    )
    assert code == 400 and "free-text" in err["error"]

    status, v = _get(
        server, "/api/v1/search?q=token7&mode=vector&page_size=4"
    )
    assert status == 200 and v["mode"] == "vector"
    assert v["returned"] == len(v["results"]) == 4
    assert {"id", "score"} <= set(v["results"][0])

    status, h = _get(
        server, "/api/v1/search?q=token7&mode=hybrid&page_size=4"
    )
    assert status == 200 and h["mode"] == "hybrid"
    assert h["returned"] == len(h["results"]) == 4
    assert {"id", "rrf_score"} <= set(h["results"][0])
    assert h["results"][0]["rrf_score"] >= h["results"][-1]["rrf_score"]


def test_deep_search_has_more_and_filters(server):
    status, d = _get(server, "/api/v1/search/deep?q=order&limit=5")
    assert status == 200
    assert d["count"] == 5 and len(d["messages"]) == 5
    assert d["has_more"] is True and d["limit"] == 5 and d["offset"] == 0

    # offset pagination yields the next disjoint slice
    _, d2 = _get(server, "/api/v1/search/deep?q=order&limit=5&offset=5")
    ids1 = {m["id"] for m in d["messages"]}
    ids2 = {m["id"] for m in d2["messages"]}
    assert ids2 and not ids1 & ids2

    # a domain filter scopes the match set (reference MergeFilterIntoQuery)
    _, df = _get(
        server,
        "/api/v1/search/deep?q=order&domain=nation_3.example.com&limit=500",
    )
    assert 0 < df["count"] < d["count"] or df["has_more"] is False

    # filters deep search cannot represent are rejected, not dropped
    code, err = _get_err(
        server, "/api/v1/search/deep?q=order&time_period=1995"
    )
    assert code == 400 and "time_period" in err["error"]
    code, _ = _get_err(server, "/api/v1/search/deep")
    assert code == 400


@pytest.fixture(scope="module")
def inline_server(spark):
    """Server with an injected raw store: one live message carrying a
    multipart/related MIME payload with an inline PNG and an inline SVG."""
    import base64

    from msgvault_spark.server import serve
    from msgvault_spark.sources.cache import get_archive

    mid = (
        get_archive(spark, SF_DIR)["messages"]
        .orderBy("id").select("id").head()[0]
    )
    raw = (
        "MIME-Version: 1.0\r\n"
        "Message-ID: <planted@test>\r\n"
        "Subject: inline fixture\r\n"
        "Content-Type: multipart/related; boundary=BB\r\n\r\n"
        "--BB\r\n"
        "Content-Type: text/html\r\n\r\n"
        '<img src="cid:img1">\r\n'
        "--BB\r\n"
        "Content-Type: image/png\r\n"
        "Content-ID: <img1>\r\n"
        "Content-Disposition: inline; filename=i.png\r\n"
        "Content-Transfer-Encoding: base64\r\n\r\n"
        + base64.b64encode(b"PNG-PAYLOAD-BYTES").decode() + "\r\n"
        "--BB\r\n"
        "Content-Type: image/svg+xml\r\n"
        "Content-ID: <svg1>\r\n"
        "Content-Disposition: inline\r\n\r\n"
        "<svg/>\r\n"
        "--BB--\r\n"
    )
    store = spark.createDataFrame(
        [(int(mid), raw.encode(), "none")],
        "message_id long, raw_data binary, compression string",
    )
    srv = serve(spark, SF_DIR, api_key="sekret", raw_store=store)
    yield srv, int(mid)
    srv.shutdown()


def _get_raw(srv, path):
    req = urllib.request.Request(f"http://127.0.0.1:{srv.port}{path}")
    req.add_header("X-API-Key", "sekret")
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, dict(resp.headers), resp.read()


def test_inline_part_served_with_image_headers(inline_server):
    srv, mid = inline_server
    status, headers, body = _get_raw(
        srv, f"/api/v1/messages/{mid}/inline?cid=img1"
    )
    assert status == 200
    assert headers["Content-Type"] == "image/png"
    assert headers["Content-Disposition"] == "inline"
    assert headers["X-Content-Type-Options"] == "nosniff"
    assert body == b"PNG-PAYLOAD-BYTES"


def test_inline_part_error_statuses(inline_server):
    srv, mid = inline_server
    # SVG is an image/* type the reference explicitly refuses (XSS vector)
    code, err = _get_err(srv, f"/api/v1/messages/{mid}/inline?cid=svg1")
    assert code == 415 and "not permitted" in err["error"]
    code, err = _get_err(srv, f"/api/v1/messages/{mid}/inline?cid=ghost")
    assert code == 404 and "Inline part" in err["error"]
    code, err = _get_err(srv, f"/api/v1/messages/{mid}/inline")
    assert code == 400 and "cid" in err["error"]
    code, err = _get_err(srv, "/api/v1/messages/999999999/inline?cid=x")
    assert code == 404 and "raw data" in err["error"]
    code, err = _get_err(srv, "/api/v1/messages/abc/inline?cid=x")
    assert code == 400


def test_remote_engine_mirrors_new_routes(server, inline_server):
    from msgvault_spark.remote import RemoteEngine, RemoteError

    eng = RemoteEngine(
        f"http://127.0.0.1:{server.port}", api_key="sekret"
    )
    stats = eng.get_stats()
    assert stats.row_count == 1 and "total_messages" in stats.columns

    s = eng.search("order", page_size=3)
    assert s["total"] > 0 and len(s["messages"]) == 3

    d = eng.search_deep("order", limit=3)
    assert d["count"] == 3 and d["has_more"] is True

    srv, mid = inline_server
    ieng = RemoteEngine(f"http://127.0.0.1:{srv.port}", api_key="sekret")
    ctype, body = ieng.get_inline_part(mid, "img1")
    assert ctype == "image/png" and body == b"PNG-PAYLOAD-BYTES"
    with pytest.raises(RemoteError) as e:
        ieng.get_inline_part(mid, "svg1")
    assert e.value.status == 415


def test_serve_prewarms_headline_plans(server, spark):
    """serve() kicks background plan prewarm (the reference's pooled-
    connection prepared statements): once it drains, headline plans are
    memo hits for the serving thread."""
    import msgvault_spark.catalog as catmod

    handle = server.prewarm_handle
    assert handle is not None
    results = handle.wait(timeout=300)
    bad = {n: r for n, r in results.items() if r != "ok"}
    assert not bad, bad
    heads = {
        n for n, s in catmod.CATALOG.items()
        if s.headline and getattr(s.fn, "__wrapped__", None)
    }
    assert set(results) == heads
    app = spark.sparkContext.applicationId
    with catmod._PLAN_MEMO_LOCK:
        memoed = {k[2] for k in catmod._PLAN_MEMO if k[0] == app}
    # the memo is budget-bounded, so containment can be partial after
    # eviction — but at sf0.001 nothing approaches the budget
    assert heads <= memoed


def test_serve_prewarm_opt_out(spark):
    from msgvault_spark.server import serve

    srv = serve(spark, SF_DIR, api_key="k", prewarm=False)
    try:
        assert srv.prewarm_handle is None
    finally:
        srv.shutdown()


def test_memory_pressure_request_sheds_and_retries(server, monkeypatch):
    """A route failing with Spark's broadcast-build memory refusal sheds
    the plan cache and retries the SAME request once — the client sees a
    200, not a 400/500 (degrade the cache, not the request)."""
    from msgvault_spark import api as apimod

    real = apimod.get_summary_stats
    calls = {"n": 0}

    def flaky(spark, sf_dir):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError(
                "Not enough memory to build and broadcast the table to all "
                "worker nodes."
            )
        return real(spark, sf_dir)

    monkeypatch.setattr(apimod, "get_summary_stats", flaky)
    status, body = _get(server, "/api/v1/stats")
    assert status == 200 and calls["n"] == 2

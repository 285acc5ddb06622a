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

"""serving.prewarm_plans: background plan builds populate the shared plan
memo without executing jobs, race-free against a concurrent serving
thread. Kept at sf0.001 — prewarm cost is plan construction, not data."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

import msgvault_spark.catalog as catmod
from msgvault_spark.serving import prewarm_plans

SF_DIR = "/root/testdata/sf0.001"


def _clear_app_memo(spark):
    app = spark.sparkContext.applicationId
    with catmod._PLAN_MEMO_LOCK:
        for k in [k for k in catmod._PLAN_MEMO if k[0] == app]:
            del catmod._PLAN_MEMO[k]


def test_prewarm_populates_memo_and_serving_hits_it(spark):
    _clear_app_memo(spark)
    names = ["agg_senders", "total_stats", "pricing_summary",
             "orders_semi_anti", "events_by_type_daily"]
    handle = prewarm_plans(spark, SF_DIR, names, n_threads=3)
    results = handle.wait(timeout=180)
    assert handle.done
    assert set(results) == set(names)
    bad = {n: r for n, r in results.items() if r != "ok"}
    assert not bad, bad

    app = spark.sparkContext.applicationId
    with catmod._PLAN_MEMO_LOCK:
        memoed = {k[2] for k in catmod._PLAN_MEMO if k[0] == app}
    assert set(names) <= memoed

    # a user call now returns the PREWARMED instance (memo hit), and it
    # executes correctly
    df = catmod.CATALOG["agg_senders"].fn(spark, SF_DIR)
    with catmod._PLAN_MEMO_LOCK:
        assert catmod._PLAN_MEMO[(app, SF_DIR, "agg_senders")] is df
    assert df.count() > 0


def test_prewarm_skips_unmemoized_entries(spark):
    # streaming entries are side-effectful (memoize_plan=False); prewarm
    # must never run them
    streaming = [
        n for n, s in catmod.CATALOG.items()
        if getattr(s.fn, "__wrapped__", None) is None
    ]
    if not streaming:
        pytest.skip("no unmemoized entries registered")
    handle = prewarm_plans(spark, SF_DIR, streaming[:2], n_threads=1)
    results = handle.wait(timeout=60)
    assert results == {}


def test_prewarm_races_cleanly_with_serving_thread(spark):
    """A serving thread asking for an entry WHILE prewarm builds it must
    get a correct DataFrame either way (the memo's double-check admits one
    winner; the loser's duplicate build is discarded, not returned
    half-initialized)."""
    _clear_app_memo(spark)
    names = ["agg_domains", "latest_order_per_customer", "union_distinct_parts"]
    errs: list[str] = []

    def serve():
        try:
            for n in names:
                assert catmod.CATALOG[n].fn(spark, SF_DIR).count() >= 0
        except Exception as exc:  # pragma: no cover - failure path
            errs.append(f"{type(exc).__name__}: {exc}")

    t = threading.Thread(target=serve)
    handle = prewarm_plans(spark, SF_DIR, names, n_threads=2)
    t.start()
    t.join(timeout=300)
    handle.wait(timeout=300)
    assert not t.is_alive() and handle.done
    assert not errs, errs
    bad = {n: r for n, r in handle.results.items() if r != "ok"}
    assert not bad, bad


def test_prewarm_defaults_to_headliners(spark):
    handle = prewarm_plans(spark, SF_DIR, n_threads=2)
    results = handle.wait(timeout=600)
    heads = {
        n for n, s in catmod.CATALOG.items()
        if s.headline and getattr(s.fn, "__wrapped__", None)
    }
    assert set(results) == heads
    bad = {n: r for n, r in results.items() if r != "ok"}
    assert not bad, bad

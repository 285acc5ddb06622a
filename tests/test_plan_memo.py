"""The catalog plan memo is a bounded LRU: a marathon session visiting many
unique plans must not pin every plan (and its broadcast relations) on the
driver heap forever — the r11 sf1 ratio sweep OOM'd an 8 GB driver exactly
this way. These tests pin the eviction contract with stub plan builders so
no Spark jobs run."""

from __future__ import annotations

import msgvault_spark.catalog as catmod


class _FakeDF:
    def __init__(self, tag):
        self.tag = tag


class _FakeSC:
    applicationId = "app-memo-test"


class _FakeSpark:
    sparkContext = _FakeSC()


def _make_entry(name, builds):
    @catmod.register(name, oracle_sql=None)
    def _fn(spark, sf_dir, _name=name):
        builds.append(_name)
        return _FakeDF(_name)

    return catmod.CATALOG[name].fn


def _cleanup(names):
    for n in names:
        catmod.CATALOG.pop(n, None)
    for k in [k for k in catmod._PLAN_MEMO if k[0] == "app-memo-test"]:
        del catmod._PLAN_MEMO[k]


def test_plan_memo_caches_and_evicts_lru(monkeypatch):
    monkeypatch.setattr(catmod, "_PLAN_MEMO_CAP", 3)
    spark, builds = _FakeSpark(), []
    names = [f"_memo_test_{i}" for i in range(5)]
    try:
        fns = {n: _make_entry(n, builds) for n in names}

        # repeat hit = no rebuild
        a = fns[names[0]](spark, "sf")
        assert fns[names[0]](spark, "sf") is a
        assert builds == [names[0]]

        # fill to cap, then touch entry 0 so it becomes most-recent
        fns[names[1]](spark, "sf")
        fns[names[2]](spark, "sf")
        fns[names[0]](spark, "sf")
        assert len([k for k in catmod._PLAN_MEMO if k[0] == "app-memo-test"]) == 3

        # two more unique plans evict the two least-recently-used (1, 2)
        fns[names[3]](spark, "sf")
        fns[names[4]](spark, "sf")
        live = {k[2] for k in catmod._PLAN_MEMO if k[0] == "app-memo-test"}
        assert live == {names[0], names[3], names[4]}

        # evicted entries rebuild on next call; the survivor does not
        assert fns[names[0]](spark, "sf") is a
        fns[names[1]](spark, "sf")
        assert builds.count(names[1]) == 2
        assert builds.count(names[0]) == 1
    finally:
        _cleanup(names)


def test_plan_memo_keys_are_session_and_sf_scoped():
    spark, builds = _FakeSpark(), []
    name = "_memo_test_scope"
    try:
        fn = _make_entry(name, builds)
        d1 = fn(spark, "sfA")
        d2 = fn(spark, "sfB")
        assert d1 is not d2 and builds == [name, name]
    finally:
        _cleanup([name])


def test_plan_memo_cap_covers_headline_working_set():
    """bench.py's warm loop must never evict its own working set — the cap
    has to exceed the headline count with slack."""
    headliners = [n for n, s in catmod.CATALOG.items() if s.headline]
    assert catmod._PLAN_MEMO_CAP >= len(headliners) + 8

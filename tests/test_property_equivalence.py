"""Property-based equivalence: scale-shaped operators vs naive Python
references on random micro-inputs (hypothesis). Few examples, seeds fixed —
each example is a Spark job, so the budget is spent on input diversity, not
volume."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),                  # key
        st.integers(0, 5_000),              # seconds offset
    ),
    min_size=0,
    max_size=40,
)


@given(rows=events_strategy, timeout=st.sampled_from([600, 1800]))
@settings(**_SETTINGS)
def test_sessionize_counts_match_reference(spark, rows, timeout):
    from msgvault_spark.operators.sessionize import session_rollup

    data = [(k, BASE + dt.timedelta(seconds=s)) for k, s in rows]
    if not data:
        return
    ev = spark.createDataFrame(data, "user_id long, ts timestamp")
    got = {
        (r["user_id"], r["session_id"]): r["events"]
        for r in session_rollup(ev, timeout_s=timeout).collect()
    }
    # reference: sort per user, split on gaps
    ref: dict[tuple[int, int], int] = {}
    by_user: dict[int, list[int]] = {}
    for k, s in rows:
        by_user.setdefault(k, []).append(s)
    for k, ss in by_user.items():
        ss.sort()
        sid, prev = 0, None
        for s in ss:
            if prev is not None and s - prev > timeout:
                sid += 1
            ref[(k, sid)] = ref.get((k, sid), 0) + 1
            prev = s
    assert got == ref


@given(
    lrows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 3000)),
                   min_size=1, max_size=20),
    rrows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 3000),
                             st.integers(0, 99)),
                   min_size=0, max_size=20),
)
@settings(**_SETTINGS)
def test_asof_join_matches_reference(spark, lrows, rrows):
    from msgvault_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(lrows)],
        "k long, ts timestamp, lid long",
    )
    # dedupe right on (k, ts) to keep tie policy engine-independent
    seen = {}
    for k, s, v in rrows:
        seen[(k, s)] = v
    rdata = [(k, BASE + dt.timedelta(seconds=s), v) for (k, s), v in seen.items()]
    right = spark.createDataFrame(rdata, "k long, ts timestamp, v long")
    got = {r["lid"]: r["v"] for r in asof_join(left, right, on="k").collect()}
    for i, (k, s) in enumerate(lrows):
        cands = [(rs, v) for (rk, rs), v in seen.items() if rk == k and rs <= s]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, s)


@given(
    edges=st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                   min_size=1, max_size=25),
)
@settings(**_SETTINGS)
def test_connected_components_match_reference(spark, edges):
    from msgvault_spark.dedup.components import connected_components

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}

    # union-find reference
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}  # self-loop-only nodes: singletons
    ref = {n: find(n) for n in nodes}
    assert got == ref


@given(
    texts=st.lists(
        st.text(alphabet="ab \n.", min_size=0, max_size=60),
        min_size=1, max_size=6,
    )
)
@settings(**_SETTINGS)
def test_repetition_fractions_match_reference(spark, texts):
    from msgvault_spark.textstats.analysis import repetition_profile

    df = spark.createDataFrame(
        list(enumerate(texts)), "id long, text string"
    )
    got = {r["id"]: (r["dup_line_frac"], r["dup_word_frac"])
           for r in repetition_profile(df, "id", "text").collect()}
    import re

    for i, t in enumerate(texts):
        lines = [s.strip() for s in t.split("\n") if s.strip()]
        dl = (len(lines) - len(set(lines))) / len(lines) if lines else 0.0
        ws = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        dw = (len(ws) - len(set(ws))) / len(ws) if ws else 0.0
        assert abs(got[i][0] - dl) < 1e-6 and abs(got[i][1] - dw) < 1e-6, (i, t)

"""Training-pipeline operators: sessionization, deterministic sampling,
connected components — exact semantics on synthetic micro-data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from msgvault_spark.dedup.components import component_sizes, connected_components
from msgvault_spark.operators.sampling import (
    deterministic_sample,
    rowhash,
    stratified_sample,
    weighted_source_mix,
)
from msgvault_spark.operators.sessionize import session_rollup, sessionize


def _t(m):
    return dt.datetime(2024, 1, 1, 10, 0, 0) + dt.timedelta(minutes=m)


def test_sessionize_gap_splits(spark):
    # u1: events at 0,10,20 | 60,65 | 200  -> 3 sessions (30-min timeout)
    rows = [(1, _t(m)) for m in (0, 10, 20, 60, 65, 200)] + [(2, _t(0))]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    s = sessionize(ev, timeout_s=1800)
    got = {
        (r["user_id"], r["ts"].minute + 60 * (r["ts"].hour - 10)): r["session_id"]
        for r in s.collect()
    }
    assert got == {
        (1, 0): 0, (1, 10): 0, (1, 20): 0,
        (1, 60): 1, (1, 65): 1,
        (1, 200): 2,
        (2, 0): 0,
    }
    roll = session_rollup(ev, timeout_s=1800)
    by = {(r["user_id"], r["session_id"]): (r["events"], r["duration_s"])
          for r in roll.collect()}
    assert by[(1, 0)] == (3, 1200) and by[(1, 1)] == (2, 300)
    assert by[(1, 2)] == (1, 0) and by[(2, 0)] == (1, 0)


def test_sessionize_equal_timestamps_one_session(spark):
    ev = spark.createDataFrame(
        [(1, _t(0)), (1, _t(0)), (1, _t(0))], "user_id long, ts timestamp"
    )
    assert session_rollup(ev, timeout_s=60).count() == 1


def test_deterministic_sample_is_pure_and_unbiased(spark):
    df = spark.range(20_000).withColumnRenamed("id", "k")
    s1 = deterministic_sample(df, "k", 0.25)
    n = s1.count()
    assert abs(n - 5_000) < 300  # hash uniformity
    # pure function of key: repartition changes nothing
    ids1 = {r["k"] for r in s1.collect()}
    ids2 = {r["k"] for r in deterministic_sample(df.repartition(13), "k", 0.25).collect()}
    assert ids1 == ids2
    # nested rates: 10% sample is a subset of the 25% sample
    ids3 = {r["k"] for r in deterministic_sample(df, "k", 0.10).collect()}
    assert ids3 < ids1


def test_stratified_sample_quota_and_stability(spark):
    df = spark.range(1_000).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("g")
    )
    out = stratified_sample(df, ["g"], "k", quota=10)
    per = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert per == {"0": 10, "1": 10, "2": 10}
    a = sorted(r["k"] for r in out.collect())
    b = sorted(r["k"] for r in stratified_sample(df.repartition(7), ["g"], "k", 10).collect())
    assert a == b


def test_weighted_mix_rates(spark):
    df = spark.range(30_000).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("src")
    )
    kept = weighted_source_mix(df, "src", "k", {"0": 1.0, "1": 0.2})
    per = {r["src"]: r["n"] for r in kept.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert per["0"] == 10_000          # rate 1.0 keeps everything
    assert abs(per["1"] - 2_000) < 300  # ~20%
    assert "2" not in per               # unlisted source drops


def test_rowhash_matches_sql_formula(spark):
    df = spark.range(100).select(F.col("id").alias("k"), rowhash("k").alias("h"))
    for r in df.collect():
        assert r["h"] == ((r["k"] % 2147483647) * 1327217885) % 2147483647


def test_connected_components_chain_and_clique(spark):
    # chain 1-2-3-4 (diameter 3), clique 10-11-12, isolated edge 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "src long, dst long",
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[10] == comp[11] == comp[12] == 10
    assert comp[20] == comp[21] == 20
    sizes = {r["size"]: r["n_components"]
             for r in component_sizes(connected_components(edges)).collect()}
    assert sizes == {4: 1, 3: 1, 2: 1}


def test_connected_components_chain_converges_in_log_rounds(spark):
    """Adversarial shape: a 1000-node path. Pure min-label propagation
    would need ~1000 rounds; pointer jumping must land it within 12."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "src long, dst long"
    )
    comp = connected_components(edges, max_iter=12).collect()
    assert len(comp) == 1000
    assert {r["component"] for r in comp} == {0}


def test_connected_components_self_loop_and_dupes(spark):
    edges = spark.createDataFrame(
        [(5, 5), (5, 6), (6, 5), (5, 6)], "src long, dst long"
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {5: 5, 6: 5}


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def test_asof_join_backward_inclusive(spark):
    from msgvault_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, _t(10), "e1"), (1, _t(30), "e2"), (2, _t(5), "e3")],
        "k long, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [(1, _t(0), 100), (1, _t(10), 200), (1, _t(25), 300), (3, _t(0), 999)],
        "k long, ts timestamp, v long",
    )
    out = {r["ev"]: (r["v"], r["matched_ts"])
           for r in asof_join(left, right, on="k").collect()}
    assert out["e1"] == (200, _t(10))   # inclusive: equal ts matches
    assert out["e2"] == (300, _t(25))   # latest at-or-before
    assert out["e3"] == (None, None)    # key 2 has no right rows


def test_asof_join_tolerance(spark):
    from msgvault_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, _t(60), "e")], "k long, ts timestamp, ev string")
    right = spark.createDataFrame([(1, _t(0), 7)], "k long, ts timestamp, v long")
    with_tol = asof_join(left, right, on="k", tolerance_s=1800).head()
    assert with_tol["v"] is None        # 60 min gap > 30 min horizon
    no_tol = asof_join(left, right, on="k").head()
    assert no_tol["v"] == 7


def test_asof_join_tie_break_deterministic(spark):
    """Right rows tied on (key, ts): the greatest payload struct wins, on
    every run and under adversarial input order."""
    from msgvault_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, _t(10), "e")], "k long, ts timestamp, ev string"
    )
    dup_rows = [(1, _t(10), v) for v in (300, 100, 200)]
    for perm in (dup_rows, dup_rows[::-1]):
        right = spark.createDataFrame(
            perm, "k long, ts timestamp, v long"
        ).repartition(4)
        for _ in range(2):
            assert asof_join(left, right, on="k").head()["v"] == 300


def test_asof_join_single_exchange_no_join_node(spark):
    """The union-and-carry-forward shape must not contain a physical join
    and must shuffle exactly once (on the key)."""
    from msgvault_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, _t(0), "e")], "k long, ts timestamp, ev string")
    right = spark.createDataFrame([(1, _t(0), 7)], "k long, ts timestamp, v long")
    plan = asof_join(left, right, on="k")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") - plan.count("ReusedExchange") <= 1


# ---------------------------------------------------------------------------
# repetition quality filters
# ---------------------------------------------------------------------------


def test_repetition_profile_flags_boilerplate(spark):
    from msgvault_spark.textstats.analysis import repetition_profile

    df = spark.createDataFrame(
        [
            (1, "menu\nhome\nabout\nmenu\nhome\nmenu"),       # dup lines
            (2, "buy now buy now buy now buy now"),           # stuffed bigram
            (3, "a perfectly normal sentence with varied words here"),
            (4, ""),                                          # empty-safe
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in repetition_profile(df, "id", "text").collect()}
    assert out[1]["dup_line_frac"] == 0.5 and not out[1]["keep"]
    assert out[2]["top_bigram_frac"] > 0.5 and not out[2]["keep"]
    assert out[3]["keep"]
    assert out[4]["dup_line_frac"] == 0.0 and out[4]["keep"]


# ---------------------------------------------------------------------------
# int8 scalar quantization
# ---------------------------------------------------------------------------


def test_quantize_codes_and_recall(spark):
    import math
    import random

    from msgvault_spark.similarity.knn import knn_bruteforce
    from msgvault_spark.similarity.quantize import quantize_vector, quantized_knn

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # codes stay in int8 range and match the reference formula
    got = emb.select("embedding", quantize_vector(F.col("embedding")).alias("c")).head()
    mx = max(abs(v) for v in got["embedding"])
    want = [int(math.floor(v * 127.0 / mx + 0.5)) for v in got["embedding"]]
    assert got["c"] == want
    assert all(-128 <= c <= 127 for c in got["c"])

    # retrieve-rerank recall: quantized top-20 must contain most of exact top-10
    seed = rows[0][1]
    exact = {r["id"] for r in knn_bruteforce(
        emb, seed, k=10, id_col="vec_id", vec_col="embedding").collect()}
    quant = {r["vec_id"] for r in quantized_knn(emb, seed, 20).collect()}
    assert len(exact & quant) >= 8


def test_quantize_zero_vector_safe(spark):
    from msgvault_spark.similarity.quantize import quantize_vector

    emb = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    row = emb.select(quantize_vector(F.col("embedding")).alias("c")).head()
    assert row["c"] == [0, 0, 0]


# ---------------------------------------------------------------------------
# range (interval) join
# ---------------------------------------------------------------------------


def test_range_join_matches_naive(spark):
    import random

    from msgvault_spark.operators.rangejoin import range_join

    rnd = random.Random(3)
    lrows = [(rnd.randrange(5), _t(rnd.randrange(300)), i) for i in range(80)]
    rrows = [(rnd.randrange(5), _t(rnd.randrange(300)), 1000 + i) for i in range(80)]
    left = spark.createDataFrame(lrows, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(rrows, "k long, ts timestamp, rid long")

    for direction in ("both", "backward", "forward"):
        got = {
            (r["lid"], r["rid"])
            for r in range_join(
                left, right, on="k", window_s=1200, direction=direction
            ).collect()
        }
        naive = set()
        for lk, lt, lid in lrows:
            for rk, rt, rid in rrows:
                if lk != rk:
                    continue
                d = (rt - lt).total_seconds()
                ok = (
                    abs(d) <= 1200 if direction == "both"
                    else (-1200 <= d <= 0) if direction == "backward"
                    else (0 <= d <= 1200)
                )
                if ok:
                    naive.add((lid, rid))
        assert got == naive, direction


def test_range_join_no_duplicate_pairs(spark):
    from msgvault_spark.operators.rangejoin import range_join

    left = spark.createDataFrame([(1, _t(0), 1)], "k long, ts timestamp, lid long")
    right = spark.createDataFrame([(1, _t(1), 2)], "k long, ts timestamp, rid long")
    out = range_join(left, right, on="k", window_s=600).collect()
    assert len(out) == 1


def test_connected_components_selfloop_only_node(spark):
    # node 9 appears ONLY in a self-loop: still a singleton component
    edges = spark.createDataFrame([(9, 9), (1, 2)], "src long, dst long")
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {9: 9, 1: 1, 2: 1}


def test_asof_join_payload_name_collision(spark):
    from msgvault_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, _t(10), "L")], "k long, ts timestamp, label string"
    )
    right = spark.createDataFrame(
        [(1, _t(0), "R")], "k long, ts timestamp, label string"
    )
    row = asof_join(left, right, on="k").head()
    assert row["label"] == "L" and row["label_right"] == "R"


def test_global_shuffle_shards_deterministic_and_balanced(spark):
    from msgvault_spark.operators.sharding import global_shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(4000)], "doc_id long")
    a = global_shuffle_shards(df, "doc_id", 8)
    rows = {(r["doc_id"]): (r["shard"], r["pos"]) for r in a.collect()}
    # rerun over a different input partitioning: identical assignment
    b = global_shuffle_shards(df.repartition(13), "doc_id", 8)
    assert rows == {r["doc_id"]: (r["shard"], r["pos"]) for r in b.collect()}
    # positions are exactly 0..n_k-1 per shard; shards near-balanced
    from collections import defaultdict
    per = defaultdict(list)
    for _id, (s, p) in rows.items():
        per[s].append(p)
    sizes = []
    for s, ps in per.items():
        assert sorted(ps) == list(range(len(ps)))
        sizes.append(len(ps))
    assert max(sizes) - min(sizes) < 200  # binomial noise, not skew
    # within-shard order decorrelates from key order: shard 0's first
    # three keys are not simply the three smallest keys in shard 0
    s0 = sorted((p, i) for i, (s, p) in rows.items() if s == 0)
    head = [i for _, i in s0[:3]]
    assert head != sorted(i for i, (s, _) in rows.items() if s == 0)[:3]


def test_snapshot_diff_all_three_change_types(spark, tmp_path):
    """snapshot_diff must classify inserted/deleted/updated correctly —
    including the 'deleted' leg the catalog's merge scenario can't
    produce (merges never delete). v2 here is committed directly from a
    frame that drops key 2, changes key 3, keeps key 1, adds key 9."""
    from pyspark.sql import functions as F

    from msgvault_spark.sources.snapshots import (
        commit_snapshot,
        snapshot_diff,
    )

    lake = str(tmp_path / "t")
    v1 = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"
    )
    v2 = spark.createDataFrame(
        [(1, 10), (3, 99), (9, 90)], "k long, v long"
    )
    import os

    g1 = os.path.join(lake, "gen1"); v1.write.parquet(g1)
    commit_snapshot(spark, lake, files=[
        os.path.join(g1, f) for f in os.listdir(g1) if f.endswith(".parquet")
    ])
    g2 = os.path.join(lake, "gen2"); v2.write.parquet(g2)
    commit_snapshot(spark, lake, files=[
        os.path.join(g2, f) for f in os.listdir(g2) if f.endswith(".parquet")
    ])

    got = {
        r["k"]: (r["change_type"], r["old_v"], r["new_v"])
        for r in snapshot_diff(spark, lake, 1, 2, "k", ["v"]).collect()
    }
    assert got == {
        2: ("deleted", 20, None),
        3: ("updated", 30, 99),
        9: ("inserted", None, 90),
    }
    # unchanged key 1 must NOT appear in the change feed
    assert 1 not in got


def test_snapshot_diff_feed_reconstructs_target_version(spark, tmp_path):
    """The CDC contract: v1 patched with the change feed (delete the
    'deleted' keys, upsert the 'updated'/'inserted' new values) must
    reconstruct v2 EXACTLY — the invariant that lets a downstream replica
    consume the feed instead of re-reading the table."""
    import os

    from pyspark.sql import functions as F

    from msgvault_spark.sources.snapshots import commit_snapshot, snapshot_diff

    lake = str(tmp_path / "t")
    v1 = spark.createDataFrame(
        [(i, i * 10) for i in range(50)], "k long, v long"
    )
    # v2: drop multiples of 7, bump multiples of 5, add 100..104
    v2 = (
        v1.filter(F.col("k") % 7 != 0)
        .select("k", F.when(F.col("k") % 5 == 0, F.col("v") + 1)
                .otherwise(F.col("v")).alias("v"))
        .unionByName(spark.createDataFrame(
            [(100 + i, i) for i in range(5)], "k long, v long"))
    )
    for gen, df in (("gen1", v1), ("gen2", v2)):
        d = os.path.join(lake, gen); df.write.parquet(d)
        commit_snapshot(spark, lake, files=[
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        ])

    feed = snapshot_diff(spark, lake, 1, 2, "k", ["v"])
    deleted = feed.filter(F.col("change_type") == "deleted").select("k")
    upserts = feed.filter(F.col("change_type") != "deleted").select(
        "k", F.col("new_v").alias("v")
    )
    patched = (
        v1.join(deleted, "k", "left_anti")
        .join(upserts.select("k"), "k", "left_anti")
        .unionByName(upserts)
    )
    got = sorted((r["k"], r["v"]) for r in patched.collect())
    want = sorted((r["k"], r["v"]) for r in v2.collect())
    assert got == want

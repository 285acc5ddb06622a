"""Scale-path operators: salted aggregation, zero-fill series, HLL sketch
rollup, deletion vectors. Synthetic micro-frames assert exact semantics;
plan assertions pin the intended physical shape (broadcasts, no base
shuffle for merge-on-read)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from msgvault_spark.dedup.deletion_vectors import (
    apply_deletion_vector,
    build_deletion_vector,
    load_deletion_vector,
    undo_batch,
    write_deletion_vector,
)
from msgvault_spark.dedup.exact import exact_dup_groups, select_survivors
from msgvault_spark.operators.salted import salted_agg, salted_count_distinct
from msgvault_spark.operators.sketch import hll_merge_estimate, hll_sketch_rollup
from msgvault_spark.operators.timeseries import zero_fill


# ---------------------------------------------------------------------------
# salted aggregation
# ---------------------------------------------------------------------------


def test_salted_agg_matches_plain(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 3).alias("k"),
        (F.col("id") % 100).alias("v"),
    )
    got = {
        r["key"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_agg(
            df, "k",
            {"n": ("1", "count"), "s": ("v", "sum"),
             "mn": ("v", "min"), "mx": ("v", "max")},
            n_salts=8,
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"),
             F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == want


def test_salted_count_distinct_exact(spark):
    # skew: key 0 holds 90% of rows; distinct values overlap across salts
    df = spark.range(5_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(1).alias("k"),
        (F.col("id") % 137).alias("v"),
    )
    got = {
        r["key"]: r["distinct_count"]
        for r in salted_count_distinct(df, "k", "v", n_salts=16).collect()
    }
    want = {
        r["k"]: r["d"]
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("d")).collect()
    }
    assert got == want


def test_salted_agg_with_distinct_one_pass_exact(spark):
    """The fused one-pass variant must equal plain groupBy for both the
    re-associable aggregates and the exact distinct count, and its plan
    must hold exactly ONE scan of the input (the two-call formulation
    scans twice) with two shuffle levels."""
    from msgvault_spark.operators.salted import salted_agg_with_distinct

    df = spark.range(5_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(1).alias("k"),
        (F.col("id") % 137).alias("v"),
    )
    fused = salted_agg_with_distinct(
        df, "k", {"n": ("1", "count"), "s": ("v", "sum")}, "v", n_salts=16
    )
    got = {
        r["key"]: (r["n"], r["s"], r["distinct_count"])
        for r in fused.collect()
    }
    want = {
        r["k"]: (r["n"], r["s"], r["d"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"),
             F.count_distinct("v").alias("d"))
        .collect()
    }
    assert got == want
    plan = fused._jdf.queryExecution().executedPlan().toString()
    # executed AQE plans print Final AND Initial sections; audit the final
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Range (0, 5000") <= 1  # single scan of the source


# ---------------------------------------------------------------------------
# zero-fill time series
# ---------------------------------------------------------------------------


def test_zero_fill_fills_gaps(spark):
    rows = [
        (dt.datetime(2024, 1, 1), 5),
        (dt.datetime(2024, 4, 1), 2),  # feb+mar missing
    ]
    aggd = spark.createDataFrame(rows, "bucket timestamp, orders long")
    out = zero_fill(aggd, "bucket", "month").collect()
    assert [(r["key"], r["orders"]) for r in out] == [
        ("2024-01", 5), ("2024-02", 0), ("2024-03", 0), ("2024-04", 2),
    ]


def test_zero_fill_empty_input(spark):
    aggd = spark.createDataFrame([], "bucket timestamp, orders long")
    assert zero_fill(aggd, "bucket", "month").count() == 0


def test_zero_fill_day_granularity_and_custom_fill(spark):
    rows = [(dt.datetime(2024, 1, 1), 1.5), (dt.datetime(2024, 1, 3), 2.5)]
    aggd = spark.createDataFrame(rows, "bucket timestamp, avg_v double")
    out = zero_fill(
        aggd, "bucket", "day", fill={"avg_v": F.lit(None).cast("double")}
    ).collect()
    assert [(r["key"], r["avg_v"]) for r in out] == [
        ("2024-01-01", 1.5), ("2024-01-02", None), ("2024-01-03", 2.5),
    ]


# ---------------------------------------------------------------------------
# HLL sketch rollup
# ---------------------------------------------------------------------------


def test_hll_rollup_merge_accuracy(spark):
    # 3 grains per key with overlapping value ranges: union must dedup
    df = spark.range(30_000).select(
        (F.col("id") % 2).alias("k"),
        (F.col("id") % 3).alias("grain"),
        (F.col("id") % 5_000).alias("v"),
    )
    sk = hll_sketch_rollup(df, ["k"], ["grain"], "v")
    assert sk.count() == 6  # 2 keys × 3 grains
    est = {
        r["k"]: r["approx_distinct"]
        for r in hll_merge_estimate(sk, ["k"]).collect()
    }
    exact = {
        r["k"]: r["d"]
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("d")).collect()
    }
    for k, e in exact.items():
        assert abs(est[k] - e) <= 0.05 * e, (k, est[k], e)


def test_hll_subset_union(spark):
    # the same sketch table answers a grain-filtered question
    df = spark.range(9_000).select(
        F.lit(0).alias("k"), (F.col("id") % 3).alias("grain"),
        (F.col("id") % 1_000).alias("v"),
    )
    sk = hll_sketch_rollup(df, ["k"], ["grain"], "v")
    sub = hll_merge_estimate(sk.filter(F.col("grain") < 2), ["k"]).head()
    exact = (
        df.filter(F.col("grain") < 2)
        .agg(F.count_distinct("v").alias("d")).head()["d"]
    )
    assert abs(sub["approx_distinct"] - exact) <= 0.05 * exact


# ---------------------------------------------------------------------------
# deletion vectors
# ---------------------------------------------------------------------------


@pytest.fixture()
def marked_docs(spark):
    rows = [
        (1, "aaa"), (2, "aaa"), (3, "bbb"), (4, "bbb"), (5, "ccc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, h string")
    groups = exact_dup_groups(df, "h", id_col="doc_id")
    return df, select_survivors(groups, priority=[], id_col="doc_id")


def test_dv_build_apply_undo(spark, marked_docs):
    df, marked = marked_docs
    dv = build_deletion_vector(marked, id_col="doc_id", batch_id="b1")
    assert {r["id"] for r in dv.collect()} == {2, 4}  # min-id survives
    alive = apply_deletion_vector(df, dv, id_col="doc_id")
    assert {r["doc_id"] for r in alive.collect()} == {1, 3, 5}
    # undo restores everything
    restored = apply_deletion_vector(df, undo_batch(dv, "b1"), id_col="doc_id")
    assert restored.count() == 5


def test_dv_persistence_roundtrip(spark, marked_docs, tmp_path):
    df, marked = marked_docs
    base = str(tmp_path / "lake")
    write_deletion_vector(
        build_deletion_vector(marked, id_col="doc_id", batch_id="b1"), base
    )
    # second batch appends (incremental dedup runs accumulate)
    extra = spark.createDataFrame([(5, "b2")], "id long, delete_batch_id string")
    write_deletion_vector(extra, base)
    dv = load_deletion_vector(spark, base)
    assert dv.count() == 3
    alive = apply_deletion_vector(df, dv, id_col="doc_id")
    assert {r["doc_id"] for r in alive.collect()} == {1, 3}


def test_dv_apply_is_broadcast_anti(spark, marked_docs):
    df, marked = marked_docs
    dv = build_deletion_vector(marked, id_col="doc_id")
    plan = apply_deletion_vector(df, dv, id_col="doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_salted_join_matches_plain(spark):
    from msgvault_spark.operators.salted import salted_join

    big = spark.range(5_000).select(
        (F.col("id") % 4).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (9, "z")], "k long, name string"
    )
    for how in ("inner", "left"):
        got = sorted(
            (r["k"], r["v"], r["name"])
            for r in salted_join(big, small, "k", n_salts=8, how=how).collect()
        )
        want = sorted(
            (r["k"], r["v"], r["name"])
            for r in big.join(small, "k", how).collect()
        )
        assert got == want, how


def test_incremental_agg_state_upsert(spark):
    """State built per day, merged == direct agg; re-ingesting a day is
    idempotent; a corrected day replaces its old state."""
    from msgvault_spark.operators.incremental_agg import (
        build_agg_state,
        merge_agg_state,
        upsert_agg_state,
    )

    df = spark.range(1_000).select(
        (F.col("id") % 5).alias("day"),
        (F.col("id") % 3).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    # ingest day-by-day, accumulating state
    state = build_agg_state(df.filter("day = 0"), ["k"], ["day"], {"v": "v"})
    for d in range(1, 5):
        fresh = build_agg_state(df.filter(f"day = {d}"), ["k"], ["day"], {"v": "v"})
        state = upsert_agg_state(state, fresh, ["day"])

    merged = {
        r["k"]: (r["v_cnt"], r["v_sum"], r["v_min"], r["v_max"])
        for r in merge_agg_state(state.drop("day"), ["k"]).collect()
    }
    direct = {
        r["k"]: (r["cnt"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("k").agg(
            F.count("v").alias("cnt"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx")).collect()
    }
    assert merged == direct

    # idempotent re-ingest of day 3
    again = build_agg_state(df.filter("day = 3"), ["k"], ["day"], {"v": "v"})
    state2 = upsert_agg_state(state, again, ["day"])
    assert state2.count() == state.count()
    merged2 = {
        r["k"]: (r["v_cnt"], r["v_sum"], r["v_min"], r["v_max"])
        for r in merge_agg_state(state2.drop("day"), ["k"]).collect()
    }
    assert merged2 == direct

    # corrected day 4: drop half the rows -> merge reflects the correction
    fixed = build_agg_state(
        df.filter("day = 4 AND v < 50"), ["k"], ["day"], {"v": "v"}
    )
    state3 = upsert_agg_state(state, fixed, ["day"])
    direct3 = {
        r["k"]: r["cnt"]
        for r in df.filter("day != 4 OR v < 50").groupBy("k")
        .agg(F.count("v").alias("cnt")).collect()
    }
    merged3 = {
        r["k"]: r["v_cnt"]
        for r in merge_agg_state(state3.drop("day"), ["k"]).collect()
    }
    assert merged3 == direct3


def test_scd2_merge_lifecycle(spark):
    from msgvault_spark.operators.scd import scd2_merge

    T = dt.datetime
    dim = spark.createDataFrame(
        [
            # key 1: one historical + one current version
            (1, "alice@x.com", "Alice", T(2023, 1, 1), T(2024, 1, 1)),
            (1, "alice@x.com", "Alice L", T(2024, 1, 1), None),
            # key 2: current only
            (2, "bob@y.com", "Bob", T(2023, 6, 1), None),
            # key 3: untouched by the batch
            (3, "carol@z.com", "Carol", T(2023, 1, 1), None),
        ],
        "id long, email string, name string, valid_from timestamp, valid_to timestamp",
    )
    updates = spark.createDataFrame(
        [
            (1, "alice@x.com", "Alice Liddell", T(2024, 6, 1)),  # changed
            (2, "bob@y.com", "Bob", T(2024, 6, 1)),              # unchanged
            (4, "dan@w.com", "Dan", T(2024, 6, 1)),              # new key
        ],
        "id long, email string, name string, effective_ts timestamp",
    )
    out = scd2_merge(dim, updates, key="id", attrs=["email", "name"])
    rows = {(r["id"], r["valid_from"], r["valid_to"]): r["name"]
            for r in out.collect()}
    # key 1: history intact, old current closed at effective, new current
    assert rows[(1, T(2023, 1, 1), T(2024, 1, 1))] == "Alice"
    assert rows[(1, T(2024, 1, 1), T(2024, 6, 1))] == "Alice L"
    assert rows[(1, T(2024, 6, 1), None)] == "Alice Liddell"
    # key 2 unchanged: no new version
    assert rows[(2, T(2023, 6, 1), None)] == "Bob"
    # key 3 untouched; key 4 inserted current
    assert rows[(3, T(2023, 1, 1), None)] == "Carol"
    assert rows[(4, T(2024, 6, 1), None)] == "Dan"
    assert len(rows) == 6
    # exactly one current row per live key
    cur = out.filter("valid_to IS NULL").groupBy("id").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_merge_idempotent(spark):
    from msgvault_spark.operators.scd import scd2_merge

    T = dt.datetime
    dim = spark.createDataFrame(
        [(1, "a@x", "A", T(2024, 1, 1), None)],
        "id long, email string, name string, valid_from timestamp, valid_to timestamp",
    )
    updates = spark.createDataFrame(
        [(1, "a@x", "A2", T(2024, 6, 1))],
        "id long, email string, name string, effective_ts timestamp",
    )
    once = scd2_merge(dim, updates, key="id", attrs=["email", "name"])
    twice = scd2_merge(once, updates, key="id", attrs=["email", "name"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_cms_invariants_and_merge(spark):
    """CMS one-sided error: estimate ≥ exact for EVERY key; merging two
    shard sketches equals the sketch of the union (mergeable-state
    contract shared with HLL/incremental-agg)."""
    from pyspark.sql import functions as F

    from msgvault_spark.operators.cms import cms_build, cms_estimate, cms_merge

    rows = [(i % 13,) for i in range(600)] + [(99,)] * 137  # heavy key 99
    df = spark.createDataFrame(rows, "k long")
    sketch = cms_build(df, "k", depth=4, width=64)
    keys = df.select(F.col("k").alias("key")).distinct()
    est = {
        r["key"]: r["estimate"]
        for r in cms_estimate(sketch, keys, "key", depth=4, width=64).collect()
    }
    exact = {
        r["k"]: r["c"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert all(est[k] >= exact[k] for k in exact)
    assert est[99] >= 137  # heavy hitter visible

    half_a = spark.createDataFrame(rows[:300], "k long")
    half_b = spark.createDataFrame(rows[300:], "k long")
    merged = cms_merge(
        cms_build(half_a, "k", depth=4, width=64),
        cms_build(half_b, "k", depth=4, width=64),
    )
    est_m = {
        r["key"]: r["estimate"]
        for r in cms_estimate(merged, keys, "key", depth=4, width=64).collect()
    }
    assert est_m == est  # merge-of-shards == sketch-of-union


def test_packing_bin_contract(spark):
    """Offset packing: every bin's total stays under budget + its largest
    doc (the boundary-crossing doc is the only overrun source), and every
    doc lands in exactly one bin."""
    from pyspark.sql import functions as F

    from msgvault_spark.operators.packing import bin_stats, pack_sequences

    docs = spark.createDataFrame(
        [(i, 10 + (i * 37) % 90) for i in range(200)], "doc_id long, n_tokens long"
    )
    packed = pack_sequences(docs, "doc_id", "n_tokens", budget=128, n_shards=4)
    assert packed.count() == 200
    max_doc = 99
    over = bin_stats(packed).filter(F.col("bin_tokens") >= 128 + max_doc).count()
    assert over == 0
    # deterministic: same input → same assignment
    again = pack_sequences(docs, "doc_id", "n_tokens", budget=128, n_shards=4)
    assert sorted(map(tuple, packed.collect())) == sorted(map(tuple, again.collect()))


def test_hist_quantile_accuracy_and_merge(spark):
    """Histogram-sketch quantiles land within one bin width of the exact
    percentile; merged shard states equal the full-data state."""
    from pyspark.sql import functions as F

    from msgvault_spark.operators.histsketch import (
        hist_merge,
        hist_quantiles,
        hist_sketch,
    )

    rows = [("g", float(v)) for v in range(1, 1001)]
    df = spark.createDataFrame(rows, "grp string, v double")
    state = hist_sketch(df, ["grp"], "v", lo=0, hi=1000, bins=100)
    got = hist_quantiles(
        state, ["grp"], [0.5, 0.9], lo=0, hi=1000, bins=100
    ).head()
    # exact p50=500, p90=900; one-bin-width (10) tolerance, upper-edge bias
    assert abs(got["p50"] - 500) <= 10
    assert abs(got["p90"] - 900) <= 10

    a = hist_sketch(df.filter(F.col("v") <= 500), ["grp"], "v", lo=0, hi=1000, bins=100)
    b = hist_sketch(df.filter(F.col("v") > 500), ["grp"], "v", lo=0, hi=1000, bins=100)
    merged = hist_merge(a, b)
    m = hist_quantiles(merged, ["grp"], [0.5, 0.9], lo=0, hi=1000, bins=100).head()
    assert (m["p50"], m["p90"]) == (got["p50"], got["p90"])


def test_compaction_preserves_rows(spark, tmp_path):
    from msgvault_spark.sources.compact import compact_dir, dir_stats

    lake = str(tmp_path / "frag")
    for i in range(12):
        spark.range(i * 100, (i + 1) * 100).coalesce(1).write.mode(
            "append"
        ).parquet(lake)
    n_before, total = dir_stats(lake)
    assert n_before >= 12
    before = sorted(r["id"] for r in spark.read.parquet(lake).collect())

    n_after = compact_dir(spark, lake, target_bytes=total)  # → 1 file
    assert n_after < n_before
    after = sorted(r["id"] for r in spark.read.parquet(lake).collect())
    assert after == before


def test_compaction_crash_recovery(spark, tmp_path):
    """Every crash point of the rewrite-then-swap heals via recover_dir:
    (a) crash between the two renames with a COMPLETE staging → staging
    promoted; (b) crash with a TORN staging (no _SUCCESS) → old restored;
    (c) leftovers beside a live dir → discarded."""
    import os
    import shutil

    from msgvault_spark.sources.compact import recover_dir

    lake = str(tmp_path / "lake")
    spark.range(100).coalesce(1).write.parquet(lake)
    rows = sorted(r["id"] for r in spark.read.parquet(lake).collect())
    staging, old = lake + ".__compact__", lake + ".__old__"

    # (a) complete staging, live path missing
    spark.range(100).coalesce(1).write.parquet(staging)
    os.rename(lake, old)
    recover_dir(lake)
    assert os.path.exists(lake) and not os.path.exists(old)
    assert sorted(r["id"] for r in spark.read.parquet(lake).collect()) == rows

    # (b) torn staging (no _SUCCESS), live path missing
    os.rename(lake, old)
    os.makedirs(staging)
    with open(os.path.join(staging, "part-torn.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    recover_dir(lake)
    assert os.path.exists(lake) and not os.path.exists(staging)
    assert sorted(r["id"] for r in spark.read.parquet(lake).collect()) == rows

    # (c) stale leftovers beside a live dir
    os.makedirs(staging)
    shutil.copytree(lake, old)
    recover_dir(lake)
    assert not os.path.exists(staging) and not os.path.exists(old)
    assert sorted(r["id"] for r in spark.read.parquet(lake).collect()) == rows


# ---------------------------------------------------------------------------
# chunking (operators/chunking.py)
# ---------------------------------------------------------------------------


def test_chunking_windows_cover_all_tokens(spark):
    from msgvault_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 toks: 1 chunk
            (2, " ".join(f"t{i}" for i in range(100))),  # 100: 1+ceil(96/4)=25? size4 stride... see below
            (3, "   "),  # whitespace only: no chunks
            (4, "one"),
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, size=8, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 3 not in by_doc
    assert [r["n_tokens"] for r in by_doc[4]] == [1]
    # doc 1: 10 tokens, size 8 stride 6 -> chunks at 0 and 6 (len 8, 4)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["n_tokens"] for r in c1] == [8, 4]
    assert c1[0]["chunk_text"].split()[:2] == ["t0", "t1"]
    assert c1[1]["chunk_text"].split()[0] == "t6"  # overlap of 2
    # every token of doc 2 appears in at least one chunk
    toks = set()
    for r in by_doc[2]:
        toks.update(r["chunk_text"].split())
    assert toks == {f"t{i}" for i in range(100)}


def test_chunking_is_shuffle_free(spark):
    from msgvault_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# PII redaction (functions/redact.py)
# ---------------------------------------------------------------------------


_REDACT_DOCS = [
    (1, "mail a.b+c@x-corp.io or b@y.org now"),
    (2, "see https://ex.com/a_b?x=1&y=2. then call 415 555 1234"),
    (3, "inside url http://h.com/path@notmail.com stays one URL"),
    (4, "no pii here 123 45"),
    # a pre-existing placeholder must NOT count as a substitution
    (5, "already has <EMAIL> literal and real z@q.io"),
]


@pytest.mark.parametrize("engine", ["arrow", "jvm"])
def test_redaction_classes_and_counts(spark, engine):
    from msgvault_spark.functions.redact import redact_pii

    docs = spark.createDataFrame(_REDACT_DOCS, "doc_id long, text string")
    rows = {
        r["doc_id"]: r for r in redact_pii(docs, engine=engine).collect()
    }
    assert rows[1]["n_email"] == 2 and rows[1]["redacted_text"] == (
        "mail <EMAIL> or <EMAIL> now"
    )
    assert rows[2]["n_url"] == 1 and rows[2]["n_phone"] == 1
    assert "<URL>" in rows[2]["redacted_text"]
    assert "<PHONE>" in rows[2]["redacted_text"]
    # the @ inside a URL is consumed by the URL pass, not double-redacted
    assert rows[3]["redacted_text"] == "inside url <URL> stays one URL"
    assert rows[4]["redacted_text"] == "no pii here 123 45"
    assert rows[4]["n_email"] == rows[4]["n_phone"] == rows[4]["n_url"] == 0
    assert rows[5]["n_email"] == 1  # the literal token is delta'd away


def test_redaction_engines_agree_on_corpus(spark):
    """The RE2 (arrow) and Catalyst (jvm) spellings are output-identical
    on real corpus text + planted PII — the equivalence that lets the
    catalog entry take the fast path while the oracle pins semantics."""
    from pyspark.sql import functions as F

    from msgvault_spark.catalog_llmops import _PII_SPARK
    from msgvault_spark.functions.redact import redact_pii
    from msgvault_spark.sources.loader import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", F.expr(_PII_SPARK).alias("text")
    )
    a = redact_pii(docs, engine="arrow").orderBy("doc_id").collect()
    j = redact_pii(docs, engine="jvm").orderBy("doc_id").collect()
    assert a == j


# ---------------------------------------------------------------------------
# train/val/test split + temperature mixing (operators/sampling.py)
# ---------------------------------------------------------------------------


def test_split_is_total_disjoint_and_repartition_stable(spark):
    from msgvault_spark.operators.sampling import train_val_test_split

    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    out = train_val_test_split(df, "k", train=0.8, val=0.1)
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 5000
    assert 0.75 < counts["train"] / 5000 < 0.85
    assert 0.06 < counts["val"] / 5000 < 0.14
    # membership is a pure function of the key: survives repartition
    a = {(r["k"], r["split"]) for r in out.collect()}
    b = {(r["k"], r["split"]) for r in train_val_test_split(
        df.repartition(17), "k").collect()}
    assert a == b


def test_temperature_mix_upweights_small_sources(spark):
    from pyspark.sql import functions as F
    from msgvault_spark.operators.sampling import temperature_mix

    big = spark.range(0, 9000).select(
        F.col("id").alias("k"), F.lit("big").alias("src"))
    small = spark.range(9000, 10000).select(
        F.col("id").alias("k"), F.lit("small").alias("src"))
    df = big.union(small)
    kept = temperature_mix(df, "src", "k", target_frac=0.5)
    rates = {
        r["src"]: r["n"]
        for r in kept.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    # √n weighting: small's keep RATE must exceed big's
    assert rates["small"] / 1000 > rates["big"] / 9000
    # and overall survival lands near the 50% target
    assert 0.4 < (rates["small"] + rates["big"]) / 10000 < 0.6


# ---------------------------------------------------------------------------
# bloom semi-join reduction (operators/bloomjoin.py)
# ---------------------------------------------------------------------------


def test_bloom_prefilter_no_false_negatives_and_selective(spark):
    from pyspark.sql import functions as F
    from msgvault_spark.operators.bloomjoin import (
        bloom_join,
        bloom_prefilter,
        build_bloom,
    )

    dim = spark.range(0, 200).select((F.col("id") * 37).alias("k"))
    fact = spark.range(0, 20000).select(F.col("id").alias("k"))
    bloom = build_bloom(dim, "k")
    survivors = bloom_prefilter(fact, bloom, "k")
    true_keys = {r["k"] for r in fact.join(dim, "k").collect()}
    surv_keys = {r["k"] for r in survivors.collect()}
    # every true member survives (bloom can't have false negatives)
    assert true_keys <= surv_keys
    # and the filter is actually selective (fp rate ~0.1% at this fill)
    assert len(surv_keys) < 0.05 * 20000
    # end-to-end join is EXACT despite false positives
    got = sorted(r["k"] for r in bloom_join(fact, dim, "k").collect())
    want = sorted(true_keys)
    assert got == want


def test_bloom_filter_runs_before_fact_exchange(spark):
    from pyspark.sql import functions as F
    from msgvault_spark.operators.bloomjoin import bloom_join

    dim = spark.range(0, 50).select((F.col("id") * 11).alias("k"))
    fact = spark.range(0, 5000).select(F.col("k") if False else F.col("id").alias("k"))
    plan = bloom_join(fact, dim, "k")._jdf.queryExecution().executedPlan().toString()
    # the probe filter (xxhash64 bit tests) must appear in the plan — i.e.
    # the reduction happens map-side, not inside the join
    assert "xxhash64" in plan


# ---------------------------------------------------------------------------
# z-order clustering (operators/zorder.py)
# ---------------------------------------------------------------------------


def test_zorder_layout_prunes_on_both_dimensions(spark, tmp_path):
    from pyspark.sql import functions as F
    from msgvault_spark.operators.zorder import morton_key, zorder_by
    from msgvault_spark.sources.manifest import build_manifest, prune_files

    n_files = 16
    df = spark.range(0, 40000).select(
        (F.col("id") % 200).alias("x"),
        ((F.col("id") * 7919) % 200).alias("y"),
        F.col("id").alias("payload"),
    )

    # Pin shuffle state: earlier tests in the suite may leave AQE /
    # shuffle-partition settings that shift repartitionByRange file
    # boundaries, which changed zkept/xkept by ±1 (order-dependent flake
    # in r3). The discriminating signal is the y-only asymmetry below;
    # the 2-D box comparison is <= because both layouts can legitimately
    # touch the same tiny file count on a 1% box.
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        zdir = str(tmp_path / "zorder")
        xdir = str(tmp_path / "xsort")
        zorder_by(df, "x", "y", n_files=n_files).write.parquet(zdir)
        df.repartitionByRange(n_files, "x").sortWithinPartitions("x").write.parquet(xdir)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    zman = build_manifest(spark, zdir, ["x", "y"])
    xman = build_manifest(spark, xdir, ["x", "y"])
    box = {"x": (20, 39), "y": (20, 39)}  # 1% of the (x, y) space

    zkept = len(prune_files(zman, ranges=box))
    xkept = len(prune_files(xman, ranges=box))
    # x-sorted layout: x prunes, but every kept file spans all of y;
    # z-order: both dims tight, so a 2-D box touches few hypercubes
    assert zkept <= xkept
    assert zkept <= n_files // 2
    # y-only predicate: the x-sorted layout cannot prune at all
    assert len(prune_files(xman, ranges={"y": (20, 39)})) == n_files
    assert len(prune_files(zman, ranges={"y": (20, 39)})) < n_files
    # correctness: reading the pruned subset returns every matching row
    kept = prune_files(zman, ranges=box)
    got = (
        spark.read.parquet(*kept)
        .filter((F.col("x").between(20, 39)) & (F.col("y").between(20, 39)))
        .count()
    )
    want = df.filter(
        (F.col("x").between(20, 39)) & (F.col("y").between(20, 39))
    ).count()
    assert got == want


def test_morton_key_is_pure_map_after_range_broadcast(spark):
    from msgvault_spark.operators.zorder import morton_key

    df = spark.range(0, 100).selectExpr("id as x", "id * 3 as y")
    plan = morton_key(df, "x", "y")._jdf.queryExecution().executedPlan().toString()
    # the min/max range frame arrives via broadcast, not a shuffle exchange
    assert "BroadcastExchange" in plan
    import re
    assert not re.search(r"Exchange hashpartitioning|Exchange rangepartitioning", plan)


# ---------------------------------------------------------------------------
# OPTIMIZE composition (sources/optimize.py)
# ---------------------------------------------------------------------------


def test_optimize_table_compacts_clusters_and_indexes(spark, tmp_path):
    from pyspark.sql import functions as F
    from msgvault_spark.sources.manifest import load_manifest, prune_files
    from msgvault_spark.sources.optimize import optimize_table

    lake = str(tmp_path / "lake")
    df = spark.range(0, 20000).select(
        (F.col("id") % 100).alias("x"),
        ((F.col("id") * 7919) % 100).alias("y"),
        F.col("id").alias("payload"),
    )
    # confetti layout: many small files
    df.repartition(40).write.parquet(lake)

    summary = optimize_table(
        spark, lake, ("x", "y"), target_bytes=64 * 1024
    )
    assert summary["n_rows"] == 20000
    assert summary["files_after"] < summary["files_before"]

    man = load_manifest(spark, str(tmp_path / "lake_meta"))
    total_files = man.count()
    # post-optimize layout prunes on BOTH dimensions
    box = {"x": (10, 19), "y": (10, 19)}
    assert len(prune_files(man, ranges=box)) < total_files
    assert len(prune_files(man, ranges={"y": (10, 19)})) < total_files
    # data intact after the swap
    got = spark.read.parquet(lake).agg(F.sum("payload")).head()[0]
    assert got == sum(range(20000))
    # idempotent second pass (crash-recovery path exercised)
    summary2 = optimize_table(spark, lake, ("x", "y"), target_bytes=64 * 1024)
    assert summary2["n_rows"] == 20000


def test_epoch_upsample_copy_counts(spark):
    from pyspark.sql import functions as F
    from msgvault_spark.operators.sampling import epoch_upsample

    df = spark.createDataFrame(
        [(i, "a" if i < 1000 else "b") for i in range(2000)],
        "k long, src string",
    )
    up = epoch_upsample(df, "src", "k", {"a": 2.5})
    counts = {r["src"]: r["n"] for r in up.groupBy("src").agg(
        F.count("*").alias("n")).collect()}
    assert counts["b"] == 1000  # unlisted source: exactly 1 epoch
    assert 2300 < counts["a"] < 2700  # 2.5 epochs within hash tolerance
    # per-row copies are 2 or 3 for 'a', deterministic across re-plan
    per = up.filter(F.col("src") == "a").groupBy("k").count().collect()
    assert {r["count"] for r in per} == {2, 3}
    again = {(r["k"], r["epoch"]) for r in epoch_upsample(
        df, "src", "k", {"a": 2.5}).filter(F.col("src") == "a").collect()}
    first = {(r["k"], r["epoch"]) for r in up.filter(
        F.col("src") == "a").collect()}
    assert first == again


def test_epoch_upsample_fractional_below_one(spark):
    """e < 1 is sub-epoch sampling: unselected rows must DROP, not pick up
    phantom copies from sequence(0, -1)'s implicit step of -1 (the r2
    advisor finding)."""
    from pyspark.sql import functions as F
    from msgvault_spark.operators.sampling import epoch_upsample

    df = spark.createDataFrame(
        [(i, "a") for i in range(2000)], "k long, src string"
    )
    up = epoch_upsample(df, "src", "k", {"a": 0.25})
    rows = up.collect()
    n = len(rows)
    assert 350 < n < 650  # ~25% of 2000, hash tolerance
    assert all(r["epoch"] == 0 for r in rows)  # never a -1 epoch index
    per = up.groupBy("k").count().collect()
    assert {r["count"] for r in per} == {1}  # at most one copy per key

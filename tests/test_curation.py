"""Round-6 curation operators: DSIR importance selection, length-bucket
padding report, n-gram diversity. Catalog-entry exactness is pinned by the
DuckDB oracle gate (tools/verify_oracle.py); these tests pin the semantic
properties the hash compare can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from msgvault_spark.operators.dsir import (
    bucket_llr,
    dsir_select,
    hash_bucket,
    importance_weights,
)
from msgvault_spark.operators.packing import length_bucket_report
from msgvault_spark.textstats.analysis import ngram_diversity_by_group


def _postings(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, term string, tf long")


def test_dsir_ranks_target_vocabulary_first(spark):
    # target docs (0, 1) speak "alpha/beta"; the rest speak "gamma/delta".
    # A candidate doc 10 written in target vocabulary must outrank doc 11
    # written in raw-only vocabulary.
    rows = []
    for d in (0, 1):
        rows += [(d, "alpha", 5), (d, "beta", 5)]
    for d in (2, 3, 4, 5):
        rows += [(d, "gamma", 5), (d, "delta", 5)]
    rows += [(10, "alpha", 4), (10, "beta", 4)]
    rows += [(11, "gamma", 4), (11, "delta", 4)]
    postings = _postings(spark, rows)
    target = spark.createDataFrame([(0,), (1,)], "doc_id long")
    got = {
        r["doc_id"]: r["weight_micro"]
        for r in dsir_select(postings, target, n_buckets=64, top_n=100).collect()
    }
    assert got[10] > 0 > got[11]
    assert got[0] > got[11] and got[1] > got[11]


def test_dsir_llr_table_is_bucket_bounded(spark):
    rows = [(d, f"t{d}_{i}", 1) for d in range(20) for i in range(30)]
    postings = _postings(spark, rows)
    target = spark.createDataFrame([(0,)], "doc_id long")
    llr = bucket_llr(
        postings.select("doc_id", hash_bucket(F.col("term"), 16), "tf"),
        target,
        n_buckets=16,
    )
    assert llr.count() <= 16  # the broadcast side is K rows, never corpus


def test_dsir_weight_is_tf_linear(spark):
    # doubling every tf of a doc doubles its weight: the weight is a pure
    # integer dot product of (tf, llr_micro) — no hidden normalization
    rows = [(0, "a", 2), (0, "b", 3), (1, "a", 4), (1, "b", 6),
            (2, "c", 5), (3, "d", 5)]
    postings = _postings(spark, rows)
    target = spark.createDataFrame([(2,)], "doc_id long")
    feat = postings.select("doc_id", hash_bucket(F.col("term"), 32), "tf")
    llr = bucket_llr(feat, target, n_buckets=32)
    w = {
        r["doc_id"]: r["weight_micro"]
        for r in importance_weights(feat, llr).collect()
    }
    assert w[1] == 2 * w[0]


def test_length_bucket_report_invariants(spark):
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37, F.lit(90)) + 10).alias("dl"),
    )
    rep = length_bucket_report(docs, "doc_id", "dl").collect()
    assert sum(r["n_docs"] for r in rep) == 200
    for r in rep:
        assert r["padded_tokens"] >= r["real_tokens"] > 0
        assert 0 <= r["waste_ppm"] < 1_000_000
        # realized batches never exceed the ceil(n/16) plan (hash
        # assignment may leave a planned batch empty, never overflow it)
        assert r["n_batches"] <= -(-r["n_docs"] // 16)
        assert r["bucket"] <= 12


def test_length_bucket_caps_long_tail(spark):
    docs = spark.createDataFrame(
        [(1, 5), (2, 500), (3, 5000)], "doc_id long, dl long"
    )
    rep = {r["bucket"]: r for r in length_bucket_report(docs, "doc_id", "dl").collect()}
    assert set(rep) == {0, 12}  # 5→bucket 0; 500 and 5000 both cap at 12
    assert rep[12]["n_docs"] == 2


def test_ngram_diversity_orders_template_below_fresh(spark):
    template = " ".join(["the same line over and over"] * 30)
    fresh = " ".join(f"word{i}" for i in range(180))
    docs = spark.createDataFrame(
        [("rep", template), ("rep", template), ("uniq", fresh)],
        "source string, text string",
    )
    got = {
        r["grp"]: r for r in ngram_diversity_by_group(docs, "source", "text").collect()
    }
    assert got["rep"]["diversity_ppm"] < got["uniq"]["diversity_ppm"]
    assert got["uniq"]["distinct_ngrams"] == got["uniq"]["total_ngrams"] == 178
    # short-doc rule: a doc below n grams contributes its whole text once
    tiny = spark.createDataFrame([("s", "two words")], "source string, text string")
    row = ngram_diversity_by_group(tiny, "source", "text").collect()[0]
    assert row["total_ngrams"] == 1 and row["distinct_ngrams"] == 1


def test_hard_negatives_exclude_same_label(spark):
    rows = [
        (0, [1.0, 0.0], 7),     # query
        (1, [0.99, 0.14], 7),   # nearest but SAME label — must be excluded
        (2, [0.9, 0.44], 8),
        (3, [0.0, 1.0], 9),
        (4, [0.8, 0.6], 7),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    from msgvault_spark.similarity.knnjoin import hard_negative_join

    got = hard_negative_join(
        emb, emb.filter(F.col("vec_id") == 0), k=2
    ).collect()
    ids = [r["id"] for r in got]
    assert ids == [2, 3] or set(ids) == {2, 3}  # 1 and 4 share label 7
    assert all(r["qid"] == 0 for r in got)


def test_bounded_stratified_sample_matches_window_variant(spark):
    # the bounded two-level bottom-k must select EXACTLY the same members
    # as the window-rank variant — same hash order, same quota
    from msgvault_spark.operators.sampling import (
        bounded_stratified_sample,
        stratified_sample,
    )

    df = spark.range(500).select(
        F.col("id").alias("k"),
        (F.pmod(F.col("id"), F.lit(7))).alias("g"),
    )
    want = {
        (r["g"], r["k"])
        for r in stratified_sample(df, ["g"], "k", quota=11).collect()
    }
    got = {
        (r["g"], r["k"])
        for r in bounded_stratified_sample(df, ["g"], "k", 11).collect()
    }
    assert got == want and len(got) == 7 * 11


def test_bounded_stratified_sample_small_groups_kept_whole(spark):
    from msgvault_spark.operators.sampling import bounded_stratified_sample

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "k long, g string"
    )
    got = bounded_stratified_sample(df, ["g"], "k", 10).collect()
    assert len(got) == 3


def test_source_divergence_separates_shared_from_disjoint_vocab(spark):
    from msgvault_spark.operators.dsir import source_divergence_matrix

    # sources a and b share a vocabulary; c is disjoint. JSD(a,b) must be
    # far below JSD(a,c), and every value non-negative.
    rows = []
    for d, src, terms in (
        (0, "a", ["x", "y", "z"]),
        (1, "a", ["x", "y", "w"]),
        (2, "b", ["x", "y", "z"]),
        (3, "b", ["y", "z", "w"]),
        (4, "c", ["q1", "q2", "q3"]),
        (5, "c", ["q2", "q3", "q4"]),
    ):
        rows += [(d, t, 3) for t in terms]
    postings = spark.createDataFrame(
        rows, "doc_id long, term string, tf long"
    )
    srcs = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, "b"), (4, "c"), (5, "c")],
        "doc_id long, source string",
    )
    got = {
        (r["source_a"], r["source_b"]): r["jsd_nano"]
        for r in source_divergence_matrix(
            postings, srcs, n_buckets=64
        ).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert all(v >= 0 for v in got.values())
    assert got[("a", "b")] < got[("a", "c")]
    assert got[("a", "b")] < got[("b", "c")]


def test_curriculum_deciles_are_monotone_and_complete(spark):
    from msgvault_spark.catalog import CATALOG

    rep = sorted(
        CATALOG["curriculum_decile_plan"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r["phase"],
    )
    assert [r["phase"] for r in rep] == list(range(len(rep)))
    # later phases contain strictly harder (higher-NLL) documents
    for a, b in zip(rep, rep[1:]):
        assert a["max_nll"] <= b["min_nll"]
    assert all(r["min_nll"] <= r["max_nll"] for r in rep)


def test_bpe_pairs_are_two_chars_and_freq_sorted(spark):
    from msgvault_spark.catalog import CATALOG

    rows = CATALOG["bpe_merge_candidates"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows and all(len(r["pair"]) == 2 for r in rows)
    freqs = [r["freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)


def test_dsir_empty_target_yields_zero_weights_not_null(spark):
    # review finding: an empty target set must mirror the oracle's
    # COALESCE(SUM(nt), 0) — finite weights, never NULL
    rows = [(0, "a", 2), (1, "b", 3)]
    postings = _postings(spark, rows)
    empty_target = spark.createDataFrame([], "doc_id long")
    got = dsir_select(postings, empty_target, n_buckets=16, top_n=10).collect()
    assert len(got) == 2
    assert all(r["weight_micro"] is not None for r in got)


def test_ngram_instances_degenerate_docs_contribute_nothing(spark):
    from msgvault_spark.textstats.analysis import ngram_instances

    docs = spark.createDataFrame(
        [(None,), ("!!!",), ("alpha beta gamma delta",)], "text string"
    )
    got = docs.select(
        F.size(ngram_instances(F.col("text"), 3)).alias("n")
    ).collect()
    assert sorted(r["n"] for r in got) == [0, 0, 2]


def test_length_bucket_entry_counts_tokenless_docs(spark, tmp_path):
    # review finding: docs with no alphanumeric tokens must land in
    # bucket 0 (the oracle counts every documents row)
    import os
    docs = spark.createDataFrame(
        [(0, "hello world sample text here okay", "en", "s", 34),
         (1, "!!!", "en", "s", 3),
         (2, None, "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )
    from msgvault_spark.catalog import CATALOG
    rep = {r["bucket"]: r for r in CATALOG["length_bucket_report"].fn(spark, sf).collect()}
    assert rep[0]["n_docs"] == 3  # token-less + NULL-text docs included

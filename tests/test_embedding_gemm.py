"""dedup/embedding_gemm.lsh_near_dups_gemm must emit BIT-identical rows
to dedup/embedding.lsh_near_dups on every input — it is the staged r10
call-site replacement (SCALING.md round-9), and the swap is only safe if
the GEMM margin can never drop a true pair and the fold re-verify keeps
the emitted cos bits. Compared as exact sorted row tuples (ids + the
rounded double's repr), never by tolerance.
"""

from __future__ import annotations

import math

import pytest

from msgvault_spark.dedup.embedding import lsh_near_dups
from msgvault_spark.dedup.embedding_gemm import lsh_near_dups_gemm


def _rows(df):
    return sorted(
        (r["id_a"], r["id_b"], repr(r["cos"])) for r in df.collect()
    )


def _assert_twin(emb, threshold, **kw):
    fold = _rows(lsh_near_dups(emb, threshold, **kw))
    gemm = _rows(lsh_near_dups_gemm(emb, threshold, **kw))
    assert fold == gemm
    return fold


def test_equal_on_real_corpus(spark):
    from msgvault_spark.sources.loader import load_table

    # sf0.01: the smallest scale where the catalog parameters
    # (_LSH_ND_THRESHOLD=0.45, 8 planes) actually yield pairs
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    got = _assert_twin(emb, 0.45, dim=64, n_planes=8)
    assert got  # the real corpus must actually produce pairs


def test_equal_on_adversarial_corpus(spark):
    """Identicals (cos exactly 1.0), a pair straddling the threshold, a
    zero vector (NULL cosine must vanish from both), opposite-bucket
    vectors, and floats whose GEMM/fold results differ before rounding."""
    rows = (
        [(i, [1.0, 0.5, 0.25, 0.125]) for i in range(6)]  # identical six
        + [
            (100, [-1.0, -0.5, 0.25, 0.125]),
            (101, [-1.0, -0.5, 0.26, 0.125]),  # just over threshold
            (102, [-1.0, -0.5, 0.80, 0.125]),  # same bucket, under it
            (200, [0.0, 0.0, 0.0, 0.0]),       # zero norm → NULL cos
            (201, [0.0, 0.0, 0.0, 0.0]),
            (300, [math.pi, -1 / 3, 1e-7, 2 / 3]),
            (301, [math.pi, -1 / 3, 1.1e-7, 2 / 3]),
        ]
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = _assert_twin(emb, 0.90, dim=4)
    ids = {(a, b) for a, b, _ in got}
    assert (0, 1) in ids and (100, 101) in ids and (300, 301) in ids
    assert not any(200 in p or 201 in p for p in ids)  # NULLs dropped
    assert not any(102 in p for p in ids)


def test_equal_with_bucket_cap_star_edges(spark):
    """Over-cap buckets must keep the exact star-edge semantics of the
    fold version (hot cluster → hub pairs only), under-cap buckets the
    full GEMM-proposed set."""
    emb = spark.createDataFrame(
        [(i, [1.0, 0.5, 0.25, 0.125]) for i in range(20)]
        + [(100, [-1.0, -0.5, 0.25, 0.125]),
           (101, [-1.0, -0.5, 0.26, 0.125])],
        "vec_id long, embedding array<double>",
    )
    got = _assert_twin(emb, 0.90, dim=4, bucket_cap=8)
    ids = {(a, b) for a, b, _ in got}
    assert {p for p in ids if p[1] < 100} == {(0, i) for i in range(1, 20)}
    assert (100, 101) in ids


def test_equal_on_float32_corpus_and_tiny_blocks(spark):
    """array<float> input (the parquet type) and group_rows=2 so every
    bucket splits into many sub-blocks — diagonal AND off-diagonal tile
    paths both exercised."""
    import struct

    def f32(x: float) -> float:
        return struct.unpack("f", struct.pack("f", x))[0]

    rows = [
        (i, [f32(v) for v in (1.0 + i * 1e-4, 0.5, 0.25, 0.125)])
        for i in range(12)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    fold = _rows(lsh_near_dups(emb, 0.99, dim=4))
    gemm = _rows(
        lsh_near_dups_gemm(emb, 0.99, dim=4, group_rows=2)
    )
    assert fold == gemm
    assert len(fold) == 12 * 11 // 2  # all mutually near-identical


def test_empty_corpus(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert _rows(lsh_near_dups_gemm(emb, 0.9, dim=4)) == []


def test_null_vector_shares_bucket_with_dense(spark):
    """Round-9 advice: a NULL embedding crashed the GEMM tiles because
    collect_list skips nulls, misaligning ids against vecs. With
    n_planes=1 a NULL signature folds to bucket '0'; place two dense
    vectors in that same bucket so the tile genuinely mixes NULL and
    dense members — the fold twin drops the NULL pairs via NULL cos,
    and the GEMM twin must emit the identical row set, not raise."""
    from msgvault_spark.dedup.embedding import _plane_coeff

    coeffs = [_plane_coeff(0, d) for d in range(4)]
    v = [-c for c in coeffs]            # dot(plane0) = -Σc² < 0 → bucket '0'
    v2 = [x * 1.0001 for x in v]        # same direction → same bucket, cos≈1
    emb = spark.createDataFrame(
        [(1, v), (2, v2), (3, None)],
        "vec_id long, embedding array<double>",
    )
    got = _assert_twin(emb, 0.9, dim=4, n_planes=1)
    assert {(a, b) for a, b, _ in got} == {(1, 2)}


def test_null_vectors_under_bucket_cap(spark):
    """The over/under-cap split must stay computed on UNFILTERED postings:
    11 NULL-vector docs bust an 8-cap bucket (star edges over NULL members,
    all rescoring to NULL → dropped) while a dense under-cap pair survives.
    Twin equality pins that the null-filter did not move the cap split."""
    emb = spark.createDataFrame(
        [(i, None) for i in range(11)]
        + [(100, [-1.0, -0.5, 0.25, 0.125]),
           (101, [-1.0, -0.5, 0.26, 0.125])],
        "vec_id long, embedding array<double>",
    )
    got = _assert_twin(emb, 0.90, dim=4, bucket_cap=8)
    assert {(a, b) for a, b, _ in got} == {(100, 101)}


def test_auto_planes_policy(spark):
    """n_planes=None resolves via planes_for_corpus and matches the same
    run with the count passed explicitly (both twins)."""
    from msgvault_spark.dedup.embedding import planes_for_corpus

    # policy shape: monotone in N, halving-per-plane, clamped
    assert planes_for_corpus(0) == 4
    assert planes_for_corpus(1024) == 4
    assert planes_for_corpus(1 << 20) == 10
    assert planes_for_corpus(10_000_000) == 14
    assert planes_for_corpus(1 << 60) == 28

    rows = [
        (i, [1.0 + i * 1e-3, -0.5, 0.25, 0.125]) for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    p = planes_for_corpus(30)
    auto = _rows(lsh_near_dups_gemm(emb, 0.9, dim=4, n_planes=None))
    explicit = _rows(lsh_near_dups_gemm(emb, 0.9, dim=4, n_planes=p))
    fold_auto = _rows(lsh_near_dups(emb, 0.9, dim=4, n_planes=None, n_rows=30))
    assert auto == explicit == fold_auto
    assert auto  # near-identical vectors must pair

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

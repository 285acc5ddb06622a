"""similarity/flat.py: the codegen-able flat kernels must be BIT-identical
to the interpreted folds they will replace (knn.dot/l2_norm/cosine, the
rp.py projection component, the embedding.py hyperplane dot) — the r10
call-site flip is only safe if swapping implementations can never move
an oracle hash. Exact `==` on collected doubles, no tolerance.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from msgvault_spark.dedup.embedding import _plane_coeff
from msgvault_spark.functions.arrays import lit_double_array
from msgvault_spark.similarity.flat import (
    cosine_flat,
    dot_coeffs,
    dot_coeffs_sql,
    dot_cols_sql,
    l2_norm_sql,
)
from msgvault_spark.similarity.knn import _as_double, cosine, dot, l2_norm
from msgvault_spark.similarity.rp import rp_sign

DIM = 8

# edge vectors: zeros (±0.0 products), sign mixes, denormal-ish tiny vs
# huge magnitude (reassociation would visibly change these), exact-binary
# and non-representable decimals
_VECS = [
    [0.0] * DIM,
    [1.0, -1.0, 2.5, -2.5, 0.1, -0.1, 3.3, -3.3],
    [1e-300, 1e300, -1e-300, -1e300, 1.0, -1.0, 1e-15, 1e15],
    [0.1] * DIM,
    [float(i) for i in range(1, DIM + 1)],
    [-0.0, 0.0, -0.0, 0.0, -0.0, 0.0, -0.0, 0.0],
    [math.pi, -math.e, 1 / 3, -2 / 3, 1e-7, -1e7, 0.5, -0.25],
]


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(_VECS)]
    return spark.createDataFrame(rows, "id long, v array<double>")


@pytest.fixture(scope="module")
def fvecs(spark):
    """Same vectors as array<float> — the raw parquet embedding type the
    flat kernels CAST per element, vs the folds' _as_double transform."""
    import struct

    def f32(x: float) -> float:
        return struct.unpack("f", struct.pack("f", x))[0]

    rows = []
    for i, v in enumerate(_VECS):
        try:
            rows.append((i, [f32(x) for x in v]))
        except OverflowError:
            continue  # 1e300 has no float32; that row tests double-only
    return spark.createDataFrame(rows, "id long, v array<float>")


def _pairs(df):
    a = df.select(F.col("id").alias("ia"), F.col("v").alias("va"))
    b = df.select(F.col("id").alias("ib"), F.col("v").alias("vb"))
    return a.crossJoin(b)


def test_dot_cols_bitwise_equal(vecs):
    p = _pairs(vecs)
    rows = p.select(
        "ia",
        "ib",
        dot(F.col("va"), F.col("vb")).alias("fold"),
        F.expr(dot_cols_sql("va", "vb", DIM)).alias("flat"),
    ).collect()
    assert rows
    for r in rows:
        assert _same_float(r["fold"], r["flat"]), (r["ia"], r["ib"])


def test_l2_norm_bitwise_equal(vecs):
    rows = vecs.select(
        "id",
        l2_norm(F.col("v")).alias("fold"),
        F.expr(l2_norm_sql("v", DIM)).alias("flat"),
    ).collect()
    for r in rows:
        assert _same_float(r["fold"], r["flat"]), r["id"]


def test_cosine_bitwise_equal_including_zero_norm_null(vecs):
    p = _pairs(vecs)
    rows = p.select(
        "ia",
        "ib",
        cosine(F.col("va"), F.col("vb")).alias("fold"),
        cosine_flat("va", "vb", DIM).alias("flat"),
    ).collect()
    saw_null = False
    for r in rows:
        if r["fold"] is None:
            saw_null = True
            assert r["flat"] is None, (r["ia"], r["ib"])
        else:
            assert _same_float(r["fold"], r["flat"]), (r["ia"], r["ib"])
    assert saw_null  # the zero vector must exercise the try_divide branch


def test_float32_input_cast_matches_transform_cast(fvecs):
    """On raw array<float> input the folds go through _as_double
    (transform cast); the flat kernels CAST each element. Same bits."""
    p = (
        fvecs.select(F.col("id").alias("ia"), F.col("v").alias("va"))
        .crossJoin(
            fvecs.select(F.col("id").alias("ib"), F.col("v").alias("vb"))
        )
    )
    rows = p.select(
        "ia",
        "ib",
        cosine(_as_double(F.col("va")), _as_double(F.col("vb"))).alias(
            "fold"
        ),
        cosine_flat("va", "vb", DIM).alias("flat"),
    ).collect()
    assert rows
    for r in rows:
        if r["fold"] is None:
            assert r["flat"] is None
        else:
            assert _same_float(r["fold"], r["flat"])


def test_dot_coeffs_matches_rp_fold_component(vecs):
    """The JL projection component: fold over zip_with(v, signs) vs the
    flat literal-coefficient sum, for every output dim j."""
    for j in range(4):
        signs = [float(rp_sign(j, d)) for d in range(DIM)]
        fold = F.aggregate(
            F.zip_with(
                F.col("v"), lit_double_array(signs), lambda x, s: x * s
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        rows = vecs.select(
            fold.alias("fold"), dot_coeffs("v", signs).alias("flat")
        ).collect()
        for r in rows:
            assert _same_float(r["fold"], r["flat"]), j


def test_dot_coeffs_matches_hyperplane_dot_and_sign_bits(vecs):
    """The LSH signature bit: sign agreement on the plane dot for every
    plane, including the all-zero vector (dot exactly ±0.0 → bit '1')."""
    for p in range(4):
        coeffs = [_plane_coeff(p, d) for d in range(DIM)]
        fold = F.aggregate(
            F.zip_with(
                F.col("v"), lit_double_array(coeffs), lambda x, y: x * y
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        rows = vecs.select(
            fold.alias("fold"),
            dot_coeffs("v", coeffs).alias("flat"),
        ).collect()
        for r in rows:
            assert _same_float(r["fold"], r["flat"]), p
            assert (r["fold"] >= 0) == (r["flat"] >= 0)


def test_sql_renders_one_expression_per_kernel():
    """Plan-construction budget: each kernel is ONE F.expr parse, not
    O(dim) Py4J column ops (functions/arrays.py rationale)."""
    sql = dot_coeffs_sql("v", [0.5] * 64)
    assert sql.count("element_at") == 64
    assert sql.startswith("0.0D")
    sql2 = dot_cols_sql("a", "b", 64)
    assert sql2.count("element_at") == 128
    assert l2_norm_sql("a", 64).startswith("sqrt(0.0D")


def _same_float(a, b) -> bool:
    """Bitwise equality (distinguishes -0.0 from 0.0; NaN == NaN)."""
    return math.copysign(1.0, a) == math.copysign(1.0, b) and (
        a == b or (math.isnan(a) and math.isnan(b))
    )

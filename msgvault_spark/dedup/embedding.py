"""Embedding-cosine near-duplicate detection.

Baseline: exact all-pairs cosine above a threshold (O(N²) — correctness
oracle and small-corpus path). Scale path: random-hyperplane LSH — sign
bits of dot products with fixed pseudo-random planes bucket the vectors, and
only within-bucket pairs are scored (the 100 TB shape: candidate generation
is a groupBy, scoring is bounded by bucket width).

The hyperplanes are derived deterministically from md5 so both engines (and
reruns) agree: plane p, dim d → uniform in [-1, 1) from 6 md5 hex digits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from msgvault_spark.functions.arrays import lit_double_array

from msgvault_spark.similarity.knn import cosine, _as_double


def allpairs_near_dups(
    embeddings: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """(id_a, id_b, cos) for pairs with cosine ≥ threshold, id_a < id_b."""
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = cosine(_as_double(F.col("va")), _as_double(F.col("vb")))
    return (
        pairs.withColumn("cos", F.round(cos, round_to))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
        .sortWithinPartitions("id_a", "id_b")
    )


def _plane_coeff(p: int, d: int) -> float:
    """Deterministic pseudo-random coefficient in [-1, 1): 6 hex digits of
    md5(f'{p}:{d}') scaled. Pure Python (planes are tiny; shipped as
    literals into the plan)."""
    import hashlib

    h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:6]
    return int(h, 16) / float(16**6 // 2) - 1.0


def hyperplane_signature(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Bit-string bucket key: sign of <v, plane_p> per plane."""
    bits = []
    for p in range(n_planes):
        coeffs = lit_double_array(_plane_coeff(p, d) for d in range(dim))
        dot_p = F.aggregate(
            F.zip_with(vec, coeffs, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot_p >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_near_dups(
    embeddings: DataFrame,
    threshold: float,
    *,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Approximate near-dup pairs: only same-bucket pairs are scored.
    Recall trades against bucket width via n_planes."""
    sig = embeddings.select(
        F.col(id_col).alias("doc_id"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("bucket", hyperplane_signature(F.col("v"), dim, n_planes))
    a = sig.select(
        F.col("bucket"), F.col("doc_id").alias("id_a"), F.col("v").alias("va")
    )
    b = sig.select(
        F.col("bucket"), F.col("doc_id").alias("id_b"), F.col("v").alias("vb")
    )
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    cos = cosine(F.col("va"), F.col("vb"))
    return (
        pairs.withColumn("cos", F.round(cos, round_to))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
        .distinct()
        .sortWithinPartitions("id_a", "id_b")
    )
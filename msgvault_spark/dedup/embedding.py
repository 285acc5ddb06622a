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
    group_rows: int = 2048,
    n_rows: int | None = None,
) -> DataFrame:
    """(id_a, id_b, cos) for pairs with cosine ≥ threshold, id_a < id_b.

    Two phases. Candidates come from a blocked matrix product: rows are
    hash-bucketed into groups of ~``group_rows``, group pairs (ga ≤ gb) are
    joined, and one Arrow batch per group pair runs a float64 GEMM — the
    O(N²·d) work at BLAS speed instead of one interpreted fold per pair.
    A pair survives if its GEMM cosine clears ``threshold`` minus a margin
    wider than both the fp-reassociation gap and the half-ulp the final
    rounding can add, so the candidate set has no false negatives. Survivors
    (a tiny set) are then re-scored by the SAME JVM-fold expression the
    single-phase version used, keeping the emitted ``cos`` bit-identical to
    the sequential-fold/round semantics the oracle pins.

    Task memory is bounded by 2·group_rows vectors per GEMM tile regardless
    of corpus size; group count grows as N/group_rows, so the block-pair
    join fans out to (N/group_rows)²/2 independent tasks — the right shape
    for an exactness baseline (the LSH variant below remains the 100 TB
    candidate-pruning path).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    emb = embeddings.select(F.col(id_col), F.col(vec_col))
    # pass n_rows (e.g. a memoized catalog statistic) to avoid an eager
    # count job during plan construction; only the GROUP COUNT depends on
    # it, so a stale-but-close value is fine
    n = embeddings.count() if n_rows is None else n_rows
    n_groups = max(1, -(-n // group_rows))
    blocks = emb.groupBy(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups)).alias("g")
    ).agg(
        F.collect_list(F.col(id_col)).alias("ids"),
        F.collect_list(F.col(vec_col)).alias("vecs"),
    )
    ba = blocks.select(
        F.col("g").alias("ga"),
        F.col("ids").alias("ids_a"),
        F.col("vecs").alias("vecs_a"),
    )
    bb = blocks.select(
        F.col("g").alias("gb"),
        F.col("ids").alias("ids_b"),
        F.col("vecs").alias("vecs_b"),
    )
    tiles = ba.join(bb, F.col("ga") <= F.col("gb"))

    # margin: half-ulp of the final rounding (rounding can only raise a
    # just-under value by 0.5·10^-round_to) plus fp-reassociation slack.
    # The slack is dimension-scaled per tile, not a fixed constant: cosine
    # is scale-invariant, and for any input magnitude the numerator error
    # of either evaluation order is ≤ γ_d·Σ|aᵢbᵢ| ≤ γ_d·‖a‖‖b‖ (Cauchy–
    # Schwarz), i.e. ≤ ~d·eps relative to the cosine denominator; norms
    # contribute the same order again. 8·d·eps covers GEMM-vs-sequential-
    # JVM-fold divergence with >2× headroom at any vector scale.
    half_ulp = 0.5 * 10.0 ** (-round_to)

    def _gemm_tile(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(row.ids_a, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                A = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in row.vecs_a]
                )
                B = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in row.vecs_b]
                )
                d = A.shape[1] if A.ndim == 2 else 1
                cut = threshold - (
                    half_ulp + 8.0 * d * np.finfo(np.float64).eps
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    na = np.sqrt((A * A).sum(axis=1))
                    nb = np.sqrt((B * B).sum(axis=1))
                    cos = (A @ B.T) / np.outer(na, nb)
                cond = cos >= cut
                if row.ga == row.gb:
                    # diagonal tile: each unordered pair appears as (i,j)
                    # AND (j,i) — keep the upper triangle only
                    cond &= ids_a[:, None] < ids_b[None, :]
                ii, jj = np.nonzero(cond)
                if ii.size == 0:
                    continue
                lo = np.minimum(ids_a[ii], ids_b[jj])
                hi = np.maximum(ids_a[ii], ids_b[jj])
                keep = lo < hi
                yield pd.DataFrame(
                    {"id_a": lo[keep], "id_b": hi[keep]}
                )

    cand_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
        ]
    )
    cand = tiles.mapInPandas(_gemm_tile, schema=cand_schema)

    a = emb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = emb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    pairs = cand.join(a, "id_a").join(b, "id_b")
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


DEFAULT_TARGET_BUCKET_POP = 1024


def planes_for_corpus(
    n_docs: int,
    *,
    target_bucket_pop: int = DEFAULT_TARGET_BUCKET_POP,
    min_planes: int = 4,
    max_planes: int = 28,
) -> int:
    """Plane-count policy: smallest p with expected bucket population
    n_docs / 2^p ≤ target_bucket_pop.

    Rescore work grows as Σ pop_b² — quadratic in docs-per-bucket — so a
    FIXED plane count stops scaling: 8 planes that give ~80-doc buckets
    at 20k docs give ~40k-doc buckets at 10M docs. Under the (sign-bit
    uniformity) model each extra plane halves the expected population,
    so p = ceil(log2(n / target)) keeps expected rescore pairs per doc
    bounded by ~target/2 at ANY corpus size; real-corpus skew (correlated
    boilerplate embeddings that sign-agree on every plane) is the
    bucket_cap's job, not the plane count's (dedup/hotbuckets.py).
    Measured curve: SCALING.md round-10 (tools/stress_hotbuckets.py
    --planes-curve, 1M→10M docs at a fixed target)."""
    import math

    if n_docs <= 0:
        return min_planes
    p = math.ceil(math.log2(max(1.0, n_docs / target_bucket_pop)))
    return max(min_planes, min(max_planes, p))


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
    n_planes: int | None = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    bucket_cap: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Approximate near-dup pairs: only same-bucket pairs are scored.
    Recall trades against bucket width via n_planes.

    Scale shape: the bucket self-join ships (bucket, doc_id) only — the
    float vectors decorate the pair list afterwards (two joins against
    the slim vector table), so a B-member bucket shuffles O(B) ids, not
    O(B²) d-dimensional vectors.  Each doc lands in exactly one bucket
    (a single hyperplane signature), so the pair list is unique without
    a distinct.  ``bucket_cap`` bounds hot buckets (near-identical
    boilerplate embeddings all sign-agree): over the cap, O(B)
    representative star edges replace O(B²) pairing, still
    cosine-verified — see dedup/hotbuckets.py.  ``n_planes=None`` picks
    the count from corpus size (planes_for_corpus; pass ``n_rows`` to
    avoid an eager count when a memoized statistic is at hand)."""
    if n_planes is None:
        n_planes = planes_for_corpus(
            embeddings.count() if n_rows is None else n_rows
        )
    sig = embeddings.select(
        F.col(id_col).alias("doc_id"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("bucket", hyperplane_signature(F.col("v"), dim, n_planes))
    from msgvault_spark.dedup.hotbuckets import capped_pair_propose

    # each doc is in exactly one bucket → pairs are already unique
    pairs = capped_pair_propose(sig.select("bucket", "doc_id"), bucket_cap)
    vmap = sig.select("doc_id", "v")
    cands = pairs.join(
        vmap.select(F.col("doc_id").alias("id_a"), F.col("v").alias("va")),
        "id_a",
    ).join(
        vmap.select(F.col("doc_id").alias("id_b"), F.col("v").alias("vb")),
        "id_b",
    )
    cos = cosine(F.col("va"), F.col("vb"))
    return (
        cands.withColumn("cos", F.round(cos, round_to))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
        .sortWithinPartitions("id_a", "id_b")
    )


def lsh_near_dups_oracle_sql(
    threshold: float,
    *,
    dim: int,
    n_planes: int = 8,
    round_to: int = 6,
) -> str:
    """DuckDB twin of lsh_near_dups: the plane coefficients are the SAME
    Python-computed literals the Spark plan folds in (_plane_coeff), so
    both engines compute identical signature bits; the rescoring cosine
    is the shared rounded form."""
    cases = []
    for p in range(n_planes):
        coeffs = ", ".join(repr(_plane_coeff(p, d)) for d in range(dim))
        dot = (
            f"list_sum(list_transform(list_zip(embedding, [{coeffs}]), "
            "x -> CAST(x[1] AS DOUBLE) * x[2]))"
        )
        cases.append(
            f"(CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END)"
        )
    sig = " || ".join(cases)
    cos = (
        "round(list_sum(list_transform(list_zip(a.embedding, b.embedding), "
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / "
        "(sqrt(list_sum(list_transform(a.embedding, "
        "v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) * "
        "sqrt(list_sum(list_transform(b.embedding, "
        f"v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))), {round_to})"
    )
    return f"""
WITH sig AS (
    SELECT vec_id, embedding, {sig} AS bucket
    FROM embeddings
)
SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cos
FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
ORDER BY id_a, id_b
"""

"""Skew-resistant aggregation: explicit two-phase salted aggregates.

At 100 TB a groupBy on a low-cardinality or power-law key (label, domain,
orderpriority) concentrates entire keys in single reducers. AQE's skew-join
splitting does not help aggregations; the classic fix is salting:

    phase 1: group by (key, salt) where salt = hash(row) % n_salts —
             n_salts-way fan-out of every hot key, all reducers busy;
    phase 2: group by key over the n_salts partial rows — tiny.

Spark already performs map-side partial aggregation for simple aggregates,
which covers MOST skew; explicit salting matters when the aggregate state
is large (collect_list/collect_set, distinct counts) and the partial-agg
hash table overflows per-task memory on hot keys. The salt column makes the
fan-out explicit and plan-visible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: Column | str,
    aggs: dict[str, tuple[str, str]],
    *,
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase aggregate of ``df`` by ``key``.

    ``aggs`` maps output column → (input expr, agg kind) with kind one of
    'sum' | 'count' | 'min' | 'max' (the re-associable aggregates: phase 2
    merges partials with sum/sum/min/max respectively).

    ``salt_source``: expression the salt is derived from (defaults to a
    per-row random-ish hash of all columns via monotonically increasing id
    -free xxhash64 of the key + a row fingerprint). Deterministic given
    deterministic input."""
    key_col = F.col(key) if isinstance(key, str) else key
    salt = (
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
        if salt_source is None
        else F.pmod(F.xxhash64(salt_source), F.lit(n_salts))
    )

    phase1_aggs = []
    phase2_aggs = []
    for out, (expr, kind) in aggs.items():
        partial = f"__p_{out}"
        if kind == "count":
            phase1_aggs.append(F.count(F.expr(expr)).alias(partial))
            phase2_aggs.append(F.sum(partial).alias(out))
        elif kind == "sum":
            phase1_aggs.append(F.sum(F.expr(expr)).alias(partial))
            phase2_aggs.append(F.sum(partial).alias(out))
        elif kind == "min":
            phase1_aggs.append(F.min(F.expr(expr)).alias(partial))
            phase2_aggs.append(F.min(partial).alias(out))
        elif kind == "max":
            phase1_aggs.append(F.max(F.expr(expr)).alias(partial))
            phase2_aggs.append(F.max(partial).alias(out))
        else:
            raise ValueError(f"unsupported agg kind: {kind}")

    partials = (
        df.withColumn("__salt", salt)
        .groupBy(key_col.alias("key"), F.col("__salt"))
        .agg(*phase1_aggs)
    )
    return partials.groupBy("key").agg(*phase2_aggs)


def salted_count_distinct(
    df: DataFrame,
    key: Column | str,
    distinct_col: str,
    *,
    n_salts: int = 16,
) -> DataFrame:
    """COUNT(DISTINCT x) per hot key without funnelling any key through one
    reducer: salt BY THE DISTINCT VALUE so each (key, salt) partition holds
    a disjoint slice of x's value space — phase-2 sum of partial distinct
    counts is then exact."""
    key_col = F.col(key) if isinstance(key, str) else key
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salts))
    partials = (
        df.withColumn("__salt", salt)
        .groupBy(key_col.alias("key"), F.col("__salt"))
        .agg(F.count_distinct(F.col(distinct_col)).alias("__pd"))
    )
    return partials.groupBy("key").agg(
        F.sum("__pd").cast("long").alias("distinct_count")
    )


def salted_agg_with_distinct(
    df: DataFrame,
    key: Column | str,
    aggs: dict[str, tuple[str, str]],
    distinct_col: str,
    *,
    n_salts: int = 16,
) -> DataFrame:
    """One-pass fusion of salted_agg + salted_count_distinct: salt BY THE
    DISTINCT VALUE. Partial distinct counts are exact because each
    (key, salt) bucket holds a disjoint slice of distinct_col's value
    space, and the re-associable aggregates (sum/count/min/max) merge
    correctly across ANY row partition — so one scan and one shuffle pair
    serve both, instead of two of each (the two-call formulation scans
    the fact table twice)."""
    key_col = F.col(key) if isinstance(key, str) else key
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salts))
    phase1 = [F.count_distinct(F.col(distinct_col)).alias("__pd")]
    phase2 = [F.sum("__pd").cast("long").alias("distinct_count")]
    for out, (expr, kind) in aggs.items():
        partial = f"__p_{out}"
        if kind == "count":
            phase1.append(F.count(F.expr(expr)).alias(partial))
            phase2.append(F.sum(partial).alias(out))
        elif kind == "sum":
            phase1.append(F.sum(F.expr(expr)).alias(partial))
            phase2.append(F.sum(partial).alias(out))
        elif kind == "min":
            phase1.append(F.min(F.expr(expr)).alias(partial))
            phase2.append(F.min(partial).alias(out))
        elif kind == "max":
            phase1.append(F.max(F.expr(expr)).alias(partial))
            phase2.append(F.max(partial).alias(out))
        else:
            raise ValueError(f"unsupported agg kind: {kind}")
    partials = (
        df.withColumn("__salt", salt)
        .groupBy(key_col.alias("key"), F.col("__salt"))
        .agg(*phase1)
    )
    return partials.groupBy("key").agg(*phase2)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: when the small side is too large to
    broadcast and the big side's join key is power-law (one label/domain
    holding half the rows lands a whole shuffle partition on one reducer),
    salt the big side ``n_salts`` ways and replicate the small side once
    per salt — every hot key fans across ``n_salts`` reducers.

    AQE's skew-join split handles moderate skew after the fact; explicit
    salting is the planned-for version (and composes with ``how='left'``).
    Cost: ``n_salts``× duplication of the small side — choose n_salts ≈
    hot-key concentration, not cores."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumnRenamed(on, "__rk")
    joined = big_s.join(
        small_s,
        (F.col(on) == F.col("__rk")) & (big_s["__salt"] == small_s["__salt"]),
        how,
    )
    return joined.drop("__salt", "__rk")

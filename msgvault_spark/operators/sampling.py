"""Deterministic sampling for training-data pipelines.

`df.sample()` is seed-stable only per partitioning — a repartition or a
rerun over different file splits changes the sample. Pipeline sampling must
be a pure function of the ROW (so reruns, backfills, and the oracle agree):
hash the row's key, keep if below the rate threshold.

The hash is a golden-ratio multiplicative step — ``((key % p) * 1327217885)
% p`` with p = 2^31-1 and multiplier ≈ 0.618·p (Fibonacci hashing). Why
this exact shape:
  - engine-portable (xxhash64 etc. are implementation-private);
  - overflow-safe: max intermediate (p-1)·a ≈ 2.8e18 < 2^63-1, and DuckDB
    BIGINT overflow is an ERROR, not a wrap;
  - low-discrepancy on CONSECUTIVE keys: any multiplicative hash is affine,
    so its quality for rate-filtering ids 0..N is set by the wrap stride
    p/a. A small multiplier (e.g. MINSTD's 48271) wraps every ~44k keys —
    a 25% filter then keeps keys in solid runs (measured 30-55% on 20k
    consecutive ids). The golden-ratio multiplier wraps every ~1.6 keys,
    the classic (1-1/φ) equidistribution.
For text keys, hash a stable surrogate id instead.

Stratified quota sampling (cap per group) = window rank by the same hash —
deterministic "random" order within each stratum, exact quota, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_A = 1327217885  # ≈ (1 - 1/φ) · p, odd → invertible mod the prime p
_M = 2147483647  # 2^31 - 1 (prime)


def rowhash(key: Column | str) -> Column:
    """Deterministic uniform-ish hash of a numeric key into [0, 2^31-1).
    SQL twin: ``((key % 2147483647) * 1327217885) % 2147483647``."""
    k = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.pmod(k.cast("long"), F.lit(_M)) * F.lit(_A), F.lit(_M))


def deterministic_sample(
    df: DataFrame, key: Column | str, rate: float
) -> DataFrame:
    """Keep ~``rate`` of rows, pure function of ``key`` — no shuffle, no
    state; pushes down as an ordinary filter."""
    return df.filter(rowhash(key) < int(rate * _M))


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    key: Column | str,
    quota: int,
) -> DataFrame:
    """At most ``quota`` rows per stratum, chosen by hash order (stable
    across reruns and engines). One shuffle on the strata columns."""
    w = Window.partitionBy(*strata).orderBy(
        rowhash(key).asc(), (F.col(key) if isinstance(key, str) else key).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )


def weighted_source_mix(
    df: DataFrame,
    source_col: str,
    key: Column | str,
    weights: dict[str, float],
) -> DataFrame:
    """Dataset mixing: per-source keep rates (e.g. wiki 1.0, crawl 0.1).
    Unlisted sources drop. Pure filter — composes with pushdown, no
    shuffle; at 100 TB this is the map-side first stage of corpus prep."""
    rate = F.lit(0)
    for src, w in weights.items():
        rate = F.when(F.col(source_col) == src, F.lit(int(w * _M))).otherwise(rate)
    return df.filter(rowhash(key) < rate)

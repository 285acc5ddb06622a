"""Mergeable distinct-count sketches (Apache DataSketches HLL, JVM-side).

The reference computes exact COUNT(DISTINCT) per view row (aggregate
unique_count); exact distinct at 100 TB forces a full shuffle of every
distinct value. The scale path is a two-level sketch rollup:

    level 1 (ETL): one HLL sketch per (partition grain, key) via
                   ``hll_sketch_agg`` — computed map-side, bytes per group;
    level 2 (query): ``hll_union_agg`` over the stored sketches + estimate —
                   touches only the tiny sketch table, never the facts.

This is the same pattern as the persisted wide cache: move the heavy scan
to ETL, leave queries reading pre-digested bytes. Estimates carry ~1.6%/
sqrt(2^lgK) relative error (lgK=12 → ~2.5%); the sketches are unions, so
any partition subset (year range, source filter) can be served from the
same table.

Everything here is built-in JVM expressions — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_sketch_rollup(
    df: DataFrame,
    keys: list[str],
    grain: list[str],
    value: Column | str,
    *,
    lgk: int = 12,
) -> DataFrame:
    """Level 1: per-(keys + grain) HLL sketch of ``value``. Persist this at
    ETL (one row per group, one binary column)."""
    v = F.col(value) if isinstance(value, str) else value
    return df.groupBy(*keys, *grain).agg(
        F.hll_sketch_agg(v, F.lit(lgk)).alias("hll")
    )


def hll_merge_estimate(
    sketches: DataFrame, keys: list[str], *, out: str = "approx_distinct"
) -> DataFrame:
    """Level 2: union the grain-level sketches up to ``keys`` and estimate.
    Runs on the sketch table only — never rescans the facts."""
    return sketches.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("hll"))).alias(out)
    )

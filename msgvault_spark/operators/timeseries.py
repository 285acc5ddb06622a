"""Zero-filled (gap-free) time series over an aggregated frame.

The reference's time view (internal/query/aggregate.go time dimension)
returns only buckets that contain data; charting clients must infer gaps.
This operator materializes the dense series: a spine of every bucket
between the observed min and max, left-joined to the aggregate, missing
buckets coalesced to zero.

Scale shape: the expensive step is the ordinary shuffle aggregate over the
fact table — unchanged. The spine is generated from a single-row min/max
aggregate via ``sequence()`` + ``explode`` (driver never materializes it),
and is at most a few thousand rows for any real time range, so the
spine⟕agg join is a broadcast join with no extra shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STEP = {
    "month": ("interval 1 month", "yyyy-MM"),
    "day": ("interval 1 day", "yyyy-MM-dd"),
    "hour": ("interval 1 hour", "yyyy-MM-dd HH:00"),
    "year": ("interval 1 year", "yyyy"),
    "week": ("interval 1 week", "yyyy-MM-dd"),
}


def bucket_spine(agg_df: DataFrame, bucket_col: str, granularity: str) -> DataFrame:
    """Dense spine of every ``granularity`` bucket spanning agg_df's
    observed [min, max]. One tiny job (single-row agg) + explode."""
    step, _ = _STEP[granularity]
    bounds = agg_df.agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    return bounds.filter(F.col("__lo").isNotNull()).select(
        F.explode(F.sequence("__lo", "__hi", F.expr(step))).alias(bucket_col)
    )


def zero_fill(
    agg_df: DataFrame,
    bucket_col: str,
    granularity: str = "month",
    *,
    fill: dict[str, Column] | None = None,
    key_alias: str = "key",
) -> DataFrame:
    """Left-join ``agg_df`` (keyed by a date_trunc'ed ``bucket_col``) onto
    its dense spine; metric columns coalesce to 0 (override per-column with
    ``fill``). Output: ``key_alias`` formatted per granularity + metrics,
    ordered by key."""
    _, fmt = _STEP[granularity]
    spine = bucket_spine(agg_df, bucket_col, granularity)
    metrics = [c for c in agg_df.columns if c != bucket_col]
    fill = fill or {}
    out_cols = [F.date_format(F.col(bucket_col), fmt).alias(key_alias)]
    for m in metrics:
        default = fill.get(m, F.lit(0).cast("long"))
        out_cols.append(F.coalesce(F.col(m), default).alias(m))
    # left-preserve the spine; broadcast the (post-aggregate, small) metric
    # side — BroadcastHashJoin only builds on the right of a LEFT OUTER join
    return (
        spine.join(F.broadcast(agg_df), bucket_col, "left")
        .select(*out_cols)
        .orderBy(key_alias)
    )

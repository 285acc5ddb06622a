"""Batch sessionization: split per-user event streams on inactivity gaps.

The streaming twin (streaming/stateful.py session op) handles live data;
this is the backfill path a 100 TB events table needs. Classic two-window
formulation, all JVM-side:

    lag(ts) over (user order by ts)        -> gap to previous event
    sum(gap > timeout) over (user, rows)   -> running session index
    group by (user, session index)         -> session rollup

Scale shape: both windows and the final aggregate share ONE hash partition
exchange on user_id (window partition key == groupBy prefix, so Catalyst
reuses the shuffle); within a partition the sort is the only extra cost.
Skewed users (bots) are bounded by per-user data, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    timeout_s: int = 1800,
) -> DataFrame:
    """Events + a ``session_id`` column (0-based per user, time order).
    Deterministic: ties in ts break on nothing — equal timestamps never
    open a new session (gap 0 < timeout)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    new_session = (gap > timeout_s).cast("long")
    return events.withColumn(
        "session_id",
        F.coalesce(
            F.sum(F.coalesce(new_session, F.lit(0))).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            F.lit(0),
        ),
    )


def session_rollup(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    timeout_s: int = 1800,
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """One row per (user, session): start/end, event count, duration."""
    s = sessionize(events, user_col=user_col, ts_col=ts_col, timeout_s=timeout_s)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("events"),
        (F.max(F.col(ts_col).cast("long")) - F.min(F.col(ts_col).cast("long")))
        .alias("duration_s"),
    ] + (extra_aggs or [])
    return s.groupBy(user_col, "session_id").agg(*aggs)

"""Mergeable fixed-grid histogram sketch → quantile estimates.

The t-digest role (mergeable quantile state for rollups) served by the
simplest structure that is BOTH mergeable and engine-portable: a fixed
[lo, hi) grid of equal-width bins. State = (group, bin, count) rows —
merge is UNION ALL + SUM like every other sketch here (HLL rollup, CMS,
incremental-agg state); quantile(q) = the upper edge of the first bin
whose cumulative count reaches ceil(q × total).

Error contract: estimates are exact to one bin width (deterministically —
no randomness), which for a known value domain is often tighter than a
t-digest's tail behavior, and unlike a t-digest the state is flat rows any
engine can aggregate — the property the DuckDB oracle exercises. For
unknown domains, compose with profile_orders_table-style min/max
discovery at ETL, or fall back to approx_percentile (already in the
catalog as approx_percentile_check).

Integer arithmetic throughout (values floored to longs, width divides the
range) so two engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hist_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    lo: int,
    hi: int,
    bins: int,
) -> DataFrame:
    """(group..., bin, count) state. Values clamped into [lo, hi); the
    grid width (hi-lo)/bins must be integral."""
    width = (hi - lo) // bins
    if width * bins != hi - lo:
        raise ValueError("bins must divide the [lo, hi) range exactly")
    v = F.floor(F.col(value_col)).cast("long")
    clamped = F.least(F.lit(hi - 1), F.greatest(F.lit(lo), v))
    bin_ = ((clamped - lo) / width).cast("long")
    return (
        df.select(*group_cols, bin_.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
    )


def hist_merge(*states: DataFrame) -> DataFrame:
    """Merge same-grid states: SUM per (group..., bin)."""
    union = states[0]
    for s in states[1:]:
        union = union.unionByName(s)
    keys = [c for c in union.columns if c != "count"]
    return union.groupBy(*keys).agg(F.sum("count").alias("count"))


def hist_quantiles(
    state: DataFrame,
    group_cols: list[str],
    qs: list[float],
    *,
    lo: int,
    hi: int,
    bins: int,
) -> DataFrame:
    """(group..., q<percent>…) quantile estimates from the state: for each
    q, the upper edge of the first bin whose running count reaches
    ceil(q × total). Touches only the (groups × bins) state rows."""
    width = (hi - lo) // bins
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy(*group_cols)
    cum = state.withColumn("cum", F.sum("count").over(w)).withColumn(
        "total", F.sum("count").over(tot)
    )
    aggs = []
    for q in qs:
        name = f"p{int(round(q * 100)):02d}"
        # the bin where cum first reaches ceil(q*total): min bin over rows
        # that satisfy it, computed as a conditional min
        target = F.ceil(F.lit(q) * F.col("total"))
        aggs.append(
            (
                F.min(F.when(F.col("cum") >= target, F.col("bin"))) * width
                + (lo + width)
            )
            .cast("long")
            .alias(name)
        )
    return cum.groupBy(*group_cols).agg(*aggs)


def hist_quantile_oracle_sql(
    source_select: str,
    group_expr: str,
    value_expr: str,
    qs: list[float],
    *,
    lo: int,
    hi: int,
    bins: int,
) -> str:
    """DuckDB replica building the identical grid and cut points."""
    width = (hi - lo) // bins
    q_cols = ",\n       ".join(
        f"CAST(MIN(CASE WHEN cum >= CEIL({q} * total) THEN bin END) * {width} "
        f"+ {lo + width} AS BIGINT) AS p{int(round(q * 100)):02d}"
        for q in qs
    )
    return f"""
WITH src AS ({source_select}),
binned AS (
    SELECT {group_expr} AS grp,
           CAST((LEAST({hi - 1}, GREATEST({lo},
                CAST(FLOOR({value_expr}) AS BIGINT))) - {lo}) // {width}
                AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS count
    FROM src GROUP BY 1, 2
),
cum AS (
    SELECT grp, bin, count,
           SUM(count) OVER (PARTITION BY grp ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
           SUM(count) OVER (PARTITION BY grp) AS total
    FROM binned
)
SELECT grp, {q_cols}
FROM cum
GROUP BY grp
"""

"""UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and More
Effective Language Sampling for Large-Scale Multilingual Pretraining").

Temperature sampling over-weights head sources and starves the tail;
UniMax instead spreads the token budget UNIFORMLY across sources, capping
each source at a fixed number of epochs of its own data — the waterfill:
sort sources by cap ascending, give every source the common waterline,
and sources whose cap sits below the line keep only their cap, raising
the line for everyone after.

Exact integer algebra (no iteration): with caps ascending, the capped
set is a PREFIX of the order, so one prefix-sum window decides
everything — source i is capped iff cap_i · (S − i + 1) ≤ B − P_{i−1}
(its cap is below the waterline computed over the remaining budget), the
waterline is (B − P_k) div (S − k) for k capped sources, and every
uncapped source receives exactly the waterline.  All quantities are
longs; the division is integer (the ≤ S-token remainder stays
unallocated and is reported).

Scale shape: the ONLY corpus-scale work is the per-source token count
(one map-side-combined aggregate, typically already an ETL artifact);
the waterfill itself runs on the S-row source table — a constant-key
window over a dim-bounded domain (sources number thousands at most at
any corpus size), the same present-scale funnel every report ends in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def unimax_plan(
    source_tokens: DataFrame,
    *,
    budget: int,
    cap_ppm: int = 1_000_000,
) -> DataFrame:
    """(source, tokens, cap, capped, alloc) — UniMax allocation of
    ``budget`` tokens across sources; per-source cap =
    tokens · cap_ppm / 1e6 (cap_ppm = 2e6 ⇒ 2 epochs).
    ``source_tokens`` = (source, tokens)."""
    caps = source_tokens.select(
        "source",
        F.col("tokens").cast("long").alias("tokens"),
        F.expr(f"(tokens * {cap_ppm}) div 1000000").cast("long").alias("cap"),
    )
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.col("cap").asc(), F.col("source").asc()
    )
    wall = Window.partitionBy(F.lit(0))
    i = F.row_number().over(w)
    p_prev = F.coalesce(
        F.sum("cap").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("long")
    s_cnt = F.count(F.lit(1)).over(wall).cast("long")
    b = F.lit(budget).cast("long")
    staged = caps.select(
        "source",
        "tokens",
        "cap",
        i.alias("_i"),
        p_prev.alias("_p"),
        s_cnt.alias("_s"),
    )
    capped = (F.col("cap") * (F.col("_s") - F.col("_i") + 1)) <= (
        b - F.col("_p")
    )
    staged = staged.withColumn(
        "capped", F.when(capped, F.lit(1)).otherwise(F.lit(0)).cast("int")
    )
    k = F.sum("capped").over(wall).cast("long")
    p_k = F.sum(
        F.when(F.col("capped") == 1, F.col("cap")).otherwise(F.lit(0))
    ).over(wall).cast("long")
    waterline = F.when(
        k < F.col("_s"),
        F.expr(f"({budget} - _pk) div (_s - _k)"),
    ).otherwise(F.lit(0)).cast("long")
    return (
        staged.withColumn("_k", k)
        .withColumn("_pk", p_k)
        .withColumn(
            "alloc",
            F.when(F.col("capped") == 1, F.col("cap"))
            .otherwise(waterline)
            .cast("long"),
        )
        .select("source", "tokens", "cap", "capped", "alloc")
    )


def unimax_oracle_sql(
    tokens_sql: str, *, budget_expr: str, cap_ppm: int = 1_000_000
) -> str:
    """DuckDB twin: same prefix-sum waterfill over a (source, tokens)
    subquery; ``budget_expr`` is a scalar SQL expression (may reference
    the ``tot`` CTE's column t)."""
    return f"""
WITH st AS ({tokens_sql}),
tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS t FROM st),
caps AS (
    SELECT source, CAST(tokens AS BIGINT) AS tokens,
           (CAST(tokens AS BIGINT) * {cap_ppm}) // 1000000 AS cap,
           CAST({budget_expr} AS BIGINT) AS b
    FROM st CROSS JOIN tot
),
staged AS (
    SELECT source, tokens, cap, b,
           ROW_NUMBER() OVER (ORDER BY cap ASC, source ASC) AS i,
           COALESCE(SUM(cap) OVER (
               ORDER BY cap ASC, source ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p,
           COUNT(*) OVER () AS s
    FROM caps
),
flagged AS (
    SELECT *, CASE WHEN cap * (s - i + 1) <= b - p THEN 1 ELSE 0 END
               AS capped
    FROM staged
),
agg AS (
    SELECT *,
           SUM(capped) OVER () AS k,
           SUM(CASE WHEN capped = 1 THEN cap ELSE 0 END) OVER () AS pk
    FROM flagged
)
SELECT source, tokens, cap, CAST(capped AS INT) AS capped,
       CAST(CASE WHEN capped = 1 THEN cap
                 WHEN k < s THEN (b - pk) // (s - k)
                 ELSE 0 END AS BIGINT) AS alloc
FROM agg
ORDER BY source
"""

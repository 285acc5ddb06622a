"""Population Stability Index — the dataops drift monitor.

PSI = Σ_buckets (p_actual − p_expected) · ln(p_actual / p_expected) is
the industry-standard screen for "did my feature distribution move
between two corpus versions" (≥0.1 = investigate, ≥0.25 = act).  A
pretraining pipeline runs it per ingest batch over cheap per-doc
features (token length here) before any expensive stage sees the new
data; the same shape monitors quality-score and language distributions.

Engine-exact numerics (the source_divergence_matrix precedent): both
probabilities are single exactly-rounded divisions of exact integers
(add-one smoothing over a DENSE bucket spine, so empty buckets still
carry mass); the log argument is ONE division of exact integer
products; each bucket's contribution is fixed-point nano
(floor(x·1e9 + 0.5)) so the rollup sum is order-free.

Scale shape: ONE corpus-scale groupBy((half, bucket)) with map-side
combine; everything downstream runs on the 2·K-row distribution table.
At 100 TB the expected-side distribution is a frozen ETL artifact; each
ingest batch aggregates only itself and joins the artifact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def psi_report(
    scored: DataFrame,
    split: Column,
    value: Column,
    *,
    n_buckets: int = 13,
    bucket_width: int = 8,
) -> DataFrame:
    """(bucket, n_expected, n_actual, psi_nano) per length bucket.

    ``scored``: one row per document; ``split``: boolean column, true =
    expected/baseline half; ``value``: integer feature.  Bucket =
    min(value div bucket_width, n_buckets − 1) — fixed-width with a
    long-tail cap, the length_bucket_report rule (same defaults)."""
    spark = scored.sparkSession
    b = F.least(
        (value.cast("long") / F.lit(bucket_width)).cast("long"),
        F.lit(n_buckets - 1).cast("long"),
    )
    cnt = (
        scored.select(
            F.when(split, F.lit("e")).otherwise(F.lit("a")).alias("half"),
            b.alias("bucket"),
        )
        .groupBy("half", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = cnt.groupBy("half").agg(F.sum("n").cast("long").alias("t"))
    spine = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    k = F.lit(n_buckets).cast("long")
    # 2·K rows from here on — the dense grid and the pivot are broadcast-
    # legitimate whatever the corpus size
    p = (
        tot.crossJoin(F.broadcast(spine))
        .join(F.broadcast(cnt), ["half", "bucket"], "left")
        .select(
            "half",
            "bucket",
            (F.coalesce(F.col("n"), F.lit(0))).alias("n"),
            (
                (F.coalesce(F.col("n"), F.lit(0)) + 1).cast("double")
                / (F.col("t") + k)
            ).alias("p"),
            ((F.coalesce(F.col("n"), F.lit(0)) + 1).cast("double")).alias(
                "num"
            ),
            (F.col("t") + k).cast("double").alias("den"),
        )
    )
    e = p.filter(F.col("half") == "e").select(
        "bucket",
        F.col("n").alias("n_expected"),
        F.col("p").alias("pe"),
        F.col("num").alias("nume"),
        F.col("den").alias("dene"),
    )
    a = p.filter(F.col("half") == "a").select(
        "bucket",
        F.col("n").alias("n_actual"),
        F.col("p").alias("pa"),
        F.col("num").alias("numa"),
        F.col("den").alias("dena"),
    )
    # ln argument as ONE division of exact integer-valued doubles:
    # (na+1)(te+K) / ((ne+1)(ta+K)) — both engines evaluate the identical
    # quotient, so the fixed-point floor matches bit-for-bit
    ratio = (F.col("numa") * F.col("dene")) / (F.col("nume") * F.col("dena"))
    contrib = F.floor(
        (F.col("pa") - F.col("pe")) * F.log(ratio) * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    return (
        e.join(F.broadcast(a), "bucket")
        .select("bucket", "n_expected", "n_actual", contrib.alias("psi_nano"))
    )


def psi_oracle_sql(
    *,
    n_buckets: int = 13,
    bucket_width: int = 8,
    split_pred: str = "doc_id % 2 = 0",
    tokens_sql: str | None = None,
) -> str:
    """DuckDB twin over the documents table (token-length feature)."""
    toks = tokens_sql or (
        "SELECT doc_id, len(list_filter(string_split_regex(lower("
        "COALESCE(text, '')), '[^a-z0-9]+'), x -> x != '')) AS v "
        "FROM documents"
    )
    return f"""
WITH t AS ({toks}),
h AS (
    SELECT CASE WHEN {split_pred} THEN 'e' ELSE 'a' END AS half,
           least(CAST(v AS BIGINT) // {bucket_width},
                 {n_buckets - 1}) AS bucket
    FROM t
),
cnt AS (SELECT half, bucket, CAST(COUNT(*) AS BIGINT) AS n
        FROM h GROUP BY 1, 2),
tot AS (SELECT half, CAST(SUM(n) AS BIGINT) AS t FROM cnt GROUP BY 1),
spine AS (SELECT unnest(generate_series(0, {n_buckets - 1})) AS bucket),
p AS (
    SELECT tot.half, spine.bucket,
           COALESCE(cnt.n, 0) AS n,
           CAST(COALESCE(cnt.n, 0) + 1 AS DOUBLE)
               / (tot.t + {n_buckets}) AS p,
           CAST(COALESCE(cnt.n, 0) + 1 AS DOUBLE) AS num,
           CAST(tot.t + {n_buckets} AS DOUBLE) AS den
    FROM tot CROSS JOIN spine
    LEFT JOIN cnt ON cnt.half = tot.half AND cnt.bucket = spine.bucket
)
SELECT e.bucket,
       CAST(e.n AS BIGINT) AS n_expected,
       CAST(a.n AS BIGINT) AS n_actual,
       CAST(floor((a.p - e.p)
                  * ln((a.num * e.den) / (e.num * a.den))
                  * 1000000000 + 0.5) AS BIGINT) AS psi_nano
FROM p e JOIN p a ON e.bucket = a.bucket
WHERE e.half = 'e' AND a.half = 'a'
ORDER BY e.bucket
"""

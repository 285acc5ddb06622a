"""Zipf-slope profiling per source: how natural is each slice's token
frequency distribution?

Natural language follows Zipf's law — log(freq) falls roughly linearly
in log(rank) with slope near -1 (Zipf 1949; Piantadosi 2014 survey).
Templated/boilerplate sources flatten the head (slope closer to 0);
id/token soup steepens or breaks the line.  The slope is a standard
one-number screen next to the type-token diversity ratio
(analysis.ngram_diversity_by_group) when deciding how to weight a
source in a pretraining mix.

Engine-exact OLS on fixed-point logs: the x coordinates are ln(rank)
for rank = 1..top_k — a PYTHON-precomputed literal table inlined into
both engines (ranks are small known integers); y = floor(ln(freq)·1e6
+ 0.5) where freq is an exact BIGINT (single-argument ln parity, the
unigram precedent).  All OLS sums are then exact integer arithmetic
(bounds checked: |n·Σxy|, |Σx·Σy| < 2^63 for top_k <= 1000 and freq
< 2^63), and the slope is ONE double division of two exact longs,
rounded to 6 — both engines divide the identical integers.

Scale shape: term frequencies ride the postings artifact joined to the
doc→source map (one corpus-keyed aggregate with map-side combine);
the rank window partitions by SOURCE over the vocab-sized frequency
table — vocabulary, not corpus, bounded; everything after runs on
S·top_k rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ln_rank_micro(top_k: int) -> list[int]:
    """[floor(ln(r)·1e6 + 0.5) for r = 1..top_k] — shared literals, no
    libm in the cross-engine comparison."""
    return [
        int(math.floor(math.log(r) * 1e6 + 0.5)) for r in range(1, top_k + 1)
    ]


def zipf_slope_by_source(
    term_freq: DataFrame,
    *,
    top_k: int = 100,
    group_col: str = "source",
    term_col: str = "term",
    freq_col: str = "freq",
) -> DataFrame:
    """(source, n_terms, slope): OLS slope of (ln rank, ln freq) over
    each source's top_k most frequent terms (rank ties broken by term
    asc).  Sources with < 2 ranked terms are dropped (slope needs two
    points)."""
    from msgvault_spark.operators.present import present_sorted

    xs = ln_rank_micro(top_k)
    x_arr = F.array(*[F.lit(v) for v in xs])
    win = Window.partitionBy(group_col).orderBy(
        F.col(freq_col).desc(), F.col(term_col).asc()
    )
    ranked = (
        term_freq.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= top_k)
        .select(
            F.col(group_col).alias("source"),
            F.element_at(x_arr, F.col("rn")).cast("long").alias("x"),
            F.floor(
                F.log(F.col(freq_col).cast("double")) * 1000000 + 0.5
            ).cast("long").alias("y"),
        )
    )
    agg = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        agg.filter(F.col("n") >= 2)
        .select(
            "source",
            F.col("n").alias("n_terms"),
            F.round(
                num.cast("double") / den.cast("double"), 6
            ).alias("slope"),
        )
        .transform(present_sorted, "source")
    )


def zipf_oracle_sql(
    *,
    top_k: int = 100,
    token_re: str = "[^a-z0-9]+",
) -> str:
    """DuckDB twin: identical tokenization, rank/tie rule, literal
    ln-rank table, fixed-point ln(freq), exact-integer OLS sums, one
    double division."""
    xs = ", ".join(str(v) for v in ln_rank_micro(top_k))
    return f"""
WITH tokens AS (
    SELECT d.source,
           unnest(string_split_regex(lower(COALESCE(d.text, '')),
                  '{token_re}')) AS term
    FROM documents d
),
tf AS (
    SELECT source, term, CAST(COUNT(*) AS BIGINT) AS freq
    FROM tokens WHERE term != '' GROUP BY 1, 2
),
ranked AS (
    SELECT source,
           CAST(([{xs}])[rn] AS BIGINT) AS x,
           CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000 + 0.5)
                AS BIGINT) AS y
    FROM (
        SELECT source, freq,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY freq DESC, term ASC
               ) AS rn
        FROM tf
    ) WHERE rn <= {top_k}
),
agg AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           CAST(SUM(x * x) AS BIGINT) AS sxx
    FROM ranked GROUP BY source
)
SELECT source, n AS n_terms,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope
FROM agg
WHERE n >= 2
ORDER BY source
"""

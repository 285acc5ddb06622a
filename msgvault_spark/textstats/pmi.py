"""PMI collocation extraction (Church & Hanks 1990).

top_bigrams_corpus ranks phrases by raw frequency, which surfaces
function-word pairs ("of the"); pointwise mutual information ranks by
how much MORE often a pair co-occurs than its parts predict —
PMI(a,b) = ln(p(ab) / (p(a)·p(b))) — which is what tokenizer-vocab
audits and multi-word-expression mining actually want.  A min-count
floor suppresses the low-frequency PMI pathology (hapax pairs score
arbitrarily high).

Engine-exact numerics: every count is an exact long; the log argument
is built from doubles that each hold an exactly-represented integer,
combined with the IDENTICAL expression tree in both engines
((c_ab·N_uni)/(c_a·c_b) · (N_uni/N_bi)) — same IEEE operations in the
same order, then one fixed-point floor.  No sum of floats anywhere.

Scale shape: bigram instances collapse to per-TYPE counts with ONE
map-side-combined groupBy (the backoff posting discipline); unigram
counts ride the same pattern; the PMI join runs among vocab-sized
tables (vocab ≪ corpus at any scale), with the two 1-row totals as
broadcast literals; top-N is TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pmi_collocations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_count: int = 5,
    top_n: int = 25,
) -> DataFrame:
    """(w1, w2, pair_count, pmi_nano): the ``top_n`` adjacent word pairs
    by fixed-point PMI among pairs with >= ``min_count`` occurrences;
    ties by (w1, w2)."""
    from msgvault_spark.textstats.analysis import words
    from msgvault_spark.textstats.backoff import bigram_pairs

    ws = docs.select(
        words(F.coalesce(F.col(text_col), F.lit(""))).alias("w")
    )
    uni = (
        ws.select(F.explode("w").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("cu"))
    )
    nu = uni.agg(F.sum("cu").cast("long").alias("nu"))
    bg = ws.select(F.explode(bigram_pairs(F.col("w"))).alias("p")).select(
        F.col("p.prev").alias("w1"), F.col("p.cur").alias("w2")
    )
    cb = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("pair_count")
    )
    nb = cb.agg(F.sum("pair_count").cast("long").alias("nb"))
    sel = cb.filter(F.col("pair_count") >= min_count)
    u1 = uni.select(F.col("t").alias("w1"), F.col("cu").alias("c1"))
    u2 = uni.select(F.col("t").alias("w2"), F.col("cu").alias("c2"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    ratio = (
        (d("pair_count") * d("nu")) / (d("c1") * d("c2"))
    ) * (d("nu") / d("nb"))
    return (
        sel.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            "pair_count",
            F.floor(F.log(ratio) * F.lit(1e9) + F.lit(0.5))
            .cast("long")
            .alias("pmi_nano"),
        )
        .orderBy(F.col("pmi_nano").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(top_n)
    )


def pmi_oracle_sql(
    *, min_count: int = 5, top_n: int = 25, table: str = "documents"
) -> str:
    """DuckDB twin — same tokenizer, same expression tree, same floor."""
    return f"""
WITH ws AS (
    SELECT list_filter(string_split_regex(lower(COALESCE(text, '')),
           '[^a-z0-9]+'), x -> x != '') AS w
    FROM {table}
),
uni AS (
    SELECT t, CAST(COUNT(*) AS BIGINT) AS cu
    FROM (SELECT unnest(w) AS t FROM ws) GROUP BY t
),
nu AS (SELECT CAST(SUM(cu) AS BIGINT) AS nu FROM uni),
bg AS (
    SELECT w[i] AS w1, w[i + 1] AS w2
    FROM ws, unnest(CASE WHEN len(w) >= 2
                    THEN range(1, len(w)) ELSE [] END) AS r(i)
),
cb AS (
    SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS pair_count
    FROM bg GROUP BY 1, 2
),
nb AS (SELECT CAST(SUM(pair_count) AS BIGINT) AS nb FROM cb)
SELECT s.w1, s.w2, s.pair_count,
       CAST(floor(
           ln(((CAST(s.pair_count AS DOUBLE) * CAST(nu.nu AS DOUBLE))
               / (CAST(u1.cu AS DOUBLE) * CAST(u2.cu AS DOUBLE)))
              * (CAST(nu.nu AS DOUBLE) / CAST(nb.nb AS DOUBLE)))
           * 1000000000 + 0.5) AS BIGINT) AS pmi_nano
FROM cb s
JOIN uni u1 ON u1.t = s.w1
JOIN uni u2 ON u2.t = s.w2
CROSS JOIN nu CROSS JOIN nb
WHERE s.pair_count >= {min_count}
ORDER BY pmi_nano DESC, s.w1 ASC, s.w2 ASC
LIMIT {top_n}
"""

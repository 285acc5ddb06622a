"""T5-style span-corruption planning (Raffel et al. 2020, §3.1.4).

The denoising objective masks contiguous token spans and replaces each
merged span with one sentinel token; the dataloader needs to know, per
document, how many tokens the mask eats and how many sentinels the
target sequence will carry — that arithmetic decides sequence budgets
and packing BEFORE any tensor exists, so it belongs in the corpus
engine, not the training loop.

Deterministic variant: a token position starts a w-token span iff the
portable hash of (doc_id, position) lands in the 1/rate residue class —
rerun-stable, engine-portable (functions/portable.py), and with
w=3, rate=20 the expected mask fraction is the published ~15%.
Overlapping spans merge exactly like the Lee-et-al interval union
(dedup/substrings.py): the per-doc LAG telescope turns the union into a
sum of min(w, gap) — no range join, no corpus-sized window partition.

Scale shape: position explode is a pure map (output rows = corpus
tokens); the hash filter keeps 1/rate of them BEFORE the only shuffle
(the per-doc window), so the telescope sees corpus_tokens/rate rows
keyed by doc — uniform by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from msgvault_spark.functions.portable import MD5_HEX6_SQL, md5_hex6_long


def span_corruption_plan(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    w: int = 3,
    rate: int = 20,
) -> DataFrame:
    """(doc_id, n_tokens, n_starts, n_spans, masked_tokens, masked_ppm)
    for every doc with >= w tokens: hash-selected span starts, merged
    spans (one sentinel each), and the exact union of masked positions.
    Two spans merge when the later start is < w after the earlier one;
    an exactly-adjacent span keeps its own sentinel."""
    from msgvault_spark.textstats.analysis import words

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words(F.coalesce(F.col(text_col), F.lit("")))).alias(
            "n_tokens"
        ),
    ).filter(F.col("n_tokens") >= w)
    starts = (
        base.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_tokens") - w)
            ).alias("start"),
        )
        .filter(
            md5_hex6_long(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("start").cast("string"),
                )
            )
            % rate
            == 0
        )
    )
    win = Window.partitionBy("doc_id").orderBy("start")
    gap = F.col("start") - F.lag("start").over(win)
    new_span = F.when(gap.isNull() | (gap >= w), F.lit(1)).otherwise(F.lit(0))
    cover = F.when(gap.isNull() | (gap >= w), F.lit(w)).otherwise(gap)
    per_doc = (
        starts.select(
            "doc_id", new_span.alias("ns"), cover.alias("cov")
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_starts"),
            F.sum("ns").cast("long").alias("n_spans"),
            F.sum("cov").cast("long").alias("masked_tokens"),
        )
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_starts"), F.lit(0))
            .cast("long")
            .alias("n_starts"),
            F.coalesce(F.col("n_spans"), F.lit(0))
            .cast("long")
            .alias("n_spans"),
            F.coalesce(F.col("masked_tokens"), F.lit(0))
            .cast("long")
            .alias("masked_tokens"),
        )
        .withColumn(
            "masked_ppm", F.expr("(masked_tokens * 1000000) div n_tokens")
        )
    )


def span_corruption_oracle_sql(
    *, w: int = 3, rate: int = 20, table: str = "documents"
) -> str:
    """DuckDB twin: same tokenizer, same portable hash residue, same LAG
    telescope."""
    h = MD5_HEX6_SQL.format(x="(doc_id || ':' || start)")
    return f"""
WITH t AS (
    SELECT doc_id,
           len(list_filter(string_split_regex(lower(COALESCE(text, '')),
               '[^a-z0-9]+'), x -> x != '')) AS n_tokens
    FROM {table}
),
b AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
      FROM t WHERE n_tokens >= {w}),
s AS (
    SELECT doc_id, unnest(generate_series(0, n_tokens - {w})) AS start
    FROM b
),
k AS (SELECT doc_id, start FROM s WHERE {h} % {rate} = 0),
g AS (
    SELECT doc_id, start,
           start - LAG(start) OVER (
               PARTITION BY doc_id ORDER BY start) AS gap
    FROM k
),
p AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_starts,
           CAST(SUM(CASE WHEN gap IS NULL OR gap >= {w} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN gap IS NULL OR gap >= {w} THEN {w} ELSE gap
                END) AS BIGINT) AS masked_tokens
    FROM g GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens,
       COALESCE(p.n_starts, 0) AS n_starts,
       COALESCE(p.n_spans, 0) AS n_spans,
       COALESCE(p.masked_tokens, 0) AS masked_tokens,
       (COALESCE(p.masked_tokens, 0) * 1000000) // b.n_tokens AS masked_ppm
FROM b LEFT JOIN p USING (doc_id)
ORDER BY b.doc_id
"""

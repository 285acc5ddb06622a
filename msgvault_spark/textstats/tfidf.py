"""TF-IDF keyword extraction: top-k characteristic terms per document.

The per-document complement of the corpus-level term statistics the FTS
index keeps (search/fts.py builds df/corpus stats for BM25): here the
output is the document's own top terms — the standard feature for topic
clustering, near-dup triage, and training-mix diagnostics.

IDF variant: ``score = tf · (N + 1) / (df + 1)`` — the *rational* idf
(no logarithm). Chosen deliberately: ln() is the one place tf-idf touches
a transcendental, and libm implementations differ in the last ulp across
engines, which breaks bit-exact cross-engine verification. The rational
form preserves the tf-up/df-down ordering semantics, is exact double
arithmetic in any engine, and keeps the operator oracle-checkable. (BM25
in search/fts.py carries the log-shaped saturation for ranking use.)

Shuffle shape at 100 TB (all partial-agg absorbed):
  explode → groupBy(doc, term) [exchange on (doc, term)] → df-agg
  [exchange on term, reused by the join back] → per-doc top-k window
  [exchange on doc]. N is a 1-row broadcast cross join (the W1 pattern —
  never a global window). Hot terms ("the") are absorbed map-side by the
  partial df count; the top-k window sees ≤ distinct-terms-per-doc rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from msgvault_spark.operators.chunking import tokenize_ws


def tfidf_top_terms(
    docs: DataFrame,
    *,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, rank, term, tf, df, score) — k highest-scored terms per
    document; ties broken by term ascending."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_ws(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # df as an unordered window count over the tf rows (r12, guide §2.4):
    # df(term) = number of tf rows carrying the term, and attaching it
    # via Window.partitionBy(term) reuses the ONE tf aggregate — the
    # r2-r11 shape built dfreq as tf.groupBy(term) in a separate subtree,
    # which Catalyst plans as a SECOND full tokenize+explode+aggregate
    # pass over the corpus (exchange reuse does not unify the duplicated
    # subtrees), plus a join to carry df back onto tf.
    wdf = Window.partitionBy("term")
    ndocs = docs.agg(F.count("*").alias("n"))
    score = F.round(
        (F.col("tf").cast("double") * (F.col("n") + F.lit(1.0)))
        / (F.col("df") + F.lit(1.0)),
        6,
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        tf.withColumn("df", F.count("*").over(wdf))
        .join(F.broadcast(ndocs))
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "df", "score")
    )


def tfidf_oracle_sql(*, k: int = 5, table: str = "documents") -> str:
    """DuckDB replica — same tokenizer, same rational idf, same rounding
    and tie-break."""
    return f"""
WITH toks AS (
    SELECT doc_id, unnest(list_filter(
               regexp_split_to_array(trim(lower(text)), '\\s+'),
               x -> x <> '')) AS term
    FROM {table}
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
),
dfreq AS (
    SELECT term, COUNT(*) AS df FROM tf GROUP BY term
),
nd AS (SELECT COUNT(*) AS n FROM {table}),
scored AS (
    SELECT t.doc_id, t.term, t.tf, d.df,
           round((CAST(t.tf AS DOUBLE) * (nd.n + 1.0)) / (d.df + 1.0), 6)
               AS score
    FROM tf t JOIN dfreq d ON d.term = t.term CROSS JOIN nd
)
SELECT doc_id, rank, term, tf, df, score FROM (
    SELECT doc_id, term, tf, df, score,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, term ASC
           ) AS INT) AS rank
    FROM scored
) WHERE rank <= {k}
"""

"""Triplet-margin evaluation of an embedding space.

Contrastive/metric-learning QA: for each probe query, does any
WRONG-label vector score above the BEST same-label vector?  Each such
vector is a margin violation — the failure mode hard-negative mining
(knnjoin.hard_negative_join) feeds back into training, and the 0-margin
special case of the standard triplet loss accuracy.  Complements the
rank-order eval (ndcg.py): nDCG grades the whole ranking, this counts
outright inversions at the top.

Protocol shared with the recall/nDCG harness: exact cosine rounded to 6
(both engines rank identical doubles), deterministic eval seeds, Q×N
scans as the deliberate cost of an O(100)-probe eval set.  Two passes —
best-positive per query, then the count above it — each a
map-side-combined aggregate over the scored join; the Q-row threshold
table broadcasts back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triplet_margin_report(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 6,
) -> DataFrame:
    """(qid, n_pos, best_pos, n_violations): per probe query, the count
    of same-label corpus vectors, the best same-label cosine, and how
    many wrong-label vectors outscore it (strict >).  Queries whose
    label appears nowhere else in the corpus are dropped (margin
    undefined without a positive)."""
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.similarity.knn import _as_double, cosine

    q = queries.select(
        F.col(id_col).alias("qid"),
        _as_double(F.col(vec_col)).alias("qv"),
        F.col(label_col).alias("ql"),
    )
    c = corpus.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("cv"),
        F.col(label_col).alias("cl"),
    )
    scored = c.join(F.broadcast(q), F.col("id") != F.col("qid")).select(
        "qid",
        "ql",
        "cl",
        F.round(cosine(F.col("cv"), F.col("qv")), round_to).alias("score"),
    )
    bp = (
        scored.filter(F.col("cl") == F.col("ql"))
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pos"),
            F.max("score").alias("best_pos"),
        )
    )
    viol = (
        scored.filter(F.col("cl") != F.col("ql"))
        .join(F.broadcast(bp), "qid")
        .filter(F.col("score") > F.col("best_pos"))
        .groupBy("qid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
    )
    return (
        bp.join(viol, "qid", "left")
        .select(
            "qid",
            "n_pos",
            "best_pos",
            F.coalesce(F.col("n_violations"), F.lit(0)).cast("long").alias(
                "n_violations"
            ),
        )
        .transform(present_sorted, "qid")
    )


def triplet_oracle_sql(*, nq: int) -> str:
    """DuckDB twin: identical rounded cosine, strict-> violation rule,
    positives-required inner semantics."""
    from msgvault_spark.similarity.ivf import _cos_sql

    cos = _cos_sql("e.embedding", "q.qv")
    return f"""
WITH q AS (
    SELECT vec_id AS qid, embedding AS qv, label AS ql
    FROM embeddings WHERE vec_id < {nq}
),
scored AS (
    SELECT q.qid, q.ql, e.label AS cl, {cos} AS score
    FROM embeddings e JOIN q ON e.vec_id != q.qid
),
bp AS (
    SELECT qid,
           CAST(COUNT(*) AS BIGINT) AS n_pos,
           MAX(score) AS best_pos
    FROM scored WHERE cl = ql GROUP BY qid
),
viol AS (
    SELECT s.qid, CAST(COUNT(*) AS BIGINT) AS n_violations
    FROM scored s JOIN bp USING (qid)
    WHERE s.cl != s.ql AND s.score > bp.best_pos
    GROUP BY s.qid
)
SELECT bp.qid, bp.n_pos, bp.best_pos,
       COALESCE(viol.n_violations, 0) AS n_violations
FROM bp LEFT JOIN viol USING (qid)
ORDER BY bp.qid
"""

"""MRR (mean reciprocal rank) evaluation for the retrieval family.

Completes the eval suite: recall@k grades the retrieved SET, nDCG@k the
whole ORDER, triplet-margin the inversion count — MRR@k grades exactly
one thing, *where the first relevant result lands*, which is the metric
QA/search teams actually page on (a system can hold recall while its
first hit drifts from rank 1 to rank 4; only MRR moves).  Relevance is
label agreement on the embeddings table, the same deterministic stand-in
the nDCG entry uses.  The reference engine (wesm/msgvault) has no eval
harness; this extends the extension surface's ANN-evaluation family.

Engine-exact without float division: 1/rank exists at only k fixed
ranks, so both engines index PRECOMPUTED fixed-point nano constants
(computed once in Python, inlined as literals in the Spark plan AND the
oracle SQL — identical by construction).  The per-query reduction is a
MIN over integer ranks (order-free); the constant lookup happens after.

Scale shape: the ranking is the recall harness' persisted exact
ground-truth artifact (one brute-force scan serves all six eval
reports); everything here runs on Q·k rows except one corpus-sized
label join, where the Q·k side is the broadcast (labels are
corpus-granular — broadcasting THEM is the r3-verdict hazard shape).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rr_nano(k: int) -> list[int]:
    """[floor(1e9/i + 0.5) for i = 1..k] — the shared constants; both
    engines consume these literals, so the reciprocal never enters the
    comparison as a float."""
    return [int(math.floor(1e9 / i + 0.5)) for i in range(1, k + 1)]


def mrr_report(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    label_col: str = "label",
    topk: DataFrame | None = None,
) -> DataFrame:
    """(qid, first_rel_rank, n_rel_topk, rr_nano) per query: binary
    relevance = shares the query's label; ``first_rel_rank`` is the rank
    (1-based) of the first relevant result in the top-k, 0 if none;
    ``rr_nano`` is the fixed-point reciprocal rank (0 if none).  Pass
    ``topk`` (a persisted (qid, id, score) frame, e.g. the recall
    harness' shared exact ground-truth artifact) to grade a precomputed
    retrieval instead of re-running the brute-force scan."""
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.similarity.knnjoin import exact_knn_join

    rr = rr_nano(k)

    top = topk
    if top is None:
        top = exact_knn_join(corpus, queries, k=k, id_col=id_col)
    win = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    # truncate to the top-k: a deeper topk frame must neither index past
    # the k reciprocal constants nor count relevant hits beyond rank k
    ranked = top.withColumn("rn", F.row_number().over(win)).filter(
        F.col("rn") <= k
    )
    labels = corpus.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("lbl")
    )
    qlabels = queries.select(
        F.col(id_col).alias("qid"), F.col(label_col).alias("ql")
    )
    # Q·k retrieved rows broadcast against the corpus-sized label column
    hits = (
        labels.join(F.broadcast(ranked), "id")
        .join(F.broadcast(qlabels), "qid")
        .groupBy("qid")
        .agg(
            F.min(F.when(F.col("lbl") == F.col("ql"), F.col("rn")))
            .cast("long")
            .alias("_fr"),
            F.sum(
                F.when(F.col("lbl") == F.col("ql"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("n_rel_topk"),
        )
    )
    rr_arr = F.array(*[F.lit(v) for v in rr])
    # left join from the full query set: a query with zero relevant
    # results in its top-k still reports a row (rank 0, rr 0)
    return (
        qlabels.join(F.broadcast(hits), "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("_fr"), F.lit(0)).cast("long").alias(
                "first_rel_rank"
            ),
            F.coalesce(F.col("n_rel_topk"), F.lit(0)).cast("long").alias(
                "n_rel_topk"
            ),
            F.when(
                F.col("_fr").isNotNull(),
                F.element_at(rr_arr, F.col("_fr").cast("int")),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rr_nano"),
        )
        .transform(present_sorted, "qid")
    )


def mrr_oracle_sql(*, nq: int, k: int = 10) -> str:
    """DuckDB twin: identical rounded-cosine ranking (the recall-report
    protocol) and the same inlined reciprocal constants."""
    from msgvault_spark.similarity.ivf import _cos_sql

    cos = _cos_sql("e.embedding", "q.qv")
    rr = ", ".join(str(v) for v in rr_nano(k))
    return f"""
WITH q AS (
    SELECT vec_id AS qid, embedding AS qv, label AS ql
    FROM embeddings WHERE vec_id < {nq}
),
top AS (
    SELECT qid, id, lbl, ql, rn FROM (
        SELECT q.qid, e.vec_id AS id, e.label AS lbl, q.ql,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid ORDER BY {cos} DESC, e.vec_id ASC
               ) AS rn
        FROM embeddings e JOIN q ON e.vec_id != q.qid
    ) WHERE rn <= {k}
),
agg AS (
    SELECT qid,
           MIN(CASE WHEN lbl = ql THEN rn END) AS fr,
           CAST(SUM(CASE WHEN lbl = ql THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rel_topk
    FROM top GROUP BY qid
)
SELECT q.qid,
       CAST(COALESCE(a.fr, 0) AS BIGINT) AS first_rel_rank,
       CAST(COALESCE(a.n_rel_topk, 0) AS BIGINT) AS n_rel_topk,
       CAST(CASE WHEN a.fr IS NOT NULL THEN ([{rr}])[a.fr] ELSE 0 END
            AS BIGINT) AS rr_nano
FROM q LEFT JOIN agg a USING (qid)
ORDER BY q.qid
"""

"""nDCG ranking-quality evaluation for the retrieval family.

The recall@k reports (ann/ivf/sq8/pq_recall_report) measure SET overlap
with ground truth; nDCG@k grades the ORDER of what was returned — the
metric retrieval benchmarks (TREC, BEIR, MTEB) actually rank systems by.
Relevance here is label agreement on the embeddings table (the
deterministic stand-in for human judgments this synthetic lake affords).
The reference engine (wesm/msgvault) has no eval harness; this extends
the extension surface's ANN-evaluation family.

Engine-exact without float summation: the per-rank discount 1/log2(i+1)
exists only at k fixed ranks, so both engines index PRECOMPUTED
fixed-point nano constants (computed once in Python, inlined as literals
in the Spark plan AND the oracle SQL — identical by construction).  DCG
is then a SUM of longs (order-free); ideal DCG is a prefix-sum lookup at
min(corpus_relevant, k); the final ratio is one integer division.

Scale shape: ranking comes from the two-level top-k (knnjoin.py — no
corpus-sized window); everything after runs on Q·k rows.  Label counts
are one corpus groupBy with map-side combine, broadcast back (labels are
a dim, not a corpus).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def discount_nano(k: int) -> list[int]:
    """[floor(1e9/log2(i+1) + 0.5) for i = 1..k] — the shared constants;
    both engines consume these literals, so libm never enters the
    comparison."""
    return [
        int(math.floor(1e9 / math.log2(i + 1) + 0.5)) for i in range(1, k + 1)
    ]


def idcg_prefix_nano(k: int) -> list[int]:
    """Prefix sums of discount_nano with a leading 0: element r+1 is the
    ideal DCG of r relevant results (1-based indexing in both engines)."""
    disc = discount_nano(k)
    out = [0]
    for d in disc:
        out.append(out[-1] + d)
    return out


def ndcg_report(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    topk: DataFrame | None = None,
) -> DataFrame:
    """(qid, n_rel, dcg_nano, idcg_nano, ndcg_ppm) per query: binary
    relevance = shares the query's label; ideal ranking uses the corpus'
    full relevant count capped at k (a query whose label is unique in
    the corpus scores 0 by convention).  Pass ``topk`` (a persisted
    (qid, id, score) frame, e.g. the recall harness' shared exact
    ground-truth artifact) to rank a precomputed retrieval instead of
    re-running the brute-force scan."""
    from msgvault_spark.similarity.knnjoin import exact_knn_join

    disc = discount_nano(k)
    prefix = idcg_prefix_nano(k)

    top = topk
    if top is None:
        top = exact_knn_join(
            corpus, queries, k=k, id_col=id_col, vec_col=vec_col
        )
    win = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    # truncate to the top-k: a deeper topk frame must not index past the
    # k-element discount array (ANSI INVALID_ARRAY_INDEX under Spark 4)
    # nor credit relevant hits beyond rank k — mirrors mrr_report
    ranked = top.withColumn("rn", F.row_number().over(win)).filter(
        F.col("rn") <= k
    )
    labels = corpus.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("lbl")
    )
    qlabels = queries.select(
        F.col(id_col).alias("qid"), F.col(label_col).alias("ql")
    )
    disc_arr = F.array(*[F.lit(d) for d in disc])
    gain = F.when(
        F.col("lbl") == F.col("ql"), F.element_at(disc_arr, F.col("rn"))
    ).otherwise(F.lit(0))
    # the retrieved set is Q·k rows — IT is the broadcast side against
    # the corpus-sized label column (broadcasting labels would be
    # corpus-granular; the r3-verdict hazard shape)
    dcg = (
        labels.join(F.broadcast(ranked), "id")
        .join(F.broadcast(qlabels), "qid")
        .groupBy("qid")
        .agg(F.sum(gain).cast("long").alias("dcg_nano"))
    )
    cnt = corpus.groupBy(F.col(label_col).alias("ql")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    prefix_arr = F.array(*[F.lit(p) for p in prefix])
    n_rel = F.least(F.col("c") - 1, F.lit(k)).cast("long")
    per_q = qlabels.join(F.broadcast(cnt), "ql").select(
        "qid",
        n_rel.alias("n_rel"),
        F.element_at(prefix_arr, (n_rel + 1).cast("int"))
        .cast("long")
        .alias("idcg_nano"),
    )
    from msgvault_spark.operators.present import present_sorted

    return (
        per_q.join(F.broadcast(dcg), "qid")
        .select(
            "qid",
            "n_rel",
            "dcg_nano",
            "idcg_nano",
            F.when(
                F.col("idcg_nano") > 0,
                F.expr("(dcg_nano * 1000000) div idcg_nano"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("ndcg_ppm"),
        )
        # eval sets are O(queries) rows — presentation sort, not a
        # range-exchange orderBy
        .transform(present_sorted, "qid")
    )


def ndcg_oracle_sql(*, nq: int, k: int = 10) -> str:
    """DuckDB twin: identical rounded-cosine ranking (the recall-report
    protocol), the same inlined discount/prefix constants, the same
    capped-ideal convention."""
    from msgvault_spark.similarity.ivf import _cos_sql

    cos = _cos_sql("e.embedding", "q.qv")
    disc = ", ".join(str(d) for d in discount_nano(k))
    prefix = ", ".join(str(p) for p in idcg_prefix_nano(k))
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
dcg AS (
    SELECT qid,
           CAST(SUM(CASE WHEN lbl = ql THEN ([{disc}])[rn] ELSE 0 END)
                AS BIGINT) AS dcg_nano
    FROM top GROUP BY qid
),
cnt AS (SELECT label AS ql, CAST(COUNT(*) AS BIGINT) AS c
        FROM embeddings GROUP BY 1),
per_q AS (
    SELECT q.qid,
           CAST(LEAST(c.c - 1, {k}) AS BIGINT) AS n_rel,
           CAST(([{prefix}])[LEAST(c.c - 1, {k}) + 1] AS BIGINT)
               AS idcg_nano
    FROM q JOIN cnt c USING (ql)
)
SELECT p.qid, p.n_rel, d.dcg_nano, p.idcg_nano,
       CASE WHEN p.idcg_nano > 0
            THEN (d.dcg_nano * 1000000) // p.idcg_nano
            ELSE 0 END AS ndcg_ppm
FROM per_q p JOIN dcg d USING (qid)
ORDER BY p.qid
"""

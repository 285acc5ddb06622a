"""Hybrid BM25 + vector search fused via Reciprocal Rank Fusion.

Rebuild of the reference's fused search (internal/vector/sqlitevec/
fused.go:128-196) and Go-side fusion (internal/vector/hybrid/rrf.go:24-85):

  - rank each signal independently (row_number over its own ordering);
  - over-fetch K+1 per signal for pool-saturation detection;
  - FULL OUTER JOIN on id, RRF score Σ 1/(rrf_k + rank);
  - optional subject-boost multiplier when the subject contains any query
    term (case-insensitive);
  - deterministic ordering: score DESC, id ASC.

Spark shape: two small ranked DataFrames (≤K+1 rows each — global
row_number over K rows is not a scale concern) full-outer-joined, score as a
column expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_RRF_K = 60


def rank_signal(scored: DataFrame, score_col: str, k: int,
                ascending: bool = False) -> DataFrame:
    """(id, signal score) → top-(k+1) with rank; rank 1 = best. Input must
    contain an ``id`` column; ordering tie-breaks on id."""
    order = (
        [F.col(score_col).asc(), F.col("id").asc()]
        if ascending
        else [F.col(score_col).desc(), F.col("id").asc()]
    )
    w = Window.orderBy(*order)
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k + 1)  # K+1 for saturation detection
    )


def rrf_fuse(
    bm25_ranked: DataFrame,
    vec_ranked: DataFrame,
    k_per_signal: int,
    rrf_k: int = DEFAULT_RRF_K,
    limit: int = 20,
    *,
    boost: float = 1.0,
    subject_terms: list[str] | None = None,
    subjects: DataFrame | None = None,
) -> DataFrame:
    """Fuse two rank_signal outputs. Returns
    (id, rrf_score, bm25_score, vector_score) ordered score DESC, id ASC.

    ``subjects``: optional (id, subject) frame for the boost lookup —
    joined only against the ≤2(K+1) fused candidates (broadcast)."""
    b = (
        bm25_ranked.filter(F.col("rnk") <= k_per_signal)
        .select(
            F.col("id"),
            F.col("score").alias("bm25_score"),
            F.col("rnk").alias("b_rnk"),
        )
    )
    v = (
        vec_ranked.filter(F.col("rnk") <= k_per_signal)
        .select(
            F.col("id").alias("v_id"),
            F.col("score").alias("vector_score"),
            F.col("rnk").alias("v_rnk"),
        )
    )
    # one parsed selectExpr (4 strings) instead of ~15 column-op Py4J
    # round-trips; association identical to the Column form (1.0D/int
    # division, coalesce-then-add), so scores are bit-equal
    fused = b.join(v, F.col("id") == F.col("v_id"), "full_outer").selectExpr(
        "coalesce(id, v_id) AS id",
        f"(coalesce(1.0D / ({rrf_k} + b_rnk), 0.0D)"
        f" + coalesce(1.0D / ({rrf_k} + v_rnk), 0.0D)) AS rrf_score",
        "bm25_score",
        "vector_score",
    )

    if boost > 1.0 and subject_terms and subjects is not None:
        terms = [t.lower() for t in subject_terms]
        subj = subjects.select(
            F.col("id").alias("s_id"), F.lower(F.col("subject")).alias("_subj")
        )
        match = None
        for t in terms:
            cond = F.col("_subj").contains(t)
            match = cond if match is None else (match | cond)
        fused = (
            fused.join(F.broadcast(subj), F.col("id") == F.col("s_id"), "left")
            .withColumn(
                "subject_boosted",
                F.coalesce(match, F.lit(False)),
            )
            .withColumn(
                "rrf_score",
                F.when(F.col("subject_boosted"), F.col("rrf_score") * boost)
                .otherwise(F.col("rrf_score")),
            )
            .drop("s_id", "_subj")
        )

    return fused.orderBy(F.col("rrf_score").desc(), F.col("id").asc()).limit(limit)


def hydrate_hits(
    hits: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "doc_id",
    cols: list[str] | None = None,
) -> DataFrame:
    """Final hydration stage of any ranked search: join the fused top-k
    (id, scores) back to the corpus for display columns — the
    GetMessageSummariesByIDs pattern (reference engine.go:36-43) at the
    corpus level, so search returns summaries, not bare ids.

    ``hits`` is ≤limit rows → it is the broadcast side; the corpus scan
    prunes to ``id`` + requested columns (column pruning reaches the
    parquet ReadSchema). All hit columns (scores, ranks) pass through."""
    cols = cols if cols is not None else [
        c for c in corpus.columns if c != id_col
    ]
    slim = corpus.select(F.col(id_col).alias("id"), *cols)
    return slim.join(F.broadcast(hits), "id").select(
        *hits.columns, *cols
    )


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_text: str,
    query_vector: list[float],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    emb_id_col: str = "vec_id",
    emb_col: str = "embedding",
    k_per_signal: int = 20,
    rrf_k: int = DEFAULT_RRF_K,
    limit: int = 20,
    boost: float = 1.0,
    round_scores: int | None = None,
    text_index: tuple[DataFrame, DataFrame] | None = None,
    corpus_stats: tuple[int, float] | None = None,
    term_stats: DataFrame | None = None,
    doc_filter=None,
    vec_filter=None,
    embeddings_normed: bool = False,
) -> DataFrame:
    """End-to-end hybrid search over a document corpus + embedding table.
    Pass ``text_index`` (postings, doc_stats from build_inverted_index) to
    reuse an ETL-time index instead of rebuilding per query.

    ``doc_filter`` / ``vec_filter`` are Column predicates pushed into BOTH
    signals — the reference's shared `filtered` CTE constraining FTS and
    ANN alike (Q10, sqlitevec/fused.go:128-147). BM25 keeps global corpus
    stats; only candidacy is restricted."""
    from msgvault_spark.search.fts import bm25_scores, bm25_search
    from msgvault_spark.similarity.knn import knn_bruteforce, knn_bruteforce_normed

    if text_index is not None:
        postings, doc_stats = text_index
        terms = [t for t in query_text.lower().split() if t]
        bm25_top = (
            bm25_scores(postings, doc_stats, terms, round_to=round_scores,
                        corpus_stats=corpus_stats, term_stats=term_stats,
                        candidate_filter=doc_filter)
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k_per_signal + 1)
        ).withColumnRenamed("doc_id", "id")
    else:
        src = docs if doc_filter is None else docs.filter(doc_filter)
        bm25_top = bm25_search(
            src, id_col, text_col, query_text, k_per_signal + 1,
            round_to=round_scores,
        ).withColumnRenamed("doc_id", "id")
    bm25_ranked = rank_signal(bm25_top, "score", k_per_signal)

    emb_src = embeddings if vec_filter is None else embeddings.filter(vec_filter)
    if embeddings_normed:
        # `embeddings` is a normed_embeddings artifact (emb_d, emb_norm)
        vec_top = knn_bruteforce_normed(
            emb_src, query_vector, k_per_signal + 1, emb_id_col,
            round_to=round_scores,
        )
    else:
        vec_top = knn_bruteforce(
            emb_src, query_vector, k_per_signal + 1, emb_id_col, emb_col,
            round_to=round_scores,
        )
    vec_ranked = rank_signal(vec_top, "score", k_per_signal)

    subjects = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("subject"))
    return rrf_fuse(
        bm25_ranked,
        vec_ranked,
        k_per_signal,
        rrf_k,
        limit,
        boost=boost,
        subject_terms=[t for t in query_text.lower().split() if t],
        subjects=subjects if boost > 1.0 else None,
    )

"""Batch KNN join: top-k neighbors for EVERY query vector in a query set,
via shared LSH buckets — the all-at-once sibling of the single-seed
searches (knn.py exact, lsh.py/ivf.py/pq.py approximate).

This is the shape batch retrieval jobs want (dedup candidate generation,
eval-set neighbor dumps, clustering seeds): one distributed job computing
`queries × k` neighbor edges, never a per-query driver loop — a loop of
ann_search() calls would schedule Q jobs and re-scan the index Q times.

Plan shape:
  - both sides keyed by the SAME deterministic hyperplane bands
    (lsh.py:build_ann_index — md5-derived coefficients, engine-portable);
  - candidates = equi-join on bucket (query side broadcast: query sets
    are small relative to the corpus; flip to a shuffle join when they
    are not), deduped on (qid, id) because a pair can share >1 band;
  - exact cosine rerank, then per-query top-k window — the window's
    partition is a single query's candidate list (bucket-bounded), never
    the corpus.

At 100 TB the index is the lake-persisted artifact bucketed by `bucket`
(sources/build_cache.py pattern) and the per-band fan-out is the only row
multiplication; no stage touches all pairs. Skew bound: a hot bucket
caps at its member count × the queries landing in it; band width
(planes_per_band) is the knob that splits hot buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from msgvault_spark.similarity.knn import _as_double, cosine
from msgvault_spark.similarity.lsh import build_ann_index


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    dim: int,
    bands: int = 4,
    planes_per_band: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """(qid, id, score): k nearest corpus neighbors per query row, scored
    by exact cosine over LSH-bucket candidates; self-pairs excluded."""
    idx = build_ann_index(
        corpus, dim=dim, bands=bands, planes_per_band=planes_per_band,
        id_col=id_col, vec_col=vec_col,
    )
    qidx = build_ann_index(
        queries, dim=dim, bands=bands, planes_per_band=planes_per_band,
        id_col=id_col, vec_col=vec_col,
    ).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec"), "bucket"
    )
    cands = (
        idx.join(F.broadcast(qidx), "bucket")
        .filter(F.col("id") != F.col("qid"))
        .dropDuplicates(["qid", "id"])
    )
    scored = cands.select(
        "qid",
        "id",
        F.round(cosine(F.col("vec"), F.col("qvec")), round_to).alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "id", "score")
    )


def exact_knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact batch top-k: (qid, id, score) of the k nearest corpus rows
    for EVERY query row, by brute force — the ground truth an ANN recall
    report compares against (eval sets are O(100) seeds, so the Q×N scan
    is the deliberate cost; the per-seed serving path is knn_bruteforce).

    Scale shape: the query side broadcasts (tiny); top-k is TWO-LEVEL so
    no task ever holds a corpus-sized window partition — level 1 keeps k
    per (qid, input partition) via a window keyed by spark_partition_id
    (any superset of the true top-k survives, so the result is
    partitioning-independent), level 2 reduces the ≤ partitions·k
    survivors per qid."""
    q = queries.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec")
    )
    scored = c.join(F.broadcast(q), F.col("id") != F.col("qid")).select(
        "qid",
        "id",
        F.round(cosine(F.col("vec"), F.col("qvec")), round_to).alias("score"),
    )
    return two_level_topk(scored, k, score_col="score")


def two_level_topk(
    scored: DataFrame,
    k: int,
    *,
    qid_col: str = "qid",
    id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """Top-k rows per ``qid_col`` by (score desc, id asc) WITHOUT a
    corpus-sized window partition: level 1 keeps k per (qid, input
    partition) — any superset of the true top-k survives, so the result
    is partitioning-independent — level 2 reduces the ≤ partitions·k
    survivors per qid. The shape every batch ranking over a per-query
    corpus-sized candidate set must use (exact ground truth, SQ8/PQ
    recall rankings)."""
    with_part = scored.withColumn("__part", F.spark_partition_id())
    w1 = Window.partitionBy(qid_col, "__part").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    local = (
        with_part.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
        .drop("__part", "rn")
    )
    w2 = Window.partitionBy(qid_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        local.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .select(qid_col, id_col, score_col)
    )


def hard_negative_join(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 6,
) -> DataFrame:
    """Hard-negative mining for embedding-model training: for every query
    row, the k nearest corpus rows whose LABEL DIFFERS — the most
    confusable wrong-class examples, the contrastive-training counterpart
    of exact_knn_join's eval dump. Same scale shape: broadcast query set,
    label-mismatch pushed into the join condition (the filter prunes
    before any scoring), two-level top-k so no corpus-sized window
    partition exists. Null labels never match (SQL != semantics), so
    unlabeled rows produce no negatives."""
    q = queries.select(
        F.col(id_col).alias("qid"),
        _as_double(F.col(vec_col)).alias("qvec"),
        F.col(label_col).alias("qlabel"),
    )
    c = corpus.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("vec"),
        F.col(label_col).alias("clabel"),
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("id") != F.col("qid")) & (F.col("clabel") != F.col("qlabel")),
    ).select(
        "qid",
        "id",
        F.round(cosine(F.col("vec"), F.col("qvec")), round_to).alias("score"),
    )
    return two_level_topk(scored, k, score_col="score")

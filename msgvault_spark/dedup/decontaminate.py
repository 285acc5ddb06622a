"""Benchmark decontamination: n-gram collision between a training corpus
and an evaluation/benchmark set.

The standard LLM-training hygiene step (the n-gram overlap check of
GPT-3's appendix C and "Deduplicating Training Data Makes Language Models
Better", Lee et al. 2022): a training document that shares enough word
n-grams with a benchmark document leaks the benchmark — flag it before
training, don't discover it in the eval numbers.

Scale shape — deliberately NOT the near-dup self-join: the benchmark side
is small (eval sets are thousands of docs, the corpus is billions), so its
distinct gram set builds once and the corpus side streams through ONE
broadcast-friendly equi-join on gram, then aggregates collisions per
(train doc, benchmark doc). No corpus self-join, no candidate explosion;
cost is linear in corpus grams. The gram shingler is shared with the
near-dup family (dedup/minhash.py:word_shingles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from msgvault_spark.dedup.minhash import word_shingles


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 3,
    min_collisions: int = 2,
) -> DataFrame:
    """(doc_id, bench_id, n_collisions) for every corpus/benchmark pair
    sharing ≥ ``min_collisions`` DISTINCT word n-grams. Self-pairs (the
    benchmark sampled from the corpus itself) are excluded by id."""
    corpus_grams = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("gram"),
    )
    bench_grams = (
        benchmark.select(
            F.col(bench_id_col).alias("bench_id"),
            F.explode(word_shingles(F.col(bench_text_col), n)).alias("gram"),
        )
        .distinct()
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_collisions"))
        .filter(F.col("n_collisions") >= min_collisions)
        .sortWithinPartitions("doc_id", "bench_id")
    )


def contaminated_docs(pairs: DataFrame) -> DataFrame:
    """Per-train-doc rollup of contamination_pairs: how many benchmark
    docs it collides with and the total collision mass — the drop list."""
    return (
        pairs.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bench_docs"),
            F.sum("n_collisions").cast("long").alias("total_collisions"),
        )
        .sortWithinPartitions("doc_id")
    )


def decontaminate_oracle_sql(
    corpus_select: str,
    benchmark_select: str,
    *,
    n: int = 3,
    min_collisions: int = 2,
) -> str:
    """DuckDB replica: same shingler as ngram_jaccard_oracle_sql, naive
    gram equi-join (the oracle has no broadcast to prove)."""
    gram_cte = f"""
    SELECT doc_id,
           CASE WHEN len(w) >= {n}
                THEN list_distinct(list_transform(
                     generate_series(1, len(w) - {n - 1}),
                     i -> list_aggregate(w[i:i+{n - 1}], 'string_agg', ' ')))
                ELSE [list_aggregate(w, 'string_agg', ' ')]
           END AS grams
    FROM (SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x != '') AS w
          FROM src)
    """
    return f"""
WITH corpus_grams AS (
    WITH src AS ({corpus_select})
    SELECT doc_id, unnest(grams) AS gram FROM ({gram_cte})
),
bench_grams AS (
    WITH src AS ({benchmark_select})
    SELECT DISTINCT doc_id AS bench_id, unnest(grams) AS gram
    FROM ({gram_cte})
)
SELECT c.doc_id, b.bench_id,
       CAST(COUNT(*) AS BIGINT) AS n_collisions
FROM corpus_grams c JOIN bench_grams b USING (gram)
WHERE c.doc_id != b.bench_id
GROUP BY 1, 2
HAVING COUNT(*) >= {min_collisions}
ORDER BY doc_id, bench_id
"""


def semantic_contamination(
    embeddings: DataFrame,
    benchmark: DataFrame,
    *,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Embedding-space decontamination — the semantic sibling of the
    n-gram check above, for paraphrased leakage n-grams miss: flag every
    corpus vector whose max cosine against ANY benchmark vector reaches
    ``threshold``. Returns (id, max_sim), id-ordered.

    Scale shape mirrors contamination_pairs: the benchmark side is the
    small one (eval sets, not the corpus) and BROADCASTS; the corpus
    streams through one map-shaped pass costing O(|bench|·d) per row with
    a map-side partial max — no corpus self-join. For benchmark sets too
    large to broadcast, route through the LSH/IVF batch joins
    (similarity/knnjoin.py, similarity/ivf.ivf_knn_join) with the
    benchmark as the query set instead."""
    from msgvault_spark.similarity.knn import _as_double, cosine

    bench = benchmark.select(
        F.col(id_col).alias("bid"), _as_double(F.col(vec_col)).alias("bvec")
    )
    corpus = embeddings.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec")
    )
    return (
        corpus.join(F.broadcast(bench), F.col("id") != F.col("bid"))
        .select(
            "id",
            F.round(cosine(F.col("vec"), F.col("bvec")), round_to).alias("sim"),
        )
        .groupBy("id")
        .agg(F.max("sim").alias("max_sim"))
        .filter(F.col("max_sim") >= threshold)
    )


def semantic_contamination_gemm(
    embeddings: DataFrame,
    benchmark: DataFrame,
    *,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Drop-in twin of semantic_contamination (same output bits) with
    GEMM-margin candidate generation — the dedup/embedding_gemm.py
    two-phase applied to the corpus × benchmark shape: each Arrow batch
    of corpus vectors takes one float64 GEMM against the (small,
    driver-collected) benchmark matrix, pairs clearing
    ``threshold − margin`` survive, and survivors are re-scored by the
    SAME JVM-fold cosine + round the oracle pins before the per-id max.

    Bit-parity argument (FINITE-component vectors — the contract the
    embedding pipeline's promote_generation gate enforces at ingest): any
    (id, bid) whose fold-rounded sim could be the emitted max is ≥
    threshold, so its GEMM sim clears the dimension-scaled margin and it
    is in the candidate set; every non-candidate's fold sim is <
    threshold and therefore below any emitted max. NULL / zero-norm
    vectors vanish from both paths (NULL fold sim is dropped by the
    filter; the NaN a zero norm produces never passes the numpy cut). A
    vector with a NaN COMPONENT would diverge — numpy's ``>= cut`` is
    False for NaN while Spark's max/>= sorts NaN greatest — which is why
    non-finite components are rejected upstream, not handled here.
    Measured round 10 at sf1 (sink regime): 57.1s (interpreted fold per
    pair) → ~1.8s, identical rows (RATIOS_sf1.md)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from msgvault_spark.similarity.knn import _as_double, cosine

    bench = benchmark.select(
        F.col(id_col).alias("bid"), _as_double(F.col(vec_col)).alias("bvec")
    )
    corpus = embeddings.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec")
    )
    bench_rows = [r for r in bench.collect() if r["bvec"] is not None]
    if not bench_rows:
        return corpus.select(
            "id", F.lit(None).cast("double").alias("max_sim")
        ).limit(0)
    bids = np.asarray([r["bid"] for r in bench_rows], dtype=np.int64)
    B = np.asarray([r["bvec"] for r in bench_rows], dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        nb = np.sqrt((B * B).sum(axis=1))
    d = B.shape[1]
    half_ulp = 0.5 * 10.0 ** (-round_to)
    cut = threshold - (half_ulp + 8.0 * d * np.finfo(np.float64).eps)

    def _propose(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            A = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["vec"]]
            )
            with np.errstate(divide="ignore", invalid="ignore"):
                na = np.sqrt((A * A).sum(axis=1))
                cos = (A @ B.T) / np.outer(na, nb)
            cond = cos >= cut
            cond &= ids[:, None] != bids[None, :]
            ii, jj = np.nonzero(cond)
            if ii.size == 0:
                continue
            yield pd.DataFrame({"id": ids[ii], "bid": bids[jj]})

    schema = StructType(
        [StructField("id", LongType()), StructField("bid", LongType())]
    )
    cands = corpus.filter(F.col("vec").isNotNull()).mapInPandas(
        _propose, schema=schema
    )
    return (
        cands.join(corpus, "id")
        .join(F.broadcast(bench), "bid")
        .select(
            "id",
            F.round(cosine(F.col("vec"), F.col("bvec")), round_to).alias("sim"),
        )
        .groupBy("id")
        .agg(F.max("sim").alias("max_sim"))
        .filter(F.col("max_sim") >= threshold)
    )

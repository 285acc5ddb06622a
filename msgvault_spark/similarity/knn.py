"""Vector similarity search over an ArrayType(FloatType) embedding column.

Reference capability: sqlite-vec vec0 KNN with per-generation dim check
(internal/sqlitevec/fused.go:36-48,162-173). Spark-first rebuild:

  - exact brute-force: JVM-side fold (F.aggregate over zip_with) for the dot
    product — no Python UDF in the hot path — then TakeOrderedAndProject
    top-k. O(N·d) scan-shaped: at 100 TB this is one map stage + a k-size
    reduce, no shuffle of the corpus.
  - scale path: LSH bucketing (random hyperplane signs) in lsh.py restricts
    the scan to candidate buckets.

Dot products fold left-to-right over the array — deterministic, and
matching DuckDB's sequential list_* fold for oracle comparison (scores are
still rounded before comparing; see catalog).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from msgvault_spark.functions.arrays import lit_double_array


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential JVM fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    """NULL (not an ANSI divide-by-zero error) when either vector has zero
    norm; NULL scores sort last under the desc ordering every caller uses."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def normed_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ETL-time companion frame any real vector index stores next to the
    raw vectors: the vector pre-cast to double (emb_d) and its L2 norm
    (emb_norm). Per-query cosine against it folds ONCE (the dot product)
    instead of three times (dot + corpus-norm + query-norm folds), and the
    stored norm uses the identical JVM fold, so scores are bit-identical
    to the fold-per-query formulation."""
    emb_d = _as_double(F.col(vec_col))
    return embeddings.select(
        F.col(id_col), emb_d.alias("emb_d"), l2_norm(emb_d).alias("emb_norm")
    )


def knn_bruteforce_normed(
    embeddings_normed: DataFrame,
    query_vector: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    *,
    round_to: int | None = None,
    exclude_id: int | None = None,
) -> DataFrame:
    """knn_bruteforce against a normed_embeddings artifact: one fold per
    row (the dot product), stored corpus norm, query norm computed once
    driver-side with the same left-to-right IEEE accumulation as the JVM
    fold — bit-identical scores, ~3× less per-row arithmetic."""
    import math

    q = [float(x) for x in query_vector]
    acc = 0.0
    for x in q:
        acc += x * x
    qnorm = math.sqrt(acc)
    score = F.try_divide(
        dot(F.col("emb_d"), lit_double_array(q)),
        F.col("emb_norm") * F.lit(qnorm),
    )
    out = embeddings_normed.select(
        F.col(id_col).alias("id"), score.alias("score")
    )
    if exclude_id is not None:
        out = out.filter(F.col("id") != exclude_id)
    if round_to is not None:
        out = out.withColumn("score", F.round(F.col("score"), round_to))
    return out.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)


def knn_bruteforce(
    embeddings: DataFrame,
    query_vector: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    *,
    round_to: int | None = None,
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact top-k (id, score) for one query vector. The query vector rides
    along as a literal array — broadcast by value, no join."""
    # one parsed SQL array literal, not a per-dimension Py4J conversion
    qcol = lit_double_array(query_vector)
    emb = _as_double(F.col(vec_col))
    if metric == "cosine":
        score = cosine(emb, qcol)
    elif metric == "dot":
        score = dot(emb, qcol)
    else:
        raise ValueError(f"unknown metric: {metric}")
    out = embeddings.select(
        F.col(id_col).alias("id"), score.alias("score")
    )
    if exclude_id is not None:
        out = out.filter(F.col("id") != exclude_id)
    if round_to is not None:
        out = out.withColumn("score", F.round(F.col("score"), round_to))
    return out.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)


def knn_for_seed(
    embeddings: DataFrame,
    seed_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    round_to: int | None = None,
) -> DataFrame:
    """Find-similar (Q9): use a stored row's embedding as the query vector
    (reference mcp/server.go:342-360). One tiny collect for the seed."""
    seed = embeddings.filter(F.col(id_col) == seed_id).select(vec_col).head()
    if seed is None:
        raise KeyError(f"seed id {seed_id} not found")
    return knn_bruteforce(
        embeddings,
        list(seed[0]),
        k,
        id_col,
        vec_col,
        round_to=round_to,
        exclude_id=seed_id,
    )

"""SemDeDup-style semantic deduplication: cluster the embedding space,
then drop within-cluster semantic duplicates (cosine above a threshold,
keeping the lowest id of each duplicate pair) — the embedding-space
complement to MinHash/SimHash surface dedup (Abbas et al., "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication",
2023; public arXiv method).

Why this scales where all-pairs cannot: the pairwise comparison is
CONFINED to a cluster. With K cells over N vectors the join cost is
O(Σ|cell|²) ≈ O(N²/K) — at 100 TB you size K so the expected cell fits an
executor (K ~ N/10⁴), and the cluster assignment itself is a pure
broadcast-argmax map (similarity/ivf.py). The intra-cell self-join
shuffles both sides on cell id once; skewed cells split under AQE like
any other join key.

Determinism: cell assignment uses the reproducible lowest-id-centroid
IVF initialization and all cosines round before comparison, so a DuckDB
oracle replays the whole pipeline exactly (semdedup_oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from msgvault_spark.operators.present import present_sorted

from msgvault_spark.similarity.ivf import build_ivf_index, _cos_sql
from msgvault_spark.similarity.knn import cosine


def semantic_dedup(
    embeddings: DataFrame | None = None,
    *,
    n_cells: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    index: DataFrame | None = None,
) -> DataFrame:
    """(id, cell, is_survivor): every vector with its cluster and whether
    it survives semantic dedup. A vector is DROPPED iff some lower-id
    vector in the same cell has rounded cosine >= threshold with it —
    the SemDeDup keep-one-per-near-duplicate-pair rule with the repo's
    standard lowest-id survivor tie-break (D3).

    Pass ``index`` — a PERSISTED build_ivf_index frame — in production:
    the assignment is an ETL artifact, and without persistence the
    centroid broadcast-cross-join subplan is recomputed for each of the
    three branches that read it."""
    if index is not None:
        idx = index.select(F.col("id"), F.col("vec"), F.col("cell"))
    else:
        idx = build_ivf_index(
            embeddings, n_cells=n_cells, id_col=id_col, vec_col=vec_col
        ).select(F.col("id"), F.col("vec"), F.col("cell"))
    a = idx.select(
        F.col("cell"),
        F.col("id").alias("id_a"),
        F.col("vec").alias("va"),
    )
    b = idx.select(
        F.col("cell"),
        F.col("id").alias("id_b"),
        F.col("vec").alias("vb"),
    )
    dropped = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.round(cosine(F.col("va"), F.col("vb")), round_to)
            >= F.lit(threshold)
        )
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return (
        idx.join(dropped.withColumn("__dropped", F.lit(True)), "id", "left")
        .select(
            "id",
            "cell",
            F.coalesce(~F.col("__dropped"), F.lit(True)).alias("is_survivor"),
        )
    )


def semantic_dedup_summary(flags: DataFrame) -> DataFrame:
    """Per-cell rollup of semantic_dedup output: (cell, n_members,
    n_survivors), cell ascending — the report a curation pipeline logs."""
    return (
        flags.groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum(F.col("is_survivor").cast("long"))
            .cast("long")
            .alias("n_survivors"),
        )
        .transform(present_sorted, "cell")
    )


def semdedup_oracle_sql(
    *,
    n_cells: int = 8,
    threshold: float = 0.95,
    round_to: int = 6,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB replica of semantic_dedup + summary: identical centroid
    choice, assignment tie-break, rounding, and survivor rule."""
    return f"""
WITH cents AS (
    SELECT {id_col} AS cid, {vec_col} AS cvec FROM {table}
    WHERE {id_col} < {n_cells}
),
assigned AS (
    SELECT {id_col} AS id, {vec_col} AS vec, cid AS cell FROM (
        SELECT e.{id_col}, e.{vec_col}, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY e.{id_col}
                   ORDER BY {_cos_sql(f'e.{vec_col}', 'c.cvec')} DESC,
                            c.cid ASC
               ) AS rn
        FROM {table} e CROSS JOIN cents c
    ) WHERE rn = 1
),
dropped AS (
    SELECT DISTINCT b.id
    FROM assigned a JOIN assigned b
      ON a.cell = b.cell AND a.id < b.id
    WHERE round({_cos_sql('a.vec', 'b.vec')}, {round_to}) >= {threshold}
)
SELECT cell,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(CASE WHEN d.id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_survivors
FROM assigned s LEFT JOIN dropped d ON d.id = s.id
GROUP BY cell
ORDER BY cell
"""

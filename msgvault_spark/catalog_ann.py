"""Composed-ANN catalog entries (round 12+).

Lives in its own module so additions here have a one-entry gate blast
radius (tools/gate_priority.py treats a module's entries as the unit of
re-verification; extending catalog_search.py would mark its ~20 settled
search entries as narrow-change must-verify and blow the driver's
50-slot rotation window for no semantic reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from msgvault_spark.catalog import register
from msgvault_spark.catalog_search import _seed_vector
from msgvault_spark.similarity.ivfpq import (
    build_ivfpq_index,
    ivfpq_oracle_sql,
    ivfpq_search,
)
from msgvault_spark.similarity.pq import collect_codebooks
from msgvault_spark.sources.loader import load_table

_IVFPQ_MEMO: dict[tuple, object] = {}


def get_ivfpq_index(spark: SparkSession, sf_dir: str):
    """Memoized IVF-PQ ETL artifacts: (codebooks, lake-persisted
    (cell, id, codes) table) — the one stored table of the composed
    index, written through the artifact store so serving sessions scan
    it (bucketed by cell at lake scale)."""
    from msgvault_spark.sources.cache import get_artifact

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _IVFPQ_MEMO:
        emb = load_table(spark, sf_dir, "embeddings")
        books = collect_codebooks(emb, m=4, n_codes=16)
        index = get_artifact(
            spark,
            (sf_dir, "ivfpq_index", 8, 4, 16),
            lambda: build_ivfpq_index(emb, books, n_cells=8).coalesce(4),
        )
        _IVFPQ_MEMO[key] = (books, index)
    return _IVFPQ_MEMO[key]


@register(
    "ivfpq_knn_seed0",
    ivfpq_oracle_sql(0, k=10, rerank=30, n_cells=8, nprobe=2, m=4,
                     n_codes=16, dim=64),
)
def ivfpq_knn_seed0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with exact re-rank (similarity/ivfpq.py) — the composed
    billion-scale ANN shape (FAISS IndexIVFPQ): probe 2 of 8 cells,
    integer-ADC the probed cells' m-byte codes, exact-cosine re-rank the
    top 30 candidates for the final 10. The (cell, id, codes) table is
    the one stored artifact; candidate generation never touches floats,
    and the re-rank fetch is a 30-row broadcast semi-join. Approximate by
    construction, hash-exact because the oracle replays the identical
    centroids, codebooks, and integer ADC."""
    emb = load_table(spark, sf_dir, "embeddings")
    books, index = get_ivfpq_index(spark, sf_dir)
    seed = [float(v) for v in _seed_vector(spark, sf_dir, 0)]
    return ivfpq_search(
        index, books, emb, seed, k=10, rerank=30, n_cells=8, nprobe=2,
        exclude_id=0,
    )

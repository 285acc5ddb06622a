"""Approximate nearest-neighbor search: multi-band random-hyperplane LSH.

Scale path for Q7 (brute-force cosine is the exact baseline in knn.py).
Design, mirroring the MinHash banding that fixes single-band recall:

  - ``bands`` independent groups of ``planes_per_band`` hyperplanes;
  - vector → one bucket key per band (sign-bit string);
  - index time: explode vectors into (band, bucket, id, vec) postings —
    at 100 TB this is the partitioned inverted index, bucketed by key;
  - query time: compute the query's band keys, union the matching buckets'
    members (candidate set), exact-cosine rerank top-k.

A pair at angle θ collides in one band with p = (1-θ/π)^r; across b bands
P = 1-(1-p)^b — recall tunes with b without widening buckets.

Hyperplane coefficients derive from md5 (deterministic, engine-portable);
coefficients materialize as plan literals, so the same index is reproducible
anywhere — including the DuckDB oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from msgvault_spark.functions.arrays import lit_double_array

from msgvault_spark.similarity.knn import _as_double, cosine


def plane_coeff(band: int, plane: int, dim: int) -> float:
    """Deterministic pseudo-random coefficient in [-1, 1)."""
    h = hashlib.md5(f"{band}:{plane}:{dim}".encode()).hexdigest()[:6]
    return int(h, 16) / float(16**6 // 2) - 1.0


def band_key(vec: Column, band: int, planes_per_band: int, dim: int) -> Column:
    bits = []
    for p in range(planes_per_band):
        coeffs = lit_double_array(plane_coeff(band, p, d) for d in range(dim))
        dot_p = F.aggregate(
            F.zip_with(vec, coeffs, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot_p >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(F.lit(f"{band}:"), *bits)


def build_ann_index(
    embeddings: DataFrame,
    *,
    dim: int,
    bands: int = 4,
    planes_per_band: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Inverted index: (bucket, id, vec). Persist/bucket this at ETL time."""
    v = _as_double(F.col(vec_col))
    keys = F.array(
        *[band_key(v, b, planes_per_band, dim) for b in range(bands)]
    )
    return embeddings.select(
        F.col(id_col).alias("id"), v.alias("vec"), F.explode(keys).alias("bucket")
    )


def ann_search(
    index: DataFrame,
    query_vector: list[float],
    k: int = 10,
    *,
    bands: int = 4,
    planes_per_band: int = 8,
    round_to: int | None = None,
) -> DataFrame:
    """Top-k (id, score) from candidate buckets only. The bucket-key filter
    is a literal IN-list — partition pruning on a bucketed index."""
    dim = len(query_vector)
    qbits: list[str] = []
    for b in range(bands):
        bits = "".join(
            "1"
            if sum(
                plane_coeff(b, p, d) * query_vector[d] for d in range(dim)
            )
            >= 0
            else "0"
            for p in range(planes_per_band)
        )
        qbits.append(f"{b}:{bits}")

    qcol = lit_double_array(query_vector)
    cands = (
        index.filter(F.col("bucket").isin(qbits))
        .select("id", "vec")
        .distinct()
    )
    out = cands.select(
        "id", cosine(F.col("vec"), qcol).alias("score")
    )
    if round_to is not None:
        out = out.withColumn("score", F.round(F.col("score"), round_to))
    return out.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)

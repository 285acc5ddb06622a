"""Random-projection (Johnson–Lindenstrauss) dimensionality reduction
for embedding columns — the cheap front-end that makes every downstream
ANN/dedup pass (lsh.py, ivf.py, pq.py, knnjoin.py) scan k/d of the
bytes at a bounded distance distortion.

Projection matrix: Achlioptas (2003) ±1 signs — y_j = (1/√k)·Σ_d s_jd·x_d
with s_jd ∈ {−1, +1} derived from md5(j, d), the same deterministic
engine-portable coefficient trick the LSH hyperplanes use
(similarity/lsh.py:plane_coeff). No gaussian sampling, no stored matrix:
the signs fold into the plan as literals (k·d tiny), so projection is a
PURE MAP — no shuffle, no UDF, and the DuckDB oracle replays it exactly.

JL guarantee: pairwise distances distort by ≤ ε with k = O(ln n / ε²);
the test pins empirical cosine preservation on clustered data.

Per spark-local-perf-findings: the input vector is SELECTed into a bound
column before the k per-dimension aggregates close over it.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from msgvault_spark.functions.arrays import lit_double_array


def rp_sign(j: int, d: int) -> int:
    """Deterministic ±1, engine-portable (parity of an md5 nibble)."""
    h = hashlib.md5(f"rp:{j}:{d}".encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 0 else -1


def project(
    embeddings: DataFrame,
    *,
    out_dim: int,
    in_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """(id, proj array<double>): y_j = round(Σ_d s_jd·x_d / √k, 6)."""
    inv = 1.0 / math.sqrt(out_dim)
    bound = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    comps = []
    for j in range(out_dim):
        signs = lit_double_array(float(rp_sign(j, d)) for d in range(in_dim))
        comps.append(
            F.round(
                F.aggregate(
                    F.zip_with(F.col("v"), signs, lambda x, s: x * s),
                    F.lit(0.0),
                    lambda acc, t: acc + t,
                )
                * inv,
                round_to,
            )
        )
    return bound.select("id", F.array(*comps).alias("proj"))


def project_wide(
    embeddings: DataFrame,
    *,
    out_dim: int,
    in_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Same projection, flat schema: (id, p0..p{k-1} DOUBLE). One scalar
    column per output dimension — the shape column-oriented sinks (and
    the driver's row-hash canonicalizer) want; still a pure map."""
    inv = 1.0 / math.sqrt(out_dim)
    bound = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    cols = []
    for j in range(out_dim):
        signs = lit_double_array(float(rp_sign(j, d)) for d in range(in_dim))
        cols.append(
            F.round(
                F.aggregate(
                    F.zip_with(F.col("v"), signs, lambda x, s: x * s),
                    F.lit(0.0),
                    lambda acc, t: acc + t,
                )
                * inv,
                round_to,
            ).alias(f"p{j}")
        )
    return bound.select("id", *cols)


def rp_oracle_sql(
    *,
    out_dim: int,
    in_dim: int,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    where: str = "1=1",
) -> str:
    """DuckDB replica: identical sign literals, identical left-to-right
    summation, one multiply by 1/√k, same rounding."""
    inv = repr(1.0 / math.sqrt(out_dim))
    comps = []
    for j in range(out_dim):
        terms = " + ".join(
            f"({float(rp_sign(j, d))!r} * CAST({vec_col}[{d + 1}] AS DOUBLE))"
            for d in range(in_dim)
        )
        comps.append(f"round(({terms}) * {inv}, {round_to})")
    arr = ", ".join(comps)
    return f"""
SELECT {id_col} AS id, [{arr}] AS proj
FROM {table}
WHERE {where}
"""


def rp_oracle_sql_wide(
    *,
    out_dim: int,
    in_dim: int,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    where: str = "1=1",
) -> str:
    """DuckDB replica of project_wide: one scalar p{j} column per output
    dimension (driver-hashable), same literals / order / rounding."""
    inv = repr(1.0 / math.sqrt(out_dim))
    comps = []
    for j in range(out_dim):
        terms = " + ".join(
            f"({float(rp_sign(j, d))!r} * CAST({vec_col}[{d + 1}] AS DOUBLE))"
            for d in range(in_dim)
        )
        comps.append(f"round(({terms}) * {inv}, {round_to}) AS p{j}")
    cols = ", ".join(comps)
    return f"""
SELECT {id_col} AS id, {cols}
FROM {table}
WHERE {where}
"""

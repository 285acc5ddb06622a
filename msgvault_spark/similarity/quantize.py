"""Int8 scalar quantization for embedding columns (SQ8, the FAISS
``ScalarQuantizer`` family): 4× memory/bandwidth reduction and integer
SIMD dot products, the standard first move when an embedding corpus stops
fitting executor memory.

Per-vector max-abs quantization: q[i] = round_half_up(127 · x[i] / ‖x‖∞),
stored as an int array beside its scale. Integer dot products then rank
candidates (monotone proxy for cosine when vectors are near-normalized);
exact float rerank of the short list recovers full precision — the
two-stage retrieve-rerank every production ANN stack runs.

Engine-portability note: rounding is floor(v + 0.5), not round() —
Spark HALF_UPs doubles while DuckDB HALF_EVENs them, and a quantizer must
produce identical codes everywhere or index and query disagree. Integer
dot products are then exact in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from msgvault_spark.functions.arrays import lit_long_array


def _round_half_up(v: Column) -> Column:
    return F.floor(v + F.lit(0.5)).cast("long")


def quantize_vector(vec: Column) -> Column:
    """float array → int8-range codes (long array; parquet dictionary +
    bit-packing stores them in ~1 byte). Zero vectors quantize to zeros.

    The max-abs fold is bound ONCE per row through a single-element
    transform (a let-binding): referencing the fold subtree directly inside
    the per-element lambda re-evaluates it for every element — O(d²)
    interpreted steps per row, measured 16× slower at d=64."""
    maxabs = F.aggregate(
        vec, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    return F.element_at(
        F.transform(
            F.array(maxabs),
            lambda m: F.when(
                m > 0,
                F.transform(
                    vec,
                    lambda x: _round_half_up(x.cast("double") * 127.0 / m),
                ),
            ).otherwise(F.transform(vec, lambda x: F.lit(0).cast("long"))),
        ),
        1,
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two code arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantize_codes(
    df: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """(id, codes) frame — the SQ8 index artifact an ETL pass persists
    beside the corpus (sources/cache.get_artifact memoizes it)."""
    return df.select(
        F.col(id_col), quantize_vector(F.col(emb_col)).alias("codes")
    )


def quantized_knn(
    embeddings: DataFrame,
    query_vector: list[float],
    k: int,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """Top-k by integer dot product of quantized codes: (id, qscore),
    qscore descending, id ascending. At scale pass ``codes`` — the
    ETL-persisted artifact from :func:`quantize_codes`; the float column
    then never leaves disk during candidate generation."""
    import math

    mx = max(abs(v) for v in query_vector)
    qv = [int(math.floor(v * 127.0 / mx + 0.5)) if mx > 0 else 0
          for v in query_vector]
    if codes is None:
        codes = quantize_codes(embeddings, id_col, emb_col)
    q = lit_long_array(qv)
    return (
        codes.select(
            F.col(id_col), int_dot(F.col("codes"), q).alias("qscore")
        )
        .orderBy(F.col("qscore").desc(), F.col(id_col).asc())
        .limit(k)
    )

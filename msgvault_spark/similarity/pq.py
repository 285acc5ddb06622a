"""Product quantization (PQ) for embedding columns — the third ANN scale
path next to LSH (lsh.py) and IVF (ivf.py), and the memory-compression
complement to SQ8 (quantize.py).

Reference parity: the reference's vector search is exact brute-force over
float32 (wesm/msgvault internal/vector/store.go) — PQ is an extension the
way IVF/LSH are, for the corpus sizes where even int8 codes don't fit.

The classic PQ decomposition (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011):

  - split each d-dim vector into ``m`` contiguous subvectors of d/m dims;
  - per subspace, a codebook of K codewords; each subvector is encoded as
    the id of its nearest (L2) codeword → the vector compresses to m
    small ints (m·log2 K bits ≈ m bytes vs 4d bytes float32);
  - asymmetric distance computation (ADC) at query time: precompute a
    lookup table LUT[j][c] = <q_subj, codeword_jc> once per query (m·K
    dot products, driver-side, microseconds), then every candidate scores
    as sum_j LUT[j][codes[j]] — no float vector is ever touched.

Codebooks here are the subvector slices of the K lowest-id stored vectors
— the same deterministic "data points as centroids" initialization IVF
uses (ivf.py), which is what lets the DuckDB oracle replay encoding and
ADC bit-for-bit. Production would k-means each subspace (see
similarity/ivf.py:train_ivf_kmeans for the collect-tiny-state loop that
would train them); the encode/serve planes are identical either way.

Scale shape (100 TB): codebooks are m·K·(d/m) = K·d floats — kilobytes,
collected once and folded into the plan as literals. Encoding is then a
PURE MAP over the corpus (no shuffle, no join); the codes column is the
ETL-persisted artifact. A query is: build LUT on the driver (tiny),
scan codes (m bytes/row, ~16× less bandwidth than float32), map to an
integer score, TakeOrdered k. Nothing in the pipeline shuffles.

Engine portability: LUT values and final scores are scaled to integers
(round(x·10^6)) so cross-engine sums are exact — the histsketch.py rule:
compare integers, never sums of rounded doubles. Argmin code selection
compares distances rounded to 6 dp with ties to the lowest code id.

Per spark-local-perf-findings: subvector slices are SELECTed into bound
columns before the per-codeword distance expressions close over them —
a higher-order lambda re-evaluates closed-over *expressions* per element,
so closing over ``F.slice(...)`` directly would recompute the slice
K times per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from msgvault_spark.functions.arrays import lit_double_array, lit_long_array

SCALE = 1_000_000  # 6-dp fixed point for cross-engine integer equality


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _l2sq_to_lit(sub: Column, codeword: list[float]) -> Column:
    """Squared L2 distance between a bound subvector column and a literal
    codeword, rounded for cross-engine argmin stability."""
    cw = lit_double_array(codeword)
    return F.round(
        F.aggregate(
            F.zip_with(sub, cw, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )


def collect_codebooks(
    embeddings: DataFrame,
    *,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """[subspace][code] -> codeword (d/m floats). Codewords are the
    subvector slices of the ``n_codes`` lowest-id vectors — K·d floats
    total, a driver-side constant (the k-means upgrade path trains these
    with the ivf.py collect-tiny-state loop; the shape is unchanged)."""
    rows = (
        embeddings.filter(F.col(id_col) < n_codes)
        .select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
        .orderBy("id")
        .collect()
    )
    if len(rows) < n_codes:
        raise ValueError(f"need {n_codes} seed vectors, found {len(rows)}")
    d = len(rows[0]["v"])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    return [
        [list(r["v"][j * sub : (j + 1) * sub]) for r in rows] for j in range(m)
    ]


def encode_pq(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code_1..code_m) — pure map, no shuffle; this is the ETL-time
    index build. Nearest codeword per subspace by squared L2, ties to the
    lowest code id (array_position returns the FIRST minimum)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    vec = _as_double(F.col(vec_col))
    # Stage 1: bind each subvector slice to a concrete column (see module
    # docstring — lambdas must close over attributes, not expressions).
    sliced = embeddings.select(
        F.col(id_col).alias("id"),
        *[F.slice(vec, j * sub + 1, sub).alias(f"sub_{j}") for j in range(m)],
    )
    code_cols = []
    for j in range(m):
        dists = F.array(
            *[_l2sq_to_lit(F.col(f"sub_{j}"), cw) for cw in codebooks[j]]
        )
        code_cols.append(
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias(f"code_{j}")
        )
    return sliced.select("id", *code_cols)


def adc_lut(
    codebooks: list[list[list[float]]], query_vector: list[float]
) -> list[list[int]]:
    """LUT[j][c] = round(<q_subj, codeword_jc> · 10^6) — integer inner
    products so candidate scores sum exactly in any engine."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    lut = []
    for j in range(m):
        q = query_vector[j * sub : (j + 1) * sub]
        lut.append(
            [
                int(round(sum(float(a) * float(b) for a, b in zip(q, cw)) * SCALE))
                for cw in codebooks[j]
            ]
        )
    return lut


def pq_search(
    codes: DataFrame,
    lut: list[list[int]],
    k: int = 10,
    *,
    exclude_id: int | None = None,
) -> DataFrame:
    """Top-k (id, qscore_scaled) by ADC over the codes table only — the
    float corpus is never scanned. qscore_scaled = Σ_j LUT[j][code_j],
    an exact integer (≈ dot(q, reconstruction) · 10^6)."""
    m = len(lut)
    score = None
    for j in range(m):
        tbl = lit_long_array(lut[j])
        term = F.element_at(tbl, F.col(f"code_{j}") + 1)
        score = term if score is None else score + term
    out = codes.select("id", score.alias("qscore_scaled"))
    if exclude_id is not None:
        out = out.filter(F.col("id") != exclude_id)
    return out.orderBy(F.col("qscore_scaled").desc(), F.col("id").asc()).limit(k)


def pq_knn(
    embeddings: DataFrame,
    seed_id: int,
    k: int = 10,
    *,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Find-similar (reference Q9 shape) end-to-end: codebooks + encode +
    ADC, seed row's vector as the query, seed excluded."""
    codebooks = collect_codebooks(
        embeddings, m=m, n_codes=n_codes, id_col=id_col, vec_col=vec_col
    )
    seed = (
        embeddings.filter(F.col(id_col) == seed_id)
        .select(_as_double(F.col(vec_col)).alias("v"))
        .head()
    )
    if seed is None:
        raise ValueError(f"seed vector {seed_id} not found")
    lut = adc_lut(codebooks, list(seed["v"]))
    codes = encode_pq(embeddings, codebooks, id_col=id_col, vec_col=vec_col)
    return pq_search(codes, lut, k, exclude_id=seed_id)


def _l2sq_sql(a: str, b: str) -> str:
    return (
        f"round(list_sum(list_transform(list_zip({a}, {b}), "
        "x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) "
        "* (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))), 6)"
    )


def _dot_scaled_sql(a: str, b: str) -> str:
    return (
        f"CAST(round(list_sum(list_transform(list_zip({a}, {b}), "
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) "
        f"* {SCALE}, 0) AS BIGINT)"
    )


def pq_oracle_sql(
    seed_id: int,
    k: int = 10,
    *,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
) -> str:
    """DuckDB replica of pq_knn: same codebooks (lowest-id rows), same
    rounded-L2 argmin encoding, same integer ADC scores."""
    sub = dim // m
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {seed_id}),
subs AS (SELECT CAST(j AS INT) AS j FROM range(0, {m}) t(j)),
cb AS (
    SELECT s.j, e.vec_id AS code,
           list_slice(e.embedding, s.j * {sub} + 1, (s.j + 1) * {sub}) AS cw
    FROM embeddings e CROSS JOIN subs s
    WHERE e.vec_id < {n_codes}
),
assigned AS (
    SELECT vec_id, j, code FROM (
        SELECT e.vec_id, c.j, c.code,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id, c.j
                   ORDER BY {_l2sq_sql(
                       f'list_slice(e.embedding, c.j * {sub} + 1, (c.j + 1) * {sub})',
                       'c.cw')} ASC, c.code ASC
               ) AS rn
        FROM embeddings e CROSS JOIN cb c
    ) WHERE rn = 1
),
lut AS (
    SELECT c.j, c.code,
           {_dot_scaled_sql(
               f'list_slice(q.qv, c.j * {sub} + 1, (c.j + 1) * {sub})',
               'c.cw')} AS val
    FROM cb c CROSS JOIN q
)
SELECT a.vec_id AS id, CAST(SUM(l.val) AS BIGINT) AS qscore_scaled
FROM assigned a
JOIN lut l ON l.j = a.j AND l.code = a.code
WHERE a.vec_id != {seed_id}
GROUP BY a.vec_id
ORDER BY qscore_scaled DESC, id ASC
LIMIT {k}
"""

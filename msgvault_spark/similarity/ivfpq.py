"""IVF-PQ: inverted-file cells × product-quantization codes with exact
re-ranking — the composed billion-scale ANN shape (FAISS's IndexIVFPQ;
Jégou et al. 2011 §V) built from the repo's two existing planes:

  - coarse quantizer (similarity/ivf.py): every vector assigned to its
    nearest of K deterministic centroids; a query probes ``nprobe`` cells,
    so only N·nprobe/K candidates are touched;
  - fine quantizer (similarity/pq.py): within the probed cells candidates
    are scored by integer ADC over m-byte codes — the float corpus is
    never scanned for candidate generation;
  - exact re-rank: the top ``rerank`` ADC candidates (a driver-tiny set)
    are joined back to the float vectors for exact cosine, which fixes
    PQ's quantization error where it matters — the top of the list.

Reference parity: the reference's vector search is exact brute-force over
float32 (wesm/msgvault internal/vector/store.go); IVF-PQ is the scale
extension beyond it, same as ivf.py/lsh.py/pq.py individually.

Scale shape (100 TB): the stored index is ONE table (cell, id, m int8
codes) — ~m bytes + key per vector, clustered by cell (bucketed lake
layout), so a query reads nprobe/K of an already-tiny table, maps it to
an integer score (no shuffle), TakeOrders ``rerank`` rows, and performs
one broadcast-semi fetch of ``rerank`` float vectors for the exact top-k.
Candidate generation cost: O(N·nprobe/K · m) byte-lookups; rerank cost:
O(rerank · d). Nothing shuffles; nothing scans floats but the final
``rerank``-row fetch.

Determinism (the oracle replays everything bit-for-bit): centroids and
codebooks are the lowest-id rows (ivf.py/pq.py seed rule), cell and code
argmins compare 6-dp-rounded values with ties to the lowest id, ADC
scores are 10^6-scaled integers, and both top-k boundaries order by
(score DESC, id ASC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from msgvault_spark.functions.arrays import lit_double_array
from msgvault_spark.similarity.ivf import _cos_sql, assign_cells, seed_centroids
from msgvault_spark.similarity.knn import _as_double, cosine
from msgvault_spark.similarity.pq import (
    _dot_scaled_sql,
    _l2sq_sql,
    adc_lut,
    encode_pq,
)


def build_ivfpq_index(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cell, id, code_0..code_{m-1}) — the one stored table. Cell
    assignment and PQ encode are both broadcast-free pure maps over the
    corpus, joined on id (ETL-time, persisted; at lake scale this table
    is written bucketed by cell)."""
    cents = seed_centroids(
        embeddings, n_cells, id_col=id_col, vec_col=vec_col
    )
    cells = assign_cells(
        embeddings, cents, id_col=id_col, vec_col=vec_col
    ).select("id", "cell")
    codes = encode_pq(embeddings, codebooks, id_col=id_col, vec_col=vec_col)
    return cells.join(codes, "id")


def ivfpq_search(
    index: DataFrame,
    codebooks: list[list[list[float]]],
    embeddings: DataFrame,
    query_vector: list[float],
    k: int = 10,
    *,
    rerank: int = 30,
    n_cells: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    exclude_id: int | None = None,
) -> DataFrame:
    """Top-k (id, score): probe → ADC top-``rerank`` → exact cosine top-k.

    ``score`` is the EXACT cosine (rounded), not the ADC estimate — the
    rerank step's whole point; the approximation shows only as which
    candidates made the rerank pool."""
    qcol = lit_double_array(query_vector)
    probe = (
        seed_centroids(embeddings, n_cells, id_col=id_col, vec_col=vec_col)
        .select(
            F.col("cid").alias("cell"),
            F.round(cosine(F.col("cvec"), qcol), round_to).alias("qscore"),
        )
        .orderBy(F.col("qscore").desc(), F.col("cell").asc())
        .limit(nprobe)
        .select("cell")
    )
    lut = adc_lut(codebooks, [float(v) for v in query_vector])
    m = len(lut)
    from msgvault_spark.functions.arrays import lit_long_array

    adc = None
    for j in range(m):
        term = F.element_at(lit_long_array(lut[j]), F.col(f"code_{j}") + 1)
        adc = term if adc is None else adc + term
    cand = index.join(F.broadcast(probe), "cell").select(
        "id", adc.alias("qscore_scaled")
    )
    if exclude_id is not None:
        cand = cand.filter(F.col("id") != exclude_id)
    cand = cand.orderBy(
        F.col("qscore_scaled").desc(), F.col("id").asc()
    ).limit(rerank)
    # exact re-rank: fetch the rerank-row candidates' float vectors via a
    # broadcast hash join (one corpus scan, no shuffle) and rescore
    return (
        embeddings.select(
            F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
        )
        .join(F.broadcast(cand.select("id")), "id")
        .select(
            "id", F.round(cosine(F.col("v"), qcol), round_to).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def ivfpq_knn_join(
    spark,
    index: DataFrame,
    codebooks: list[list[list[float]]],
    embeddings: DataFrame,
    qset: DataFrame,
    *,
    k: int = 10,
    rerank: int = 30,
    n_cells: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Batch IVF-PQ: (qid, id) top-k per query in ``qset`` — the eval-set
    sibling of ivfpq_search (the recall harness runs Q queries at once).

    The per-query ADC LUT becomes a (qid, j, code, val) frame: Q·m·K rows
    (20·4·16 = 1280 — broadcast), computed JVM-side with the same
    round(dot·10^6) integers the driver-side adc_lut produces. Candidates
    unpivot their m code columns and join the LUT, so scoring is one
    broadcast join + sum — no Python, no per-query plan."""
    from pyspark.sql import Row

    from msgvault_spark.similarity.pq import SCALE

    m = len(codebooks)
    sub = len(codebooks[0][0])
    q = qset.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    )
    cents = seed_centroids(embeddings, n_cells, id_col=id_col, vec_col=vec_col)
    probes = (
        q.join(F.broadcast(cents))
        .withColumn(
            "pscore", F.round(cosine(F.col("qv"), F.col("cvec")), round_to)
        )
        .withColumn(
            "rn",
            F.row_number().over(
                _qwin(F.col("pscore").desc(), F.col("cid").asc())
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("qid", F.col("cid").alias("cell"))
    )
    cb_rows = [
        Row(j=j, code=c, cw=[float(x) for x in codebooks[j][c]])
        for j in range(m)
        for c in range(len(codebooks[j]))
    ]
    cb_df = spark.createDataFrame(cb_rows, "j int, code int, cw array<double>")
    lut = (
        q.join(F.broadcast(cb_df))
        .select(
            "qid", "j", "code",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.slice(F.col("qv"), F.col("j") * sub + 1, sub),
                        F.col("cw"),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                * SCALE
            ).cast("long").alias("val"),
        )
    )
    code_structs = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("j"),
                F.col(f"code_{j}").alias("code"),
            )
            for j in range(m)
        ]
    )
    cand = (
        index.join(F.broadcast(probes), "cell")
        .filter(F.col("id") != F.col("qid"))
        .select("qid", "id", F.explode(code_structs).alias("jc"))
        .select("qid", "id", F.col("jc.j").alias("j"), F.col("jc.code").alias("code"))
        .join(F.broadcast(lut), ["qid", "j", "code"])
        .groupBy("qid", "id")
        .agg(F.sum("val").alias("qscore_scaled"))
        .withColumn(
            "rn",
            F.row_number().over(
                _qwin(F.col("qscore_scaled").desc(), F.col("id").asc())
            ),
        )
        .filter(F.col("rn") <= rerank)
        .select("qid", "id")
    )
    return (
        embeddings.select(
            F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
        )
        .join(F.broadcast(cand), "id")
        .join(F.broadcast(q), "qid")
        .select(
            "qid", "id",
            F.round(cosine(F.col("v"), F.col("qv")), round_to).alias("score"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                _qwin(F.col("score").desc(), F.col("id").asc())
            ),
        )
        .filter(F.col("rn") <= k)
        .select("qid", "id")
    )


def _qwin(*order):
    from pyspark.sql import Window

    return Window.partitionBy("qid").orderBy(*order)


def ivfpq_oracle_sql(
    seed_id: int,
    k: int = 10,
    *,
    rerank: int = 30,
    n_cells: int = 8,
    nprobe: int = 2,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
) -> str:
    """DuckDB replica of build_ivfpq_index + ivfpq_search with a stored
    row's vector as the query (find-similar shape, Q9): same seed
    centroids, same codebooks, same rounded argmins, same integer ADC,
    same (score DESC, id ASC) boundaries."""
    sub = dim // m
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {seed_id}),
cents AS (
    SELECT vec_id AS cid, embedding AS cvec FROM embeddings
    WHERE vec_id < {n_cells}
),
probes AS (
    SELECT cid AS cell FROM (
        SELECT c.cid,
               ROW_NUMBER() OVER (
                   ORDER BY {_cos_sql('c.cvec', 'q.qv')} DESC, c.cid ASC
               ) AS rn
        FROM cents c CROSS JOIN q
    ) WHERE rn <= {nprobe}
),
assigned_cell AS (
    SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_cos_sql('e.embedding', 'c.cvec')} DESC, c.cid ASC
               ) AS rn
        FROM embeddings e CROSS JOIN cents c
    ) WHERE rn = 1
),
subs AS (SELECT CAST(j AS INT) AS j FROM range(0, {m}) t(j)),
cb AS (
    SELECT s.j, e.vec_id AS code,
           list_slice(e.embedding, s.j * {sub} + 1, (s.j + 1) * {sub}) AS cw
    FROM embeddings e CROSS JOIN subs s
    WHERE e.vec_id < {n_codes}
),
assigned_code AS (
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
),
cand AS (
    SELECT a.vec_id AS id,
           CAST(SUM(l.val) AS BIGINT) AS qscore_scaled
    FROM assigned_code a
    JOIN assigned_cell ac ON ac.vec_id = a.vec_id
    JOIN probes p ON p.cell = ac.cid
    JOIN lut l ON l.j = a.j AND l.code = a.code
    WHERE a.vec_id != {seed_id}
    GROUP BY a.vec_id
    ORDER BY qscore_scaled DESC, id ASC
    LIMIT {rerank}
)
SELECT c.id, {_cos_sql('e.embedding', 'q.qv')} AS score
FROM cand c
JOIN embeddings e ON e.vec_id = c.id
CROSS JOIN q
ORDER BY score DESC, id ASC
LIMIT {k}
"""

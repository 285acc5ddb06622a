"""IVF (inverted-file) approximate nearest-neighbor search.

The second scale path for Q7 next to random-hyperplane LSH (lsh.py):

  - coarse quantizer: K centroid vectors. Production would k-means them; here
    they are K deterministic data points (the lowest ids) — a valid IVF-flat
    initialization that keeps the whole index reproducible in any engine,
    which is what lets the DuckDB oracle replay it exactly.
  - build: every vector is assigned to its nearest centroid (argmax cosine,
    ties → lowest centroid id). With K centroids broadcast, assignment is one
    map stage over the corpus — no shuffle; the index is the corpus
    repartitioned/bucketed by cell id.
  - search: score query ↔ centroids, probe the top ``nprobe`` cells, exact
    cosine rerank only those cells' members. Scan cost drops from O(N·d) to
    O(N·nprobe/K·d) at the recall cost standard for IVF.

Scores are rounded BEFORE every argmax/top-k comparison so Spark's
sequential JVM fold and DuckDB's list_sum agree on orderings bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from msgvault_spark.functions.arrays import lit_double_array

from msgvault_spark.similarity.knn import _as_double, cosine


def seed_centroids(
    embeddings: DataFrame,
    n_cells: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cid, cvec) — the coarse-quantizer seed rule (lowest-id rows, cast
    double). ONE source of truth: probe-side callers must derive
    centroids with the same rule the index build used, or probe
    assignment silently disagrees with cell assignment."""
    return embeddings.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cid"), _as_double(F.col(vec_col)).alias("cvec")
    )


def assign_cells(
    embeddings: DataFrame,
    cents: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """(id, vec, cell) — nearest-centroid assignment against an arbitrary
    (cid, cvec) frame: argmax rounded cosine, ties → lowest cell id.
    One broadcast join fans each vector out K ways; the rn=1 window
    shuffles by vector id once (K rows per key — uniform by
    construction)."""
    scored = (
        embeddings.select(
            F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec")
        )
        .join(F.broadcast(cents))
        .withColumn(
            "cscore", F.round(cosine(F.col("vec"), F.col("cvec")), round_to)
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("cscore").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", "vec", F.col("cid").alias("cell"))
    )


def build_ivf_index(
    embeddings: DataFrame,
    *,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """(id, vec, cell) — the corpus with cell assignments. Persist/bucket by
    ``cell`` at ETL time; centroids are rows with id < n_cells."""
    cents = seed_centroids(embeddings, n_cells, id_col=id_col, vec_col=vec_col)
    return assign_cells(
        embeddings, cents, id_col=id_col, vec_col=vec_col, round_to=round_to
    )


def ivf_search(
    index: DataFrame,
    embeddings: DataFrame,
    query_vector: list[float],
    k: int = 10,
    *,
    n_cells: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    exclude_id: int | None = None,
) -> DataFrame:
    """Top-k (id, score) probing the query's ``nprobe`` nearest cells."""
    qcol = lit_double_array(query_vector)
    probe = (
        embeddings.filter(F.col(id_col) < n_cells)
        .select(
            F.col(id_col).alias("cell"),
            F.round(
                cosine(_as_double(F.col(vec_col)), qcol), round_to
            ).alias("qscore"),
        )
        .orderBy(F.col("qscore").desc(), F.col("cell").asc())
        .limit(nprobe)
        .select("cell")
    )
    out = (
        index.join(F.broadcast(probe), "cell")
        .select(
            "id", F.round(cosine(F.col("vec"), qcol), round_to).alias("score")
        )
    )
    if exclude_id is not None:
        out = out.filter(F.col("id") != exclude_id)
    return out.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)


def _cos_sql(a: str, b: str) -> str:
    return (
        f"round(list_sum(list_transform(list_zip({a}, {b}), "
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / "
        f"(sqrt(list_sum(list_transform({a}, v -> CAST(v AS DOUBLE) * "
        "CAST(v AS DOUBLE)))) * "
        f"sqrt(list_sum(list_transform({b}, v -> CAST(v AS DOUBLE) * "
        "CAST(v AS DOUBLE))))), 6)"
    )


def ivf_oracle_sql(
    seed_id: int,
    k: int = 10,
    *,
    n_cells: int = 8,
    nprobe: int = 2,
) -> str:
    """DuckDB replica of build_ivf_index + ivf_search with a stored row's
    embedding as the query (find-similar shape, Q9)."""
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {seed_id}),
cents AS (
    SELECT vec_id AS cid, embedding AS cvec FROM embeddings
    WHERE vec_id < {n_cells}
),
assigned AS (
    SELECT vec_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_cos_sql('e.embedding', 'c.cvec')} DESC, c.cid ASC
               ) AS rn
        FROM embeddings e CROSS JOIN cents c
    ) WHERE rn = 1
),
probes AS (
    SELECT cid AS cell FROM (
        SELECT c.cid,
               ROW_NUMBER() OVER (
                   ORDER BY {_cos_sql('c.cvec', 'q.qv')} DESC, c.cid ASC
               ) AS rn
        FROM cents c CROSS JOIN q
    ) WHERE rn <= {nprobe}
)
SELECT a.vec_id AS id, {_cos_sql('a.embedding', 'q.qv')} AS score
FROM assigned a
JOIN probes p ON p.cell = a.cid
CROSS JOIN q
WHERE a.vec_id != {seed_id}
ORDER BY score DESC, id ASC
LIMIT {k}
"""


def train_centroids_kmeans(
    embeddings: DataFrame,
    *,
    n_cells: int = 8,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means over DataFrames — the production coarse quantizer
    (build_ivf_index's lowest-id init is the reproducible-oracle variant;
    k-means cells balance real clusters, cutting probe fan-out for a given
    recall).

    Each round: broadcast the K centroids, assign every vector to its
    nearest (one map stage, no shuffle), then re-average per cell — one
    narrow shuffle of d-dim partial sums, map-side combined. Deterministic:
    init = lowest-id vectors, cosine ties break to lowest cell id, and the
    elementwise mean is order-insensitive (sum of doubles per dimension via
    aggregate over posexplode — associativity loss is below the argmax
    rounding). Empty cells keep their previous centroid.

    Returns (cid, cvec) like build_ivf_index's centroid frame.

    Lineage discipline: K centroids are tiny (K·d doubles), so each round
    collects them and rebuilds a literal frame. Chaining rounds as
    DataFrame lineage instead makes the logical plan grow per iteration
    until Catalyst's own plan handling OOMs — for iterative algorithms,
    collect small state / checkpoint big state every round."""
    spark = embeddings.sparkSession
    corpus = embeddings.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec")
    ).persist()
    cent_rows = [
        (int(r["id"]), list(r["vec"]))
        for r in corpus.filter(F.col("id") < n_cells)
        .select("id", "vec")
        .collect()
    ]

    w = Window.partitionBy("id").orderBy(
        F.col("cscore").desc(), F.col("cid").asc()
    )
    for _ in range(n_iter):
        cents = spark.createDataFrame(
            cent_rows, "cid long, cvec array<double>"
        )
        assigned = (
            corpus.join(F.broadcast(cents))
            .withColumn("cscore", F.round(cosine(F.col("vec"), F.col("cvec")), 6))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", "vec", "cid")
        )
        # per-cell elementwise mean: posexplode -> (cell, pos) partial avgs
        means = {
            int(r["cid"]): [s["m"] for s in r["pm"]]
            for r in assigned.select(
                "cid", F.posexplode("vec").alias("pos", "x")
            )
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("m")))
                ).alias("pm")
            )
            .collect()
        }
        # empty cells keep their previous centroid
        cent_rows = [
            (cid, means.get(cid, old)) for cid, old in cent_rows
        ]

    corpus.unpersist()
    return spark.createDataFrame(cent_rows, "cid long, cvec array<double>")


def ivf_knn_join(
    index: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Batch IVF retrieval: (qid, id, score) of the k nearest cell-probed
    corpus rows for EVERY query row in one distributed job — the IVF
    sibling of knnjoin.knn_join (LSH). ``centroids`` = (cid, cvec) rows
    (build_ivf_index's quantizer inputs); each query broadcasts with its
    ``nprobe`` nearest cells, the cell equi-join bounds candidates to the
    probed cells' members, exact cosine reranks, and the per-query top-k
    window sees only cell-bounded candidate lists — never the corpus."""
    q = queries.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qvec")
    )
    qcells = (
        q.join(F.broadcast(centroids))
        .withColumn(
            "qscore", F.round(cosine(F.col("qvec"), F.col("cvec")), round_to)
        )
    )
    wp = Window.partitionBy("qid").orderBy(
        F.col("qscore").desc(), F.col("cid").asc()
    )
    probes = (
        qcells.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= nprobe)
        .select("qid", "qvec", F.col("cid").alias("cell"))
    )
    cands = (
        index.join(F.broadcast(probes), "cell")
        .filter(F.col("id") != F.col("qid"))
        .select(
            "qid",
            "id",
            F.round(cosine(F.col("vec"), F.col("qvec")), round_to).alias("score"),
        )
    )
    wk = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("id").asc())
    return (
        cands.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select("qid", "id", "score")
    )


def kmeans_cells_oracle_sql(*, n_cells: int = 8, n_iter: int = 2) -> str:
    """DuckDB replica of train_centroids_kmeans + a final assign_cells
    pass, reduced to per-cell integer stats.  Lloyd rounds are UNROLLED
    as CTE pairs (assignment → per-dimension mean); the assignment rule
    is the shared rounded-cosine argmax (ties → lowest cid), so both
    engines make identical discrete choices and the final member counts
    are exact integers.  Empty cells keep their previous centroid
    (LEFT JOIN + COALESCE, mirroring the Spark dict fallback)."""
    parts = [
        f"""
WITH dims AS (
    SELECT unnest(generate_series(1,
        (SELECT max(len(embedding)) FROM embeddings))) AS pos
),
v AS (
    SELECT vec_id AS id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
    FROM embeddings
),
c0 AS (SELECT id AS cid, vec AS cvec FROM v WHERE id < {n_cells})"""
    ]
    for i in range(1, n_iter + 1):
        cos = _cos_sql("v.vec", "c.cvec")
        parts.append(
            f""",
a{i} AS (
    SELECT id, cid FROM (
        SELECT v.id, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY v.id ORDER BY {cos} DESC, c.cid ASC
               ) AS rn
        FROM v CROSS JOIN c{i - 1} c
    ) WHERE rn = 1
),
m{i} AS (
    SELECT a.cid, d.pos, avg(v.vec[d.pos]) AS m
    FROM a{i} a JOIN v ON v.id = a.id CROSS JOIN dims d
    GROUP BY 1, 2
),
c{i} AS (
    SELECT p.cid, COALESCE(g.nv, p.cvec) AS cvec
    FROM c{i - 1} p LEFT JOIN (
        SELECT cid, list(m ORDER BY pos) AS nv FROM m{i} GROUP BY cid
    ) g USING (cid)
)"""
        )
    cos_final = _cos_sql("v.vec", "c.cvec")
    parts.append(
        f""",
afinal AS (
    SELECT id, cid FROM (
        SELECT v.id, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY v.id ORDER BY {cos_final} DESC, c.cid ASC
               ) AS rn
        FROM v CROSS JOIN c{n_iter} c
    ) WHERE rn = 1
)
SELECT cid,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MIN(id) AS BIGINT) AS min_id,
       CAST(MAX(id) AS BIGINT) AS max_id
FROM afinal GROUP BY cid ORDER BY cid"""
    )
    return "".join(parts)

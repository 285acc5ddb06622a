"""Multimodal + ANN catalog entries. Registered on import by catalog.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from msgvault_spark.catalog import register
from msgvault_spark.operators.present import present_sorted
from msgvault_spark.multimodal.binary_ops import (
    decode_media,
    extract_features,
    payload_stats,
    synthesize_media,
)
from msgvault_spark.similarity.lsh import build_ann_index, ann_search, plane_coeff
from msgvault_spark.sources.cache import get_table as load_table

_DIM = 64
_BANDS = 2
_PLANES = 6


def _bucket_sql(vec_expr: str, band: int) -> str:
    """DuckDB band-key expression mirroring similarity.lsh.band_key: same
    coefficients (literals), same left-to-right addition order."""
    bits = []
    for p in range(_PLANES):
        terms = " + ".join(
            f"({plane_coeff(band, p, d)!r} * CAST({vec_expr}[{d + 1}] AS DOUBLE))"
            for d in range(_DIM)
        )
        bits.append(f"(CASE WHEN ({terms}) >= 0 THEN '1' ELSE '0' END)")
    return f"'{band}:' || " + " || ".join(bits)


def _ann_oracle() -> str:
    keys_all = ", ".join(_bucket_sql("embedding", b) for b in range(_BANDS))
    return f"""
WITH keys AS (
    SELECT vec_id, embedding, [{keys_all}] AS ks FROM embeddings
),
qk AS (SELECT ks AS qks, embedding AS qv FROM keys WHERE vec_id = 0),
cand AS (
    SELECT DISTINCT k.vec_id, k.embedding
    FROM keys k, qk
    WHERE len(list_intersect(k.ks, qk.qks)) > 0
)
SELECT c.vec_id AS id,
  round(
    list_sum(list_transform(list_zip(c.embedding, qk.qv),
             x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(c.embedding,
             v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) *
       sqrt(list_sum(list_transform(qk.qv,
             v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))), 6) AS score
FROM cand c, qk
ORDER BY score DESC, id ASC
LIMIT 10
"""


@register("ann_lsh_seed0", _ann_oracle())
def ann_lsh_seed0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-band hyperplane-LSH ANN: candidate buckets → exact rerank
    (the scale path of Q7; deterministic md5-derived planes)."""
    emb = load_table(spark, sf_dir, "embeddings")
    seed = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    index = build_ann_index(
        emb, dim=_DIM, bands=_BANDS, planes_per_band=_PLANES
    )
    return ann_search(
        index,
        [float(x) for x in seed],
        k=10,
        bands=_BANDS,
        planes_per_band=_PLANES,
        round_to=6,
    )


_MEDIA_SQL = r"""
media AS (
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 2 THEN 'audio' ELSE 'image' END AS kind,
           (CASE WHEN doc_id % 3 = 0
                 THEN '\x89\x50\x4E\x47\x0D\x0A\x1A\x0A'::BLOB
                 WHEN doc_id % 3 = 1 THEN '\xFF\xD8\xFF\xE0'::BLOB
                 ELSE '\x49\x44\x33\x04\x00\x00'::BLOB END)
           || encode(text) AS payload
    FROM documents
)
"""


@register(
    "media_payload_stats",
    f"""
WITH {_MEDIA_SQL}
SELECT media_id, kind,
       octet_length(payload) AS payload_bytes,
       sha256(hex(payload)) AS content_hash,
       CASE WHEN substring(hex(payload), 1, 8) = '89504E47' THEN 'image/png'
            WHEN substring(hex(payload), 1, 6) = 'FFD8FF' THEN 'image/jpeg'
            WHEN substring(hex(payload), 1, 8) = '47494638' THEN 'image/gif'
            WHEN substring(hex(payload), 1, 6) = '494433' THEN 'audio/mpeg'
            WHEN substring(hex(payload), 1, 8) = '1A45DFA3' THEN 'video/webm'
            ELSE 'application/octet-stream' END AS mime_sniffed
FROM media
ORDER BY media_id
""",
)
def media_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: payload length, content-addressing hash,
    magic-byte MIME sniffing — all JVM-side over binary columns."""
    docs = load_table(spark, sf_dir, "documents")
    return payload_stats(synthesize_media(docs)).sortWithinPartitions("media_id")


@register(
    "media_features_entropy",
    f"""
WITH {_MEDIA_SQL},
bytes AS (
    SELECT media_id,
           unnest(list_transform(range(octet_length(payload)),
                  i -> substring(hex(payload), i * 2 + 1, 2))) AS byte_hex
    FROM media
)
SELECT media_id,
       CAST(COUNT(*) AS BIGINT) AS payload_bytes,
       round(entropy(byte_hex), 6) AS byte_entropy,
       round(SUM(CASE WHEN byte_hex >= '20' AND byte_hex <= '7E'
                      THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS ascii_ratio,
       round(SUM(CASE WHEN byte_hex = '00' THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS null_ratio
FROM bytes
GROUP BY media_id
ORDER BY media_id
""",
)
def media_features_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched binary feature extraction (byte entropy, ascii/null
    ratios) via mapInPandas — the real decode-stage shape. Oracle: DuckDB
    unnests the hex encoding into per-byte rows; its ``entropy()``
    aggregate IS log2 Shannon entropy (bit-identical to the numpy
    histogram formulation — verified); fixed-width uppercase hex compares
    lexicographically == numerically, so the ascii range test stays a
    string compare. Floats rounded to 6 on both sides (sum-order ulp
    noise sits ~3 orders of magnitude below the rounding grain)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(synthesize_media(docs))
    return feats.select(
        "media_id",
        "payload_bytes",
        F.round("byte_entropy", 6).alias("byte_entropy"),
        F.round("ascii_ratio", 6).alias("ascii_ratio"),
        F.round("null_ratio", 6).alias("null_ratio"),
    ).sortWithinPartitions("media_id")


_HEXVAL = "(strpos('0123456789abcdef', substring(h, {i}, 1)) - 1)"


@register(
    "media_decode_fake",
    f"""
WITH {_MEDIA_SQL},
hashed AS (
    SELECT media_id, sha256(hex(payload)) AS h FROM media
)
SELECT media_id,
       CAST(64 + {_HEXVAL.format(i=1)} * 16 + {_HEXVAL.format(i=2)} AS INTEGER)
           AS width,
       CAST(64 + {_HEXVAL.format(i=3)} * 16 + {_HEXVAL.format(i=4)} AS INTEGER)
           AS height,
       CAST(1 + {_HEXVAL.format(i=5)} AS INTEGER) AS n_frames,
       substring(h, 1, 16) AS pixels_sha
FROM hashed
ORDER BY media_id
""",
)
def media_decode_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode stub driven through the deterministic-fake path: proves the
    mapInPandas plumbing (schema, batching) without image libs. The fake
    derives dims from sha256 of the payload's hex encoding, so DuckDB
    replays it exactly — no more rows-only check on this entry."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(
        synthesize_media(docs), deterministic_fake=True
    ).sortWithinPartitions("media_id")


def _decoded_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted decode-metadata artifact (media_id, width, height,
    n_frames, pixels_sha): the ingest-time product every plan-side media
    op consumes — decode once, plan many."""
    from msgvault_spark.sources.cache import get_artifact

    return get_artifact(
        spark,
        (sf_dir, "media_decoded_fake"),
        lambda: decode_media(
            synthesize_media(load_table(spark, sf_dir, "documents")),
            deterministic_fake=True,
        ),
    )


_FAKE_DIMS_SQL = f"""
hashed AS (
    SELECT media_id, sha256(hex(payload)) AS h FROM media
),
dims AS (
    SELECT media_id,
           CAST(64 + {_HEXVAL.format(i=1)} * 16 + {_HEXVAL.format(i=2)}
                AS INTEGER) AS width,
           CAST(64 + {_HEXVAL.format(i=3)} * 16 + {_HEXVAL.format(i=4)}
                AS INTEGER) AS height,
           CAST(1 + {_HEXVAL.format(i=5)} AS INTEGER) AS n_frames
    FROM hashed
)
"""


@register(
    "media_resize_plan",
    f"""
WITH {_MEDIA_SQL},
{_FAKE_DIMS_SQL},
scaled AS (
    SELECT media_id, width, height,
           CASE WHEN greatest(width, height) > 224
                THEN 224 / greatest(width, height)
                ELSE 1.0 END AS s
    FROM dims
)
SELECT media_id, width, height,
       CAST(floor(width * s + 0.5) AS INTEGER) AS target_w,
       CAST(floor(height * s + 0.5) AS INTEGER) AS target_h,
       CAST(floor(s * 1000000) AS BIGINT) AS scale_ppm
FROM scaled
ORDER BY media_id
""",
)
def media_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning over decode metadata: aspect-preserving target dims
    with the long side clamped to 224 (the vision-encoder preprocessing
    contract). Pure JVM arithmetic over the PERSISTED decode-metadata
    artifact (a real pipeline decodes once at ingest and plans many —
    the Arrow decode itself stays live in media_decode_fake);
    multimodal/binary_ops.resize_plan."""
    from msgvault_spark.multimodal.binary_ops import resize_plan

    return resize_plan(_decoded_media(spark, sf_dir)).sortWithinPartitions(
        "media_id"
    )


@register(
    "media_frame_sample",
    f"""
WITH {_MEDIA_SQL},
{_FAKE_DIMS_SQL},
strided AS (
    SELECT media_id, n_frames,
           greatest(1, n_frames // 4) AS stride
    FROM dims
),
p AS (SELECT unnest([0, 1, 2, 3]) AS frame_pos)
SELECT s.media_id, s.n_frames,
       CAST(p.frame_pos AS INTEGER) AS frame_pos,
       CAST(p.frame_pos * s.stride AS INTEGER) AS frame_idx
FROM strided s, p
WHERE p.frame_pos <= (s.n_frames - 1) // s.stride AND p.frame_pos < 4
ORDER BY media_id, frame_pos
""",
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-stride frame sampling plan from decoded n_frames metadata:
    which ≤4 frame indexes a real decoder would extract per media item
    (multimodal/binary_ops.sample_frames) — JVM sequence+posexplode over
    the persisted decode-metadata artifact, no Python in the fan-out."""
    from msgvault_spark.multimodal.binary_ops import sample_frames

    return sample_frames(
        _decoded_media(spark, sf_dir), n_samples=4
    ).sortWithinPartitions("media_id", "frame_pos")


# ---------------------------------------------------------------------------
# Batch KNN join (round 2): top-k neighbors for every query vector at once
# ---------------------------------------------------------------------------

_NQ = 20  # query set: vec_id < 20
_KJ = 5


def _knn_join_oracle() -> str:
    keys_all = ", ".join(_bucket_sql("embedding", b) for b in range(_BANDS))
    cos = (
        "round(list_sum(list_transform(list_zip(c.embedding, c.qv), "
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) "
        "/ (sqrt(list_sum(list_transform(c.embedding, "
        "v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) * "
        "sqrt(list_sum(list_transform(c.qv, "
        "v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))), 6)"
    )
    return f"""
WITH keys AS (
    SELECT vec_id, embedding, [{keys_all}] AS ks FROM embeddings
),
q AS (SELECT vec_id AS qid, embedding AS qv, ks AS qks
      FROM keys WHERE vec_id < {_NQ}),
cand AS (
    SELECT DISTINCT q.qid, q.qv, k.vec_id AS id, k.embedding
    FROM keys k, q
    WHERE len(list_intersect(k.ks, q.qks)) > 0 AND k.vec_id != q.qid
)
SELECT qid, id, score FROM (
    SELECT c.qid, c.id, {cos} AS score,
           ROW_NUMBER() OVER (
               PARTITION BY c.qid
               ORDER BY {cos} DESC, c.id ASC
           ) AS rn
    FROM cand c
) WHERE rn <= {_KJ}
"""


@register("knn_join_batch", _knn_join_oracle())
def knn_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch KNN join (similarity/knnjoin.py): 5 nearest neighbors for
    each of the 20 lowest-id vectors in ONE distributed job — broadcast
    bucket join + exact rerank + per-query top-k window; never a
    per-query driver loop."""
    from msgvault_spark.similarity.knnjoin import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_join(
        emb,
        emb.filter(F.col("vec_id") < _NQ),
        k=_KJ,
        dim=_DIM,
        bands=_BANDS,
        planes_per_band=_PLANES,
    )


_RK = 10  # recall@k


def _exact_gt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized exact ground truth for the recall harness: top-_RK exact
    cosine neighbors of the _NQ-seed eval set (two-level top-k, no
    corpus-sized window partition). Four recall reports (LSH/IVF/SQ8/PQ)
    compare against this one persisted frame instead of each re-running
    the Q×N brute-force scan."""
    from msgvault_spark.similarity.knnjoin import exact_knn_join
    from msgvault_spark.sources.cache import get_artifact

    return get_artifact(
        spark,
        (sf_dir, f"ann_exact_gt_{_NQ}_{_RK}"),
        lambda: exact_knn_join(
            load_table(spark, sf_dir, "embeddings"),
            load_table(spark, sf_dir, "embeddings").filter(
                F.col("vec_id") < _NQ
            ),
            k=_RK,
        ),
    )


def _recall_output(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """(qid, matched, k, recall) from a ground-truth (qid, id) frame and
    an approximate (qid, id, hit=1) frame — the shared tail of every
    recall report."""
    return (
        exact.select("qid", "id")
        .join(approx, ["qid", "id"], "left")
        .groupBy("qid")
        .agg(
            F.count("hit").cast("long").alias("matched"),
            F.count(F.lit(1)).cast("long").alias("k"),
            (F.count("hit").cast("double") / F.count(F.lit(1))).alias("recall"),
        )
        .transform(present_sorted, "qid")
    )


def _ann_recall_oracle() -> str:
    keys_all = ", ".join(_bucket_sql("embedding", b) for b in range(_BANDS))

    def cos(emb: str, qv: str) -> str:
        return (
            f"round(list_sum(list_transform(list_zip({emb}, {qv}), "
            "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) "
            f"/ (sqrt(list_sum(list_transform({emb}, "
            "v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) * "
            f"sqrt(list_sum(list_transform({qv}, "
            "v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))), 6)"
        )

    return f"""
WITH keys AS (
    SELECT vec_id, embedding, [{keys_all}] AS ks FROM embeddings
),
q AS (SELECT vec_id AS qid, embedding AS qv, ks AS qks
      FROM keys WHERE vec_id < {_NQ}),
cand AS (
    SELECT DISTINCT q.qid, q.qv, k.vec_id AS id, k.embedding
    FROM keys k, q
    WHERE len(list_intersect(k.ks, q.qks)) > 0 AND k.vec_id != q.qid
),
approx AS (
    SELECT qid, id FROM (
        SELECT c.qid, c.id,
               ROW_NUMBER() OVER (
                   PARTITION BY c.qid
                   ORDER BY {cos('c.embedding', 'c.qv')} DESC, c.id ASC
               ) AS rn
        FROM cand c
    ) WHERE rn <= {_RK}
),
exact AS (
    SELECT qid, id FROM (
        SELECT q.qid, e.vec_id AS id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY {cos('e.embedding', 'q.qv')} DESC, e.vec_id ASC
               ) AS rn
        FROM embeddings e, q
        WHERE e.vec_id != q.qid
    ) WHERE rn <= {_RK}
)
SELECT x.qid,
       CAST(COUNT(a.id) AS BIGINT) AS matched,
       CAST(COUNT(*) AS BIGINT) AS k,
       CAST(COUNT(a.id) AS DOUBLE) / COUNT(*) AS recall
FROM exact x LEFT JOIN approx a ON a.qid = x.qid AND a.id = x.id
GROUP BY x.qid
ORDER BY x.qid
"""


@register("ann_recall_report", _ann_recall_oracle())
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@10 of the LSH-bucketed path against
    exact brute-force ground truth, per seed query — the standard index-
    tuning diagnostic (band/plane counts trade recall for candidate-set
    size) a 100 TB vector pipeline runs on a sampled eval set before
    trusting the approximate path. Exact side is the two-level
    distributed top-k (similarity/knnjoin.exact_knn_join — no corpus-
    sized window partition); approximate side shares the serving path's
    deterministic banding, so the report measures exactly what serving
    does."""
    from msgvault_spark.similarity.knnjoin import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    qset = emb.filter(F.col("vec_id") < _NQ)
    approx = knn_join(
        emb, qset, k=_RK, dim=_DIM, bands=_BANDS, planes_per_band=_PLANES
    ).select("qid", "id", F.lit(1).alias("hit"))
    return _recall_output(_exact_gt(spark, sf_dir), approx)


_IVF_CELLS = 8
_IVF_PROBE = 2


def _ivf_recall_oracle() -> str:
    from msgvault_spark.similarity.ivf import _cos_sql

    return f"""
WITH cents AS (
    SELECT vec_id AS cid, embedding AS cvec FROM embeddings
    WHERE vec_id < {_IVF_CELLS}
),
assigned AS (
    SELECT id, vec, cell FROM (
        SELECT e.vec_id AS id, e.embedding AS vec, c.cid AS cell,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_cos_sql('e.embedding', 'c.cvec')} DESC,
                            c.cid ASC
               ) AS rn
        FROM embeddings e, cents c
    ) WHERE rn = 1
),
q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
      WHERE vec_id < {_NQ}),
probes AS (
    SELECT qid, qv, cell FROM (
        SELECT q.qid, q.qv, c.cid AS cell,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY {_cos_sql('q.qv', 'c.cvec')} DESC, c.cid ASC
               ) AS rn
        FROM q, cents c
    ) WHERE rn <= {_IVF_PROBE}
),
approx AS (
    SELECT qid, id FROM (
        SELECT p.qid, a.id,
               ROW_NUMBER() OVER (
                   PARTITION BY p.qid
                   ORDER BY {_cos_sql('a.vec', 'p.qv')} DESC, a.id ASC
               ) AS rn
        FROM assigned a JOIN probes p ON a.cell = p.cell
        WHERE a.id != p.qid
    ) WHERE rn <= {_RK}
),
exact AS (
    SELECT qid, id FROM (
        SELECT q.qid, e.vec_id AS id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY {_cos_sql('e.embedding', 'q.qv')} DESC,
                            e.vec_id ASC
               ) AS rn
        FROM embeddings e, q
        WHERE e.vec_id != q.qid
    ) WHERE rn <= {_RK}
)
SELECT x.qid,
       CAST(COUNT(a.id) AS BIGINT) AS matched,
       CAST(COUNT(*) AS BIGINT) AS k,
       CAST(COUNT(a.id) AS DOUBLE) / COUNT(*) AS recall
FROM exact x LEFT JOIN approx a ON a.qid = x.qid AND a.id = x.id
GROUP BY x.qid
ORDER BY x.qid
"""


@register("ivf_recall_report", _ivf_recall_oracle())
def ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF cell-probed path (similarity/ivf.ivf_knn_join,
    batch sibling of ivf_search) against exact ground truth — with
    ann_recall_report this covers BOTH ANN scale paths, so nprobe/n_cells
    and band/plane settings tune against the same harness. Shares the
    memoized IVF index (catalog_search.get_ivf_index) and the two-level
    exact batch top-k."""
    from msgvault_spark.catalog_search import get_ivf_index
    from msgvault_spark.similarity.ivf import ivf_knn_join, seed_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    qset = emb.filter(F.col("vec_id") < _NQ)
    cents = seed_centroids(emb, _IVF_CELLS)
    approx = ivf_knn_join(
        get_ivf_index(spark, sf_dir, _IVF_CELLS),
        cents,
        qset,
        k=_RK,
        nprobe=_IVF_PROBE,
    ).select("qid", "id", F.lit(1).alias("hit"))
    return _recall_output(_exact_gt(spark, sf_dir), approx)


def _sq8_recall_oracle() -> str:
    sq8 = (
        "CASE WHEN m > 0 THEN list_transform(embedding, "
        "x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / m + 0.5) AS BIGINT)) "
        "ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END"
    )

    def cos(emb: str, qv: str) -> str:
        return (
            f"round(list_sum(list_transform(list_zip({emb}, {qv}), "
            "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) "
            f"/ (sqrt(list_sum(list_transform({emb}, "
            "v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) * "
            f"sqrt(list_sum(list_transform({qv}, "
            "v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))), 6)"
        )

    return f"""
WITH codes AS (
    SELECT vec_id, {sq8} AS c
    FROM (SELECT vec_id, embedding,
                 list_max(list_transform(embedding,
                          x -> abs(CAST(x AS DOUBLE)))) AS m
          FROM embeddings)
),
q AS (SELECT vec_id AS qid, c AS qc FROM codes WHERE vec_id < {_NQ}),
approx AS (
    SELECT qid, id FROM (
        SELECT q.qid, k.vec_id AS id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY CAST(list_sum(list_transform(list_zip(k.c, q.qc),
                            p -> p[1] * p[2])) AS BIGINT) DESC,
                            k.vec_id ASC
               ) AS rn
        FROM codes k, q WHERE k.vec_id != q.qid
    ) WHERE rn <= {_RK}
),
qf AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       WHERE vec_id < {_NQ}),
exact AS (
    SELECT qid, id FROM (
        SELECT qf.qid, e.vec_id AS id,
               ROW_NUMBER() OVER (
                   PARTITION BY qf.qid
                   ORDER BY {cos('e.embedding', 'qf.qv')} DESC, e.vec_id ASC
               ) AS rn
        FROM embeddings e, qf
        WHERE e.vec_id != qf.qid
    ) WHERE rn <= {_RK}
)
SELECT x.qid,
       CAST(COUNT(a.id) AS BIGINT) AS matched,
       CAST(COUNT(*) AS BIGINT) AS k,
       CAST(COUNT(a.id) AS DOUBLE) / COUNT(*) AS recall
FROM exact x LEFT JOIN approx a ON a.qid = x.qid AND a.id = x.id
GROUP BY x.qid
ORDER BY x.qid
"""


@register("sq8_recall_report", _sq8_recall_oracle())
def sq8_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the SQ8 integer-dot candidate path against exact
    cosine ground truth — completes the evaluation matrix over the three
    approximate retrieval families (LSH `ann_recall_report`, IVF
    `ivf_recall_report`, SQ8 here), so the quantizer's precision loss is
    measured by the same harness that tunes banding and probe counts.
    Shares the persisted SQ8 code artifact with the serving entries
    (`quantized_knn_seed0`, `sq8_rerank_knn`): the report measures
    exactly what serving ranks. Per-query candidate ranking is a 20-row
    broadcast against the code table — one scan of the codes, no corpus
    self-join — reduced by the same two-level top-k as the ground truth
    (no corpus-sized window partition)."""
    from msgvault_spark.similarity.knnjoin import two_level_topk
    from msgvault_spark.similarity.quantize import int_dot, quantize_codes
    from msgvault_spark.sources.cache import get_artifact

    codes = get_artifact(
        spark,
        (sf_dir, "sq8_codes"),
        lambda: quantize_codes(load_table(spark, sf_dir, "embeddings")),
    )
    qcodes = codes.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("qid"), F.col("codes").alias("qc")
    )
    scored = codes.join(
        F.broadcast(qcodes), F.col("vec_id") != F.col("qid")
    ).select(
        "qid",
        F.col("vec_id").alias("id"),
        int_dot(F.col("codes"), F.col("qc")).alias("qscore"),
    )
    approx = two_level_topk(scored, _RK, score_col="qscore").select(
        "qid", "id", F.lit(1).alias("hit")
    )
    return _recall_output(_exact_gt(spark, sf_dir), approx)


def _pq_recall_oracle(m: int = 4, n_codes: int = 16, dim: int = 64) -> str:
    from msgvault_spark.similarity.pq import _dot_scaled_sql, _l2sq_sql

    sub = dim // m

    def cos(emb: str, qv: str) -> str:
        return (
            f"round(list_sum(list_transform(list_zip({emb}, {qv}), "
            "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) "
            f"/ (sqrt(list_sum(list_transform({emb}, "
            "v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) * "
            f"sqrt(list_sum(list_transform({qv}, "
            "v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))), 6)"
        )

    return f"""
WITH subs AS (SELECT CAST(j AS INT) AS j FROM range(0, {m}) t(j)),
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
q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
      WHERE vec_id < {_NQ}),
lut AS (
    SELECT q.qid, c.j, c.code,
           {_dot_scaled_sql(
               f'list_slice(q.qv, c.j * {sub} + 1, (c.j + 1) * {sub})',
               'c.cw')} AS val
    FROM cb c CROSS JOIN q
),
scored AS (
    SELECT l.qid, a.vec_id AS id, CAST(SUM(l.val) AS BIGINT) AS s
    FROM assigned a
    JOIN lut l ON l.j = a.j AND l.code = a.code
    WHERE a.vec_id != l.qid
    GROUP BY l.qid, a.vec_id
),
approx AS (
    SELECT qid, id FROM (
        SELECT qid, id,
               ROW_NUMBER() OVER (
                   PARTITION BY qid ORDER BY s DESC, id ASC
               ) AS rn
        FROM scored
    ) WHERE rn <= {_RK}
),
exact AS (
    SELECT qid, id FROM (
        SELECT q.qid, e.vec_id AS id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY {cos('e.embedding', 'q.qv')} DESC, e.vec_id ASC
               ) AS rn
        FROM embeddings e, q
        WHERE e.vec_id != q.qid
    ) WHERE rn <= {_RK}
)
SELECT x.qid,
       CAST(COUNT(a.id) AS BIGINT) AS matched,
       CAST(COUNT(*) AS BIGINT) AS k,
       CAST(COUNT(a.id) AS DOUBLE) / COUNT(*) AS recall
FROM exact x LEFT JOIN approx a ON a.qid = x.qid AND a.id = x.id
GROUP BY x.qid
ORDER BY x.qid
"""


@register("pq_recall_report", _pq_recall_oracle())
def pq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the PQ asymmetric-distance path against exact cosine
    ground truth — with `ann_recall_report` (LSH), `ivf_recall_report`,
    and `sq8_recall_report` this measures every approximate retrieval
    family in the repo under one harness. Batch shape: the 20 per-query
    integer LUTs (m×n_codes ints each) are a 20-row broadcast table
    joined against the persisted m-byte codes — the float corpus is only
    read by the exact ground-truth side. Ranking is two-level top-k (no
    corpus-sized window partition)."""
    from msgvault_spark.catalog_search import get_pq_index
    from msgvault_spark.similarity.knn import _as_double
    from msgvault_spark.similarity.knnjoin import two_level_topk
    from msgvault_spark.similarity.pq import adc_lut

    emb = load_table(spark, sf_dir, "embeddings")
    books, codes = get_pq_index(spark, sf_dir)
    qrows = (
        emb.filter(F.col("vec_id") < _NQ)
        .select(F.col("vec_id").alias("qid"), _as_double(F.col("embedding")).alias("v"))
        .collect()
    )
    m = len(books)
    luts = [
        (int(r["qid"]), *[lut_j for lut_j in adc_lut(books, list(r["v"]))])
        for r in qrows
    ]
    lut_cols = ", ".join(f"lut_{j} array<long>" for j in range(m))
    luts_df = spark.createDataFrame(luts, f"qid long, {lut_cols}")
    score = None
    for j in range(m):
        term = F.element_at(F.col(f"lut_{j}"), F.col(f"code_{j}") + 1)
        score = term if score is None else score + term
    scored = (
        codes.crossJoin(F.broadcast(luts_df))
        .filter(F.col("id") != F.col("qid"))
        .select("qid", "id", score.alias("s"))
    )
    approx = two_level_topk(scored, _RK, score_col="s").select(
        "qid", "id", F.lit(1).alias("hit")
    )
    return _recall_output(_exact_gt(spark, sf_dir), approx)


# ---------------------------------------------------------------------------
# Round-2: random-projection dim reduction + per-label centroids
# ---------------------------------------------------------------------------

_RP_OUT = 16


def _rp_oracle() -> str:
    from msgvault_spark.similarity.rp import rp_oracle_sql_wide

    return rp_oracle_sql_wide(out_dim=_RP_OUT, in_dim=_DIM)


@register("rp_project_embeddings", _rp_oracle())
def rp_project_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss projection 64→16 (similarity/rp.py):
    Achlioptas ±1 signs folded in as literals, pure map, no shuffle —
    the bandwidth front-end for every downstream ANN/dedup pass. Entry
    output uses the flat (id, p0..p15) schema so every column is a
    scalar the driver's row-hash canonicalizer can sort; the array-
    valued ``project`` API is pinned by tests/test_ngram_ivf.py."""
    from msgvault_spark.similarity.rp import project_wide

    return project_wide(
        load_table(spark, sf_dir, "embeddings"), out_dim=_RP_OUT, in_dim=_DIM
    )


# ONE source of truth for the fixed-point per-dim centroid convention
# (floor(x*1e6) sums, integer mean, /1e6) — label_centroids and
# label_dispersion_report must drift together or not at all, in BOTH
# engines.
_CENTROID_CTE = f"""
idx AS (
    SELECT label, embedding AS v, unnest(range(1, {_DIM} + 1)) AS i
    FROM embeddings
),
cent AS (
    SELECT label, i, CAST(COUNT(*) AS BIGINT) AS n,
           CAST((CAST(SUM(CAST(floor(CAST(v[i] AS DOUBLE) * 1000000)
                                AS BIGINT)) AS BIGINT) // COUNT(*))
                AS DOUBLE) / 1000000.0 AS c
    FROM idx GROUP BY label, i
)"""


def _fixed_point_centroids(emb: DataFrame) -> DataFrame:
    """(label, i, n, c) — the Spark half of _CENTROID_CTE."""
    e = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("i0", "x")
    ).select(
        "label",
        (F.col("i0") + 1).alias("i"),
        F.floor(F.col("x").cast("double") * 1000000).cast("long").alias("xs"),
    )
    return (
        e.groupBy("label", "i")
        .agg(F.sum("xs").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "label",
            "i",
            F.col("n").cast("long").alias("n"),
            (F.expr("s div n").cast("double") / 1000000.0).alias("c"),
        )
    )


@register(
    "label_centroids",
    f"""
WITH {_CENTROID_CTE.strip()}
SELECT label, CAST(i AS INT) AS i, n, c
FROM cent ORDER BY label, i
""",
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors — the grouped elementwise array mean
    every clustering/analysis pass needs. Fixed-point sums (floor(x·10⁶)
    as BIGINT) make the cross-partition aggregation order-free, and the
    mean is an integer floor-division (1e-6 resolution) — no round()
    anywhere, since Spark HALF_UPs doubles while DuckDB HALF_EVENs them.
    Shuffle on (label, dim_index) with full partial aggregation. Output
    stays in the long (label, i, n, c) shape — every column scalar, so
    the driver canonicalizer can hash it; callers wanting the packed
    array re-assemble with collect_list over i (one extra tiny agg)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        _fixed_point_centroids(emb)
        .select("label", F.col("i").cast("int").alias("i"), "n", "c")
        .transform(present_sorted, "label", "i")
    )


_SWEEP_PROBES = (1, 2, 4)


def _ivf_sweep_oracle() -> str:
    from msgvault_spark.similarity.ivf import _cos_sql

    def one(nprobe: int) -> str:
        return f"""
SELECT {nprobe} AS nprobe,
       CAST(COUNT(a.id) AS BIGINT) AS matched,
       CAST(COUNT(*) AS BIGINT) AS total,
       (CAST(COUNT(a.id) AS BIGINT) * 1000000)
           // CAST(COUNT(*) AS BIGINT) AS recall_ppm
FROM exact x LEFT JOIN (
    SELECT qid, id FROM (
        SELECT p.qid, a.id,
               ROW_NUMBER() OVER (
                   PARTITION BY p.qid
                   ORDER BY {_cos_sql('a.vec', 'p.qv')} DESC, a.id ASC
               ) AS rn
        FROM assigned a JOIN (
            SELECT qid, qv, cell FROM (
                SELECT q.qid, q.qv, c.cid AS cell,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.qid
                           ORDER BY {_cos_sql('q.qv', 'c.cvec')} DESC,
                                    c.cid ASC
                       ) AS rn
                FROM q, cents c
            ) WHERE rn <= {nprobe}
        ) p ON a.cell = p.cell
        WHERE a.id != p.qid
    ) WHERE rn <= {_RK}
) a ON a.qid = x.qid AND a.id = x.id
"""

    legs = " UNION ALL ".join(f"({one(n)})" for n in _SWEEP_PROBES)
    return f"""
WITH cents AS (
    SELECT vec_id AS cid, embedding AS cvec FROM embeddings
    WHERE vec_id < {_IVF_CELLS}
),
assigned AS (
    SELECT id, vec, cell FROM (
        SELECT e.vec_id AS id, e.embedding AS vec, c.cid AS cell,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_cos_sql('e.embedding', 'c.cvec')} DESC,
                            c.cid ASC
               ) AS rn
        FROM embeddings e, cents c
    ) WHERE rn = 1
),
q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
      WHERE vec_id < {_NQ}),
exact AS (
    SELECT qid, id FROM (
        SELECT q.qid, e.vec_id AS id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY {_cos_sql('e.embedding', 'q.qv')} DESC,
                            e.vec_id ASC
               ) AS rn
        FROM embeddings e, q
        WHERE e.vec_id != q.qid
    ) WHERE rn <= {_RK}
)
SELECT * FROM ({legs}) ORDER BY nprobe
"""


@register("ivf_probe_sweep", _ivf_sweep_oracle())
def ivf_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN tuning curve: recall@10 of the IVF path at nprobe 1, 2, 4
    against the shared exact ground truth — the scan-fraction/recall
    trade quantified BEFORE a production nprobe is chosen (the vector
    twin of dedup_threshold_sweep).  One persisted index and one ground
    truth serve all three points; each point is an eval-set-shaped
    retrieval + a 1-row rollup."""
    from msgvault_spark.catalog_search import get_ivf_index
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.similarity.ivf import ivf_knn_join, seed_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    qset = emb.filter(F.col("vec_id") < _NQ)
    cents = seed_centroids(emb, _IVF_CELLS)
    idx = get_ivf_index(spark, sf_dir, _IVF_CELLS)
    gt = _exact_gt(spark, sf_dir).select("qid", "id")
    # each leg re-scores its own (eval-set x probed-cells) candidates;
    # a shared max-nprobe scoring pass with per-leg probe-rank filters
    # would compute each cosine once, but every leg here is
    # eval-set-bounded (Q=20 queries), so the duplicate work is constant
    # at any corpus size — revisit only if the sweep grows past a few
    # points
    legs = []
    for nprobe in _SWEEP_PROBES:
        approx = ivf_knn_join(idx, cents, qset, k=_RK, nprobe=nprobe).select(
            "qid", "id", F.lit(1).alias("hit")
        )
        legs.append(
            gt.join(approx, ["qid", "id"], "left").agg(
                F.lit(nprobe).cast("long").alias("nprobe"),
                F.count("hit").cast("long").alias("matched"),
                F.count(F.lit(1)).cast("long").alias("total"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.withColumn(
        "recall_ppm", F.expr("(matched * 1000000) div total")
    ).transform(present_sorted, "nprobe")


def _dispersion_oracle() -> str:
    dot = (
        "list_sum(list_transform(list_zip(e.embedding, c.cvec), "
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    )
    na = (
        "sqrt(list_sum(list_transform(e.embedding, "
        "v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))"
    )
    nb = (
        "sqrt(list_sum(list_transform(c.cvec, "
        "v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))"
    )
    cos_ppm = (
        f"CASE WHEN {na} * {nb} > 0 THEN "
        f"CAST(floor({dot} / ({na} * {nb}) * 1000000 + 0.5) AS BIGINT) "
        "ELSE 0 END"
    )
    return f"""
WITH {_CENTROID_CTE.strip()},
carr AS (SELECT label, list(c ORDER BY i) AS cvec FROM cent GROUP BY label),
scored AS (
    SELECT e.label, {cos_ppm} AS cp
    FROM embeddings e JOIN carr c USING (label)
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cp) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
           AS mean_cos_ppm,
       CAST(MIN(cp) AS BIGINT) AS min_cos_ppm
FROM scored GROUP BY label ORDER BY label
"""


@register("label_dispersion_report", _dispersion_oracle())
def label_dispersion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space health per label: mean and worst cosine of each
    vector to its OWN label centroid — the collapsed-class / outlier
    diagnostic next to label_centroids (a label whose members barely
    align with their centroid carries no class signal; triplet/hard-
    negative entries then say WHERE it leaks).  Centroids are the shared
    fixed-point per-dim means; per-vector cosines floor to exact ppm
    longs, so the label rollup is order-free.  One posexplode agg (the
    centroid build), one broadcast of the L-row centroid table, one
    label rollup."""
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.similarity.knn import _as_double, cosine

    emb = load_table(spark, sf_dir, "embeddings")
    carr = _fixed_point_centroids(emb).groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "c"))),
            lambda s: s["c"],
        ).alias("cvec")
    )
    v = _as_double(F.col("embedding"))
    # cosine() is try_divide: zero-norm vectors yield NULL, coalesced to
    # 0 exactly like the oracle's CASE ... ELSE 0 — no separate norm
    # guard (which would re-fold both norms a second time per row)
    cp = F.coalesce(
        F.floor((cosine(v, F.col("cvec")) * 1000000) + 0.5).cast("long"),
        F.lit(0),
    )

    return (
        emb.join(F.broadcast(carr), "label")
        .select("label", cp.alias("cp"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("CAST(sum(cp) AS BIGINT) div count(1)").alias(
                "mean_cos_ppm"
            ),
            F.min("cp").cast("long").alias("min_cos_ppm"),
        )
        .transform(present_sorted, "label")
    )

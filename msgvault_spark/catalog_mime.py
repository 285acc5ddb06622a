"""Catalog entries: raw-MIME dedup functions (F14/F15/D2/D6, F17).

Raw MIME is synthesized deterministically from the documents table (the
testdata carries no MIME blobs): each doc < 100 appears as TWO transport
variants — different Received/trace headers, same logical content — so
content-hash grouping must pair them up.

The content-hash oracle does not re-implement the normalizer; it constructs
the KNOWN normalized form for this input shape directly and hashes it —
asserting the engine's normalize→sha256 pipeline lands on the expected
canonical bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from msgvault_spark.catalog import register
from msgvault_spark.functions.mime import (
    mime_content_hash,
    preprocess_for_embedding,
    rfc822_message_id,
)
from msgvault_spark.sources.cache import get_table as load_table


def _raw_mime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, base_id, raw): two trace-variant copies per document."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )

    def variant(route: str, offset: int) -> DataFrame:
        return docs.select(
            (F.col("doc_id") + offset).alias("id"),
            F.col("doc_id").alias("base_id"),
            F.concat(
                F.lit(f"Received: from {route}.example.net\r\n"),
                F.lit("Message-ID: <doc-"),
                F.col("doc_id").cast("string"),
                F.lit("@corpus.example.com>\r\n"),
                F.lit("Subject: doc "),
                F.col("doc_id").cast("string"),
                F.lit("\r\nFrom: gen@example.com\r\n\r\n"),
                F.col("text"),
            ).alias("raw"),
        )

    return variant("mx-a", 0).unionByName(variant("mx-b", 100000))


@register(
    "dedup_mime_hash_groups",
    """
WITH normalized AS (
    SELECT doc_id,
           'From: gen@example.com' || chr(10) ||
           'Message-ID: <doc-' || CAST(doc_id AS VARCHAR) ||
               '@corpus.example.com>' || chr(10) ||
           'Subject: doc ' || CAST(doc_id AS VARCHAR) ||
           chr(10) || chr(10) || trim(text) AS canon
    FROM documents WHERE doc_id < 100
)
SELECT sha256(canon) AS content_hash,
       CAST(2 AS BIGINT) AS copies,
       CAST(doc_id AS BIGINT) AS survivor_id,
       CAST(doc_id + 100000 AS BIGINT) AS dup_id
FROM normalized
ORDER BY survivor_id
""",
)
def dedup_mime_hash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup over raw MIME (D2: zlib→normalize→sha256→group;
    here the compression step is identity). Survivor = lowest id (D3's
    final tie-break)."""
    raws = _raw_mime(spark, sf_dir)
    hashed = raws.select(
        "id", mime_content_hash(F.col("raw")).alias("content_hash")
    )
    return (
        hashed.groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("copies"),
            F.min("id").alias("survivor_id"),
            F.max("id").alias("dup_id"),
        )
        .filter(F.col("copies") > 1)
        .sortWithinPartitions("survivor_id")
    )


@register(
    "rfc822_backfill",
    """
SELECT CAST(doc_id AS BIGINT) AS id,
       'doc-' || CAST(doc_id AS VARCHAR) || '@corpus.example.com'
           AS rfc822_message_id
FROM documents WHERE doc_id < 100
ORDER BY id
""",
)
def rfc822_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC822 Message-ID backfill from raw headers (D6) — native
    regexp_extract, no UDF."""
    raws = _raw_mime(spark, sf_dir).filter(F.col("id") < 100)
    return (
        raws.select("id", rfc822_message_id(F.col("raw")).alias("rfc822_message_id"))
        .sortWithinPartitions("id")
    )


@register(
    "embed_preprocess_docs",
    r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       substr('Subject: doc ' || CAST(doc_id AS VARCHAR) || chr(10) ||
              trim(regexp_replace(text, '\s+', ' ', 'g')), 1, 300) AS embed_text
FROM documents
WHERE doc_id < 100
ORDER BY doc_id
""",
)
def embed_preprocess_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding text preprocessing (F17) applied corpus-wide. The document
    texts carry no reply-quotes/signatures, so the oracle reduces to the
    whitespace-collapse + subject-prefix + truncate steps; the quote and
    signature regexes are unit-tested on synthetic bodies."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    return (
        docs.select(
            "doc_id",
            preprocess_for_embedding(
                F.col("text"),
                F.concat(F.lit("doc "), F.col("doc_id").cast("string")),
                300,
            ).alias("embed_text"),
        )
        .sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# Round 3: Q11 embedding pipeline under the value-hash oracle
# ---------------------------------------------------------------------------

_EMBGEN_MEMO: dict = {}


def _hex8int(col: str) -> str:
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({col}, {k}, 1)) - 1) "
        f"* {16 ** (8 - k)}"
        for k in range(1, 9)
    )


def _embed_pipeline_oracle() -> str:
    e_cols = ", ".join(
        "round(CAST(CAST(MAX(CASE WHEN i = {j} THEN v END) / nrm AS REAL) "
        "AS DOUBLE), 6) AS e{j}".format(j=j)
        for j in range(8)
    )
    return f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 60),
comps AS (
    SELECT doc_id, CAST(t.i AS INT) AS i,
           md5(md5(text) || ':' || CAST(t.i AS VARCHAR)) AS m
    FROM docs, range(16) t(i)
),
vals AS (
    SELECT doc_id, i,
           (CAST({_hex8int('m')} AS DOUBLE) / 2147483648.0 - 1.0) AS v
    FROM comps
),
norms AS (SELECT doc_id, sqrt(SUM(v * v)) AS nrm FROM vals GROUP BY doc_id)
SELECT v.doc_id AS id, {e_cols}
FROM vals v JOIN norms n USING (doc_id)
GROUP BY v.doc_id, nrm
ORDER BY id
"""


@register("embed_pipeline_vectors", _embed_pipeline_oracle())
def embed_pipeline_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 end-to-end under the VALUE oracle (was unit-test-only): pending
    queue → adaptive-batched embed (deterministic md5 fake) → generation
    promote → active-generation read. The oracle replays the fake's hex-
    string md5 chain, the float64 unit-norm, AND the float32 storage cast
    (::REAL) — so a wrong queue, a dropped batch, a dim mismatch, or a
    precision change all hash-mismatch. First 8 of 16 dims as scalar
    columns (driver-hashable)."""
    import tempfile

    from msgvault_spark.embeddings_pipeline import (
        embed_pending,
        load_active_vectors,
        promote_generation,
    )

    key = (spark.sparkContext.applicationId, sf_dir, "embgen")
    if key not in _EMBGEN_MEMO:
        base = tempfile.mkdtemp(prefix="msgvault_embgen_")
        corpus = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 60)
            .select("doc_id", "text")
        )
        embed_pending(corpus, base, 1, dim=16)
        promote_generation(spark, base, 1)
        _EMBGEN_MEMO[key] = base
    vecs = load_active_vectors(spark, _EMBGEN_MEMO[key])
    return vecs.select(
        "id",
        *[
            F.round(F.element_at("embedding", j + 1).cast("double"), 6)
            .alias(f"e{j}")
            for j in range(8)
        ],
    ).sortWithinPartitions("id")

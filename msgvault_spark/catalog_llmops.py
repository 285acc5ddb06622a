"""Catalog entries for the round-2 LLM-pipeline additions: benchmark
decontamination, relational count-min sketch, sequence packing, and the
mergeable histogram-quantile sketch. Registered on import by catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from msgvault_spark.catalog import register
from msgvault_spark.operators.present import present_sorted
from msgvault_spark.sources.cache import get_table as load_table

_DOCS_SQL = "SELECT doc_id, text FROM documents"
_BENCH_SQL = "SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0"


def _decon_oracle() -> str:
    from msgvault_spark.dedup.decontaminate import decontaminate_oracle_sql

    return decontaminate_oracle_sql(
        _DOCS_SQL, _BENCH_SQL, n=3, min_collisions=2
    )


@register("decontaminate_docs", _decon_oracle())
def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix C / Lee et al. 2022):
    every (train doc, benchmark doc) pair sharing ≥2 distinct word
    trigrams, benchmark = every 50th document standing in for an eval
    set. Corpus grams stream through ONE broadcast join against the small
    benchmark gram set — no self-join (dedup/decontaminate.py)."""
    from msgvault_spark.dedup.decontaminate import contamination_pairs

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    return contamination_pairs(docs, bench, n=3, min_collisions=2)


_SEM_COS = (
    "round(list_sum(list_transform(list_zip(e.embedding, b.embedding), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform(e.embedding, "
    "v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) * "
    "sqrt(list_sum(list_transform(b.embedding, "
    "v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))), 6)"
)


@register(
    "semantic_decontaminate_docs",
    f"""
WITH b AS (SELECT * FROM embeddings WHERE vec_id % 100 = 0)
SELECT e.vec_id AS id, MAX({_SEM_COS}) AS max_sim
FROM embeddings e, b
WHERE e.vec_id != b.vec_id
GROUP BY e.vec_id
HAVING MAX({_SEM_COS}) >= 0.35
ORDER BY id
""",
)
def semantic_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination (semantic sibling of
    decontaminate_docs — catches paraphrased leakage n-grams miss): flag
    corpus vectors whose max cosine against the broadcast benchmark set
    (every 100th vector standing in for an eval set) reaches 0.35.
    One map-shaped pass, no corpus self-join. Engine: the GEMM-margin
    two-phase (dedup/decontaminate.py:semantic_contamination_gemm —
    one float64 GEMM per Arrow batch against the benchmark matrix
    proposes at threshold − margin, the shared JVM fold re-verifies),
    pinned bit-identical to the interpreted-fold twin by
    tests/test_dedup_textstats.py and 12× faster at sf1."""
    from msgvault_spark.dedup.decontaminate import semantic_contamination_gemm
    from msgvault_spark.operators.present import present_sorted

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 100 == 0)
    return semantic_contamination_gemm(emb, bench, threshold=0.35).transform(
        present_sorted, "id"
    )


@register(
    "c4_pipeline_stats",
    r"""
WITH m AS (
    SELECT lang,
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       w -> w != '') AS ws,
           sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h
    FROM documents
),
f AS (
    SELECT lang, h, len(ws) AS nw,
           CASE WHEN len(ws) > 0
                THEN CAST(floor(list_sum(list_transform(ws, w -> len(w)))
                                * 100.0 / len(ws)) AS BIGINT)
                ELSE 0 END AS mwl_c,
           CASE WHEN len(ws) > 0
                THEN CAST(floor((len(ws) - len(list_distinct(ws)))
                                * 1000000.0 / len(ws)) AS BIGINT)
                ELSE 0 END AS dwppm
    FROM m
),
g AS (
    SELECT lang = 'en' AS en,
           lang = 'en' AND nw >= 30 AND mwl_c BETWEEN 400 AND 470 AS q,
           lang = 'en' AND nw >= 30 AND mwl_c BETWEEN 400 AND 470
               AND dwppm < 600000 AS r,
           h
    FROM f
),
a AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS c1,
           CAST(COUNT(*) FILTER (en) AS BIGINT) AS c2,
           CAST(COUNT(*) FILTER (q) AS BIGINT) AS c3,
           CAST(COUNT(*) FILTER (r) AS BIGINT) AS c4,
           CAST(COUNT(DISTINCT CASE WHEN r THEN h END) AS BIGINT) AS c5
    FROM g
)
SELECT CAST(1 AS BIGINT) AS stage_no, 'raw' AS stage, c1 AS docs FROM a
UNION ALL SELECT 2, 'lang_en', c2 FROM a
UNION ALL SELECT 3, 'quality', c3 FROM a
UNION ALL SELECT 4, 'repetition', c4 FROM a
UNION ALL SELECT 5, 'exact_dedup', c5 FROM a
ORDER BY stage_no
""",
)
def c4_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel (the C4/Gopher pipeline shape): per-stage
    survivor counts for raw → lang-ID → quality (word count + mean word
    length) → repetition (duplicate-word ppm) → exact content-hash dedup,
    computed in ONE conditional-aggregation pass over the corpus — the
    funnel report every curation run prints before training. All stage
    predicates use the repo's pinned integer/ppm formulas (repetition
    family textstats/analysis.py, content hash dedup/exact.py) so both
    engines agree bit-for-bit. At 100 TB this is one scan + one 1-row
    agg; no per-stage re-scans."""
    from msgvault_spark.dedup.exact import content_hash

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    ws = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda w: w != ""
    )
    m = docs.select(
        "lang", ws.alias("ws"), content_hash(F.col("text")).alias("h")
    )
    nw = F.size("ws")
    wchars = F.aggregate(
        F.transform(F.col("ws"), lambda w: F.length(w)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    mwl_c = F.when(nw > 0, F.floor(wchars * 100.0 / nw)).otherwise(0).cast("long")
    dwppm = (
        F.when(
            nw > 0,
            F.floor((nw - F.size(F.array_distinct("ws"))) * 1000000.0 / nw),
        )
        .otherwise(0)
        .cast("long")
    )
    f = m.select("lang", "h", nw.alias("nw"), mwl_c.alias("mwl_c"), dwppm.alias("dwppm"))
    en = F.col("lang") == "en"
    q = en & (F.col("nw") >= 30) & F.col("mwl_c").between(400, 470)
    r = q & (F.col("dwppm") < 600000)
    a = f.agg(
        F.count(F.lit(1)).cast("long").alias("c1"),
        F.count(F.when(en, 1)).cast("long").alias("c2"),
        F.count(F.when(q, 1)).cast("long").alias("c3"),
        F.count(F.when(r, 1)).cast("long").alias("c4"),
        F.count_distinct(F.when(r, F.col("h"))).cast("long").alias("c5"),
    )
    return a.selectExpr(
        "stack(5, 1L, 'raw', c1, 2L, 'lang_en', c2, 3L, 'quality', c3, "
        "4L, 'repetition', c4, 5L, 'exact_dedup', c5) "
        "AS (stage_no, stage, docs)"
    ).transform(present_sorted, "stage_no")


def _cms_oracle() -> str:
    from msgvault_spark.operators.cms import cms_oracle_sql

    return (
        """
WITH est AS (
"""
        + cms_oracle_sql(
            "SELECT o_custkey FROM orders",
            "o_custkey",
            "SELECT DISTINCT o_custkey AS key FROM orders WHERE o_custkey <= 30",
            depth=4,
            width=512,
        )
        + """
),
exact AS (
    SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS exact_count
    FROM orders WHERE o_custkey <= 30 GROUP BY 1
)
SELECT e.key, x.exact_count, e.estimate,
       CAST(CASE WHEN e.estimate >= x.exact_count THEN 1 ELSE 0 END AS BIGINT)
           AS over_ok
FROM est e JOIN exact x USING (key)
ORDER BY key
"""
    )


@register("cms_frequency_orders", _cms_oracle())
def cms_frequency_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch as relational state (operators/cms.py): the d×w
    counter grid from one groupBy, probed for the low-key customers.
    Compared output carries exact count, sketch estimate (identical md5
    bucketing on both engines → estimates match exactly), and the CMS
    one-sided-error invariant estimate ≥ exact."""
    from msgvault_spark.operators.cms import cms_build, cms_estimate

    orders = load_table(spark, sf_dir, "orders")
    sketch = cms_build(orders, "o_custkey", depth=4, width=512)
    probes = (
        orders.filter(F.col("o_custkey") <= 30)
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    est = cms_estimate(sketch, probes, "key", depth=4, width=512)
    exact = (
        orders.filter(F.col("o_custkey") <= 30)
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
    )
    return (
        exact.join(est, "key")
        .select(
            "key",
            "exact_count",
            "estimate",
            (F.col("estimate") >= F.col("exact_count"))
            .cast("long")
            .alias("over_ok"),
        )
        .transform(present_sorted, "key")
    )


_TOKENS_SQL = (
    "SELECT doc_id, CAST(len(list_filter(string_split_regex(lower(text), "
    "'[^a-z0-9]+'), w -> w != '')) AS BIGINT) AS n_tokens FROM documents"
)


def _packing_oracle() -> str:
    from msgvault_spark.operators.packing import packing_oracle_sql

    return packing_oracle_sql(_TOKENS_SQL, budget=256, n_shards=8)


@register("pack_training_sequences", _packing_oracle())
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous offset packing of documents into 256-token training bins
    across 8 shards (operators/packing.py): per-shard window cumsum — no
    global window — rolled up to (shard, bin, n_docs, bin_tokens)."""
    from msgvault_spark.operators.packing import bin_stats, pack_sequences

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.lower("text"), "[^a-z0-9]+"), lambda w: w != ""
            )
        ).alias("n_tokens"),
    )
    return bin_stats(
        pack_sequences(docs, "doc_id", "n_tokens", budget=256, n_shards=8)
    )


def _hist_oracle() -> str:
    from msgvault_spark.operators.histsketch import hist_quantile_oracle_sql

    return hist_quantile_oracle_sql(
        "SELECT o_orderpriority, o_totalprice FROM orders",
        "o_orderpriority",
        "o_totalprice",
        [0.5, 0.9, 0.99],
        lo=0,
        hi=600_000,
        bins=600,
    )


@register("hist_quantile_orders", _hist_oracle())
def hist_quantile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram-quantile sketch (operators/histsketch.py): the
    t-digest role as flat (group, bin, count) state; p50/p90/p99 of order
    totals per priority read from the 600-bin grid, exact to one bin
    width, bit-identical across engines (integer arithmetic)."""
    from msgvault_spark.operators.histsketch import hist_quantiles, hist_sketch

    orders = load_table(spark, sf_dir, "orders")
    state = hist_sketch(
        orders, ["o_orderpriority"], "o_totalprice", lo=0, hi=600_000, bins=600
    )
    return (
        hist_quantiles(
            state, ["o_orderpriority"], [0.5, 0.9, 0.99],
            lo=0, hi=600_000, bins=600,
        )
        .withColumnRenamed("o_orderpriority", "grp")
        .transform(present_sorted, "grp")
    )


# ---------------------------------------------------------------------------
# Round-2 post-verdict additions: chunking, PII redaction
# ---------------------------------------------------------------------------


def _chunk_oracle() -> str:
    from msgvault_spark.operators.chunking import chunk_oracle_sql

    return chunk_oracle_sql(size=64, overlap=16)


@register("chunk_documents", _chunk_oracle())
def chunk_documents_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: 64-token windows every 48 tokens (16
    overlap), short tail kept. Pure map + explode — no shuffle, no UDF
    (operators/chunking.py)."""
    from msgvault_spark.operators.chunking import chunk_documents

    return chunk_documents(
        load_table(spark, sf_dir, "documents"), size=64, overlap=16
    )


# The synthetic corpus carries no PII, so the entry plants deterministic
# PII in both engines with the same expression, then scrubs it — the regex
# machinery (Java in Spark, RE2 in DuckDB) is what is under test.
_PII_SPARK = (
    "concat(text,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' contact u', CAST(doc_id AS STRING),"
    "      '@example.com') ELSE '' END,"
    " CASE WHEN doc_id % 4 = 0 THEN concat(' call 415 555 ',"
    "      lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END,"
    " CASE WHEN doc_id % 5 = 0 THEN concat(' see https://ex.com/d/',"
    "      CAST(doc_id AS STRING), '?x=1') ELSE '' END)"
)
_PII_DUCK = (
    "concat(text,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' contact u', CAST(doc_id AS VARCHAR),"
    "      '@example.com') ELSE '' END,"
    " CASE WHEN doc_id % 4 = 0 THEN concat(' call 415 555 ',"
    "      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) ELSE '' END,"
    " CASE WHEN doc_id % 5 = 0 THEN concat(' see https://ex.com/d/',"
    "      CAST(doc_id AS VARCHAR), '?x=1') ELSE '' END)"
)


def _redact_oracle() -> str:
    from msgvault_spark.functions.redact import redact_oracle_exprs

    counts, redacted = redact_oracle_exprs(_PII_DUCK)
    cols = ",\n       ".join(counts)
    return f"""
SELECT doc_id,
       {cols},
       {redacted} AS redacted_text
FROM documents
"""


@register("redact_pii_docs", _redact_oracle())
def redact_pii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (functions/redact.py): plant deterministic emails/phones/
    URLs on a doc_id-keyed subset, then redact with the portable
    Java∩RE2 pattern set; per-class counts from the pre-redaction text."""
    from msgvault_spark.functions.redact import redact_pii

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PII_SPARK).alias("text")
    )
    return redact_pii(docs)

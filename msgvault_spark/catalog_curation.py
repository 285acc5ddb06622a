"""Catalog entries: round-6 training-data curation additions — DSIR-style
importance resampling, padded-batch length bucketing, and corpus n-gram
diversity. Registered on import by catalog.py.

These extend the LLM-data-pipeline surface (catalog_llmops.py,
catalog_dedup.py): selection by target-domain likelihood ratio, batch-
shape economics, and per-source repetitiveness — the curation questions a
100 TB pretraining corpus asks after dedup and quality filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from msgvault_spark.catalog import register
from msgvault_spark.sources.cache import get_table as load_table

_DSIR_BUCKETS = 256
_DSIR_TOP_N = 100
_DSIR_TARGET_PRED = "source = 'src0'"


def _dsir_oracle() -> str:
    from msgvault_spark.operators.dsir import dsir_oracle_sql

    return dsir_oracle_sql(
        target_pred=_DSIR_TARGET_PRED,
        n_buckets=_DSIR_BUCKETS,
        top_n=_DSIR_TOP_N,
    )


@register("dsir_importance_select", _dsir_oracle())
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): weight every document by
    its log-likelihood ratio between hashed bag-of-words models of a
    TARGET domain (source 'src0' standing in for the wanted domain) and
    the RAW corpus; keep the top-N most target-like. Features come from
    the ETL-time inverted-index postings (no re-tokenization); buckets
    use the portable md5-hex6 hash; per-bucket LLRs are fixed-point
    integers so the per-doc sum is order-free and engine-exact
    (operators/dsir.py has the 100 TB shape: K-row distributions with
    map-side combine, broadcast LLR table, one doc-keyed shuffle)."""
    from msgvault_spark.operators.dsir import dsir_select
    from msgvault_spark.sources.cache import get_text_index

    postings, _stats = get_text_index(
        spark, sf_dir, "documents", "doc_id", "text"
    )
    target_ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.expr(_DSIR_TARGET_PRED))
        .select("doc_id")
    )
    return dsir_select(
        postings,
        target_ids,
        n_buckets=_DSIR_BUCKETS,
        top_n=_DSIR_TOP_N,
    )


_TOKENS_SQL = (
    "SELECT doc_id, len(list_filter(string_split_regex(lower(COALESCE("
    "text, '')), '[^a-z0-9]+'), w -> w != '')) AS n_tokens FROM documents"
)


def _length_bucket_oracle() -> str:
    from msgvault_spark.operators.packing import length_bucket_oracle_sql

    return length_bucket_oracle_sql(_TOKENS_SQL)


@register("length_bucket_report", _length_bucket_oracle())
def length_bucket_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padded-batch economics: bucket documents by token length, assign
    hash-derived batches of ≤16, and report per bucket how many tokens a
    pad-to-batch-max serving stack would burn (waste_ppm). The packing
    complement of pack_training_sequences — answers "is length bucketing
    tight enough before paying for a sort?" with no per-bucket sort or
    window anywhere (operators/packing.py:length_bucket_report)."""
    from msgvault_spark.operators.packing import (
        length_bucket_report as _report,
    )
    from msgvault_spark.sources.cache import get_text_index

    from msgvault_spark.operators.present import present_sorted

    _postings, stats = get_text_index(
        spark, sf_dir, "documents", "doc_id", "text"
    )
    return _report(stats, "doc_id", "dl").transform(present_sorted, "bucket")


@register(
    "ngram_diversity_by_source",
    """
WITH m AS (
    SELECT source,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x != '') AS w
    FROM documents
),
g AS (
    SELECT source,
           CASE WHEN len(w) >= 3
                THEN list_transform(
                     generate_series(1, len(w) - 2),
                     i -> list_aggregate(w[i:i+2], 'string_agg', ' '))
                ELSE [list_aggregate(w, 'string_agg', ' ')]
           END AS grams
    FROM m
),
e AS (SELECT source, unnest(grams) AS gram FROM g)
SELECT source AS grp,
       CAST(COUNT(*) AS BIGINT) AS total_ngrams,
       CAST(COUNT(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
       (CAST(COUNT(DISTINCT gram) AS BIGINT) * 1000000)
           // CAST(COUNT(*) AS BIGINT) AS diversity_ppm
FROM e
GROUP BY 1
ORDER BY grp
""",
)
def ngram_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram type-token ratio per source: the corpus-level
    diversity diagnostic (low = templated/self-repetitive source; the
    per-corpus complement of the per-document Gopher repetition
    filters). Exact COUNT(DISTINCT) here as the oracle-checkable
    baseline; the 100 TB note in textstats/analysis.py swaps it for the
    per-source KMV sketch artifact."""
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.textstats.analysis import ngram_diversity_by_group

    docs = load_table(spark, sf_dir, "documents")
    return ngram_diversity_by_group(docs, "source", "text", n=3).transform(
        present_sorted, "grp"
    )

"""Catalog entries: aggregate-scoped search (Q5), search-with-stats and
offset pagination (Q4/O4), domain search across roles (Q6).

Registered into the main CATALOG via the import at the tail of catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from msgvault_spark.catalog import _FROM_JOIN, _agg_oracle, register
from msgvault_spark.plans import aggregate as agg
from msgvault_spark.plans.models import AggregateOptions, ViewType
from msgvault_spark.search.fast import SearchWithStats, search_by_domains
from msgvault_spark.sources.adapter import oracle
from msgvault_spark.sources.cache import get_archive

_EMAIL_ONLY = (
    "(msg.message_type = 'email' OR msg.message_type IS NULL "
    "OR msg.message_type = '')"
)


@register(
    "agg_senders_with_search",
    _agg_oracle(
        "p.email_address",
        _FROM_JOIN,
        "p.email_address IS NOT NULL",
        where=(
            r"msg.subject ILIKE '%urgent%' ESCAPE '\' "
            r"OR msg.snippet ILIKE '%urgent%' ESCAPE '\' "
            r"OR p.email_address ILIKE '%urgent%' ESCAPE '\'"
        ),
    ),
)
def agg_senders_with_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-scoped text search (Q5, reference
    buildAggregateSearchConditions duckdb.go:435-476): the term filters on
    subject/snippet and the view's own key column, pre-groupBy, so facet
    counts match the visible rows."""
    return agg.aggregate(
        get_archive(spark, sf_dir),
        ViewType.SENDERS,
        AggregateOptions(search_query="urgent"),
    )


@register(
    "search_with_stats",
    oracle(
        f"""
SELECT COUNT(*) AS message_count,
       CAST(COALESCE(SUM(CAST(msg.size_estimate AS BIGINT)), 0) AS BIGINT)
           AS total_size,
       CAST(COALESCE(SUM(CAST(msg.attachment_count AS BIGINT)), 0) AS BIGINT)
           AS attachment_count
FROM messages msg
WHERE {_EMAIL_ONLY}
  AND msg.has_attachments = true
  AND msg.subject ILIKE '%urgent%' ESCAPE '\\'
"""
    ),
)
def search_with_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize-once search (Q4, reference SearchFastWithStats
    duckdb.go:2190-2300): the persisted match set serves stats here and any
    number of count/page calls without rescanning."""
    s = SearchWithStats(
        get_archive(spark, sf_dir), "subject:urgent has:attachment"
    )
    return s.stats().select(
        "message_count",
        F.col("total_size").cast("long").alias("total_size"),
        F.col("attachment_count").cast("long").alias("attachment_count"),
    )


@register(
    "search_page2",
    oracle(
        f"""
, matches AS (
    SELECT msg.id, msg.subject, msg.sent_at, msg.size_estimate
    FROM messages msg
    WHERE {_EMAIL_ONLY}
      AND msg.subject ILIKE '%urgent%' ESCAPE '\\'
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (ORDER BY sent_at DESC, id DESC) AS rn
    FROM matches
)
SELECT id, subject, sent_at, size_estimate
FROM ranked
WHERE rn > 50 AND rn <= 100
ORDER BY sent_at DESC, id DESC
"""
    ),
)
def search_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFFSET pagination (O4) as a row_number window over the deterministic
    (sent_at DESC, id DESC) order — page 2 of 50 from the same persisted
    match set Q4 uses (reference pages off its temp-table cache)."""
    s = SearchWithStats(get_archive(spark, sf_dir), "subject:urgent")
    return s.page(limit=50, offset=50).select(
        "id", "subject", "sent_at", "size_estimate"
    )


@register(
    "search_by_domains",
    oracle(
        """
SELECT msg.id, COALESCE(msg.subject, '') AS subject, msg.sent_at
FROM messages msg
WHERE EXISTS (
    SELECT 1 FROM message_recipients mr
    JOIN participants p ON p.id = mr.participant_id
    WHERE mr.message_id = msg.id
      AND p.domain IN ('nation_5.example.com', 'nation_7.example.com')
)
ORDER BY msg.sent_at DESC, msg.id DESC
LIMIT 100
"""
    ),
)
def search_by_domains_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain search across all recipient roles (Q6) — one semi-join."""
    return search_by_domains(
        get_archive(spark, sf_dir),
        ["nation_5.example.com", "nation_7.example.com"],
        limit=100,
    )

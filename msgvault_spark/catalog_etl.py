"""Catalog entries: ETL sink roundtrip (S5/S6), conversation stats (A10),
text-modality aggregates (A11), empty-bucket anti-join drilldowns (P11).

Registered into the main CATALOG via the import at the tail of catalog.py.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from msgvault_spark.catalog import register
from msgvault_spark.sources.adapter import oracle
from msgvault_spark.sources.build_cache import build_cache
from msgvault_spark.sources.cache import get_archive
from msgvault_spark.sources.loader import load_archive

_CACHE_DIR_MEMO: dict[tuple[str, str], str] = {}


def _roundtrip_lake(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Write the adapter archive through the partitioned-zstd cache builder
    once per (session, sf_dir), then serve queries from the re-read lake —
    the full S5/S6 write path + S1/S2 read path under oracle verification."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CACHE_DIR_MEMO:
        base = tempfile.mkdtemp(prefix="msgvault_cache_")
        build_cache(spark, get_archive(spark, sf_dir), base)
        _CACHE_DIR_MEMO[key] = base
    return load_archive(spark, _CACHE_DIR_MEMO[key])


@register(
    "cache_roundtrip_by_year",
    oracle(
        """
SELECT year,
       COUNT(*) AS message_count,
       CAST(SUM(size_estimate) AS BIGINT) AS total_size
FROM messages
WHERE sent_at IS NOT NULL
GROUP BY year
ORDER BY year
"""
    ),
)
def cache_roundtrip_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet sink roundtrip (S5: hive year-partitioned zstd write; S1:
    partition-discovering read). The year column comes back as a hive
    partition column — the per-year aggregate below prunes to partition
    listing + column scan (reference: build_cache.go:289-315)."""
    lake = _roundtrip_lake(spark, sf_dir)
    return (
        lake["messages"]
        .groupBy(F.col("year").cast("int").alias("year"))
        .agg(
            F.count(F.lit(1)).alias("message_count"),
            F.sum("size_estimate").cast("long").alias("total_size"),
        )
        .orderBy("year")
    )


@register(
    "list_conversations",
    oracle(
        """
, stats AS (
    SELECT conversation_id,
           COUNT(*) AS message_count,
           MAX(sent_at) AS last_message_at
    FROM messages GROUP BY conversation_id
), latest AS (
    SELECT conversation_id, subject AS last_subject
    FROM (
        SELECT conversation_id, subject,
               ROW_NUMBER() OVER (PARTITION BY conversation_id
                                  ORDER BY sent_at DESC, id DESC) AS rn
        FROM messages
    ) WHERE rn = 1
), pcount AS (
    SELECT m.conversation_id,
           COUNT(DISTINCT mr.participant_id) AS participant_count
    FROM messages m JOIN message_recipients mr ON mr.message_id = m.id
    GROUP BY m.conversation_id
)
SELECT s.conversation_id, s.message_count, s.last_message_at,
       l.last_subject, p.participant_count
FROM stats s
JOIN latest l ON l.conversation_id = s.conversation_id
JOIN pcount p ON p.conversation_id = s.conversation_id
ORDER BY s.message_count DESC, s.conversation_id ASC
LIMIT 100
"""
    ),
)
def list_conversations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation stats (A10/W3, reference duckdb_text.go:129-158): per-
    thread count, last timestamp, ordered-first preview, distinct
    participant count. All three sub-aggregates group on conversation_id, so
    after one repartition they share a single shuffle stage."""
    arch = get_archive(spark, sf_dir)
    msgs = arch["messages"]
    stats = msgs.groupBy("conversation_id").agg(
        F.count(F.lit(1)).alias("message_count"),
        F.max("sent_at").alias("last_message_at"),
    )
    w = Window.partitionBy("conversation_id").orderBy(
        F.col("sent_at").desc(), F.col("id").desc()
    )
    latest = (
        msgs.select("conversation_id", "subject", "sent_at", "id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("conversation_id", F.col("subject").alias("last_subject"))
    )
    pcount = (
        msgs.select(F.col("id").alias("message_id"), "conversation_id")
        .join(arch["message_recipients"].select("message_id", "participant_id"),
              "message_id")
        .groupBy("conversation_id")
        .agg(F.countDistinct("participant_id").alias("participant_count"))
    )
    return (
        stats.join(latest, "conversation_id")
        .join(pcount, "conversation_id")
        .select("conversation_id", "message_count", "last_message_at",
                "last_subject", "participant_count")
        .orderBy(F.col("message_count").desc(), F.col("conversation_id").asc())
        .limit(100)
    )


@register(
    "text_agg_contacts",
    oracle(
        """
SELECT p.email_address AS key,
       COUNT(*) AS count,
       CAST(SUM(m.size_estimate) AS BIGINT) AS total_size
FROM messages m
JOIN participants p ON p.id = m.sender_id
WHERE m.message_type IN ('whatsapp', 'sms')
GROUP BY p.email_address
ORDER BY count DESC, key ASC
LIMIT 100
"""
    ),
)
def text_agg_contacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-modality contact aggregate (A11/P4, duckdb_text.go:192-294):
    chat subset resolved through the direct sender_id path (J6), broadcast
    dim join, map-side-combined count/sum."""
    arch = get_archive(spark, sf_dir)
    p = arch["participants"].select(
        F.col("id").alias("p_id"), F.col("email_address").alias("key")
    )
    return (
        arch["messages"]
        .filter(F.col("message_type").isin("whatsapp", "sms"))
        .join(F.broadcast(p), F.col("sender_id") == F.col("p_id"))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.sum("size_estimate").cast("long").alias("total_size"),
        )
        .orderBy(F.col("count").desc(), F.col("key").asc())
        .limit(100)
    )


@register(
    "empty_cc_by_year",
    oracle(
        """
SELECT m.year, COUNT(*) AS count
FROM messages m
WHERE NOT EXISTS (
    SELECT 1 FROM message_recipients mr
    WHERE mr.message_id = m.id AND mr.recipient_type = 'cc'
)
GROUP BY m.year
ORDER BY m.year
"""
    ),
)
def empty_cc_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty-bucket drilldown (P11/J5, reference models.go:204-273): NOT
    EXISTS anti-join — messages with no cc recipients — then a per-year
    rollup. The anti-join build side is pre-filtered to cc rows only."""
    arch = get_archive(spark, sf_dir)
    cc = (
        arch["message_recipients"]
        .filter(F.col("recipient_type") == "cc")
        .select("message_id")
    )
    return (
        arch["messages"]
        .join(cc, F.col("id") == F.col("message_id"), "left_anti")
        .groupBy("year")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("year")
    )


@register(
    "raw_sql_v_domains",
    oracle(
        """
, live AS (SELECT * FROM messages WHERE sent_at IS NOT NULL)
, ms AS (
    SELECT mr.message_id,
           MIN_BY(p.email_address, mr.participant_id) AS from_email,
           MIN_BY(p.domain, mr.participant_id) AS from_domain
    FROM message_recipients mr
    JOIN participants p ON p.id = mr.participant_id
    WHERE mr.recipient_type = 'from'
    GROUP BY mr.message_id
), ds AS (
    SELECT m.id AS message_id, p.email_address AS from_email,
           p.domain AS from_domain
    FROM live m JOIN participants p ON p.id = m.sender_id
), vm AS (
    SELECT m.size_estimate,
           COALESCE(ms.from_email, ds.from_email, '') AS from_email,
           COALESCE(ms.from_domain, ds.from_domain, '') AS from_domain
    FROM live m
    LEFT JOIN ms ON ms.message_id = m.id
    LEFT JOIN ds ON ds.message_id = m.id
)
SELECT from_domain AS domain,
       COUNT(*) AS message_count,
       COUNT(DISTINCT from_email) AS sender_count,
       CAST(SUM(size_estimate) AS BIGINT) AS total_size
FROM vm
WHERE from_domain != ''
GROUP BY from_domain
ORDER BY message_count DESC, domain ASC
LIMIT 50
"""
    ),
)
def raw_sql_v_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-SQL surface (§3.3): user SQL over the registered convenience
    views (views.py, reference views.go:346-489) — here querying v_domains
    directly with spark.sql."""
    from msgvault_spark.views import register_archive_views

    register_archive_views(spark, get_archive(spark, sf_dir))
    return spark.sql(
        """
        SELECT domain, message_count, sender_count, total_size
        FROM v_domains
        ORDER BY message_count DESC, domain ASC
        LIMIT 50
        """
    )

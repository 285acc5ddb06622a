"""Registered archive views: the reference's raw-SQL surface.

`msgvault query` registers 8 base views plus 5 convenience views over the
Parquet cache (reference internal/query/views.go:129-341,346-489); user SQL
runs against them (§3.3). Spark twin: temp views over the archive
DataFrames — `spark.sql` is then a strict superset of the reference's
DuckDB dialect surface.

View semantics (translated from views.go:346-489):
  v_messages  one row per live message + resolved sender columns
  v_senders   per-sender rollup (count, total_size, first/last timestamps)
  v_domains   per-domain rollup
  v_labels    per-label rollup through the junction
  v_threads   per-conversation rollup (count, participants, last message)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from msgvault_spark.plans.aggregate import live_messages


def register_archive_views(
    spark: SparkSession, archive: dict[str, DataFrame]
) -> None:
    """Register the 8 base tables + 5 convenience views."""
    for name, df in archive.items():
        df.createOrReplaceTempView(name)

    msg = live_messages(archive["messages"])
    msg.createOrReplaceTempView("live_messages")

    # resolved sender per message: first 'from' row (min participant_id),
    # falling back to the direct sender_id path (views.go:346-404 / J6)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW v_messages AS
        WITH ms AS (
            SELECT mr.message_id,
                   MIN_BY(p.email_address, mr.participant_id) AS from_email,
                   MIN_BY(COALESCE(NULLIF(TRIM(p.display_name), ''),
                                   NULLIF(p.phone_number, ''),
                                   p.email_address, ''),
                          mr.participant_id) AS from_name,
                   MIN_BY(p.domain, mr.participant_id) AS from_domain
            FROM message_recipients mr
            JOIN participants p ON p.id = mr.participant_id
            WHERE mr.recipient_type = 'from'
            GROUP BY mr.message_id
        ), ds AS (
            SELECT m.id AS message_id,
                   p.email_address AS from_email,
                   COALESCE(NULLIF(TRIM(p.display_name), ''),
                            NULLIF(p.phone_number, ''),
                            p.email_address, '') AS from_name,
                   p.domain AS from_domain
            FROM live_messages m JOIN participants p ON p.id = m.sender_id
        )
        SELECT m.*,
               COALESCE(ms.from_email, ds.from_email, '') AS from_email,
               COALESCE(ms.from_name, ds.from_name, '') AS from_name,
               COALESCE(ms.from_domain, ds.from_domain, '') AS from_domain
        FROM live_messages m
        LEFT JOIN ms ON ms.message_id = m.id
        LEFT JOIN ds ON ds.message_id = m.id
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW v_senders AS
        SELECT from_email AS sender,
               ANY_VALUE(from_name) AS sender_name,
               COUNT(*) AS message_count,
               CAST(SUM(size_estimate) AS BIGINT) AS total_size,
               MIN(sent_at) AS first_message_at,
               MAX(sent_at) AS last_message_at
        FROM v_messages
        WHERE from_email != ''
        GROUP BY from_email
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW v_domains AS
        SELECT from_domain AS domain,
               COUNT(*) AS message_count,
               COUNT(DISTINCT from_email) AS sender_count,
               CAST(SUM(size_estimate) AS BIGINT) AS total_size
        FROM v_messages
        WHERE from_domain != ''
        GROUP BY from_domain
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW v_labels AS
        SELECT l.name AS label,
               COUNT(*) AS message_count,
               CAST(SUM(m.size_estimate) AS BIGINT) AS total_size
        FROM live_messages m
        JOIN message_labels ml ON ml.message_id = m.id
        JOIN labels l ON l.id = ml.label_id
        GROUP BY l.name
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW v_threads AS
        SELECT m.conversation_id,
               COUNT(*) AS message_count,
               COUNT(DISTINCT mr.participant_id) AS participant_count,
               MAX(m.sent_at) AS last_message_at
        FROM live_messages m
        JOIN message_recipients mr ON mr.message_id = m.id
        GROUP BY m.conversation_id
        """
    )

"""Deterministic TPC-H-testdata → message-archive adapter.

The driver's correctness gate runs over TPC-H-ish parquet (TESTDATA.md); the
engine's domain is a message archive (FIXTURES.md). This module maps one to
the other with *pure deterministic column expressions* — implemented twice,
once as DataFrame ops (for the Spark engine) and once as a DuckDB SQL CTE
prelude (for the oracle) — so every engine operator can be verified end-to-end
on the driver's data.

Mapping:
  orders      → messages          (order = message, orderdate = sent_at)
  customer    → participants      (ids as-is)     } suppliers offset by
  supplier    → participants      (ids +10^12)    } SUPPLIER_ID_OFFSET
  lineitem    → message_recipients 'to'/'cc'/'bcc' rows (supplier recipients)
  orders      → message_recipients 'from' rows (customer is the sender)
  o_orderpriority / o_orderstatus → labels + message_labels
  lineitem (subset) → attachments
  customer    → conversations (one thread per customer)

Everything integer/string/timestamp-typed; doubles only pass through
``floor()`` so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from msgvault_spark.sources.loader import load_table

# Participant id spaces must stay disjoint at EVERY scale: customers use
# c_custkey verbatim, suppliers are offset. 100000 collided with customer
# keys the moment a scale factor put >100k customers in the table (sf1 has
# 150k; the 51-vs-50 decoration fan-out was the first symptom). 10^12 is
# beyond any plausible key space (TPC-H sf100000 ~ 1.5e10 customers) and
# nowhere near BIGINT overflow for the +suppkey arithmetic.
SUPPLIER_ID_OFFSET = 10**12


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------

def build_archive(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Build the archive tables as DataFrames from a testdata dir."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    # participants: customers ∪ offset suppliers, email derived from nation
    cust_p = (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .select(
            customer.c_custkey.cast("long").alias("id"),
            F.concat(
                F.lit("customer"),
                customer.c_custkey.cast("string"),
                F.lit("@"),
                F.lower(F.regexp_replace(nation.n_name, " ", "-")),
                F.lit(".example.com"),
            ).alias("email_address"),
            F.concat(
                F.lower(F.regexp_replace(nation.n_name, " ", "-")),
                F.lit(".example.com"),
            ).alias("domain"),
            customer.c_name.alias("display_name"),
            F.lit("").alias("phone_number"),
        )
    )
    supp_p = (
        supplier.join(nation, supplier.s_nationkey == nation.n_nationkey)
        .select(
            (supplier.s_suppkey + SUPPLIER_ID_OFFSET).cast("long").alias("id"),
            F.concat(
                F.lit("supplier"),
                supplier.s_suppkey.cast("string"),
                F.lit("@"),
                F.lower(F.regexp_replace(nation.n_name, " ", "-")),
                F.lit(".example.com"),
            ).alias("email_address"),
            F.concat(
                F.lower(F.regexp_replace(nation.n_name, " ", "-")),
                F.lit(".example.com"),
            ).alias("domain"),
            supplier.s_name.alias("display_name"),
            F.lit("").alias("phone_number"),
        )
    )
    participants = cust_p.unionByName(supp_p)

    # messages: one per order; ~1/7 whatsapp, ~1/11 sms (chat path), rest email
    message_type = (
        F.when(F.col("o_orderkey") % 11 == 0, F.lit("sms"))
        .when(F.col("o_orderkey") % 7 == 0, F.lit("whatsapp"))
        .otherwise(F.lit("email"))
    )
    messages = orders.select(
        F.col("o_orderkey").cast("long").alias("id"),
        (F.col("o_orderkey") % 3 + 1).cast("long").alias("source_id"),
        F.concat(F.lit("ord-"), F.col("o_orderkey").cast("string")).alias(
            "source_message_id"
        ),
        F.col("o_custkey").cast("long").alias("conversation_id"),
        F.concat(
            F.col("o_orderpriority"), F.lit(" order "), F.col("o_orderkey").cast("string")
        ).alias("subject"),
        F.concat(F.lit("status "), F.col("o_orderstatus")).alias("snippet"),
        F.col("o_orderdate").alias("sent_at"),
        F.floor(F.col("o_totalprice")).cast("long").alias("size_estimate"),
        (F.col("o_orderkey") % 5 == 0).alias("has_attachments"),
        F.when(F.col("o_orderkey") % 5 == 0, (F.col("o_orderkey") % 3 + 1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("attachment_count"),
        F.lit(None).cast("timestamp").alias("deleted_from_source_at"),
        F.when(message_type != "email", F.col("o_custkey").cast("long")).alias(
            "sender_id"
        ),
        message_type.alias("message_type"),
        F.year("o_orderdate").cast("int").alias("year"),
        F.month("o_orderdate").cast("int").alias("month"),
    )

    # message_recipients: 'from' = customer; 'to'/'cc'/'bcc' = suppliers
    from_rows = orders.select(
        F.col("o_orderkey").cast("long").alias("message_id"),
        F.col("o_custkey").cast("long").alias("participant_id"),
        F.lit("from").alias("recipient_type"),
        F.lit("").alias("display_name"),
    )
    to_rows = (
        lineitem.select(
            F.col("l_orderkey").cast("long").alias("message_id"),
            (F.col("l_suppkey") + SUPPLIER_ID_OFFSET).cast("long").alias(
                "participant_id"
            ),
            F.when(F.col("l_linenumber") == 3, F.lit("cc"))
            .when(F.col("l_linenumber") == 4, F.lit("bcc"))
            .otherwise(F.lit("to"))
            .alias("recipient_type"),
            F.lit("").alias("display_name"),
        )
        .distinct()
    )
    message_recipients = from_rows.unionByName(to_rows)

    # labels: 5 priorities (id = leading digit) + 3 statuses (ids 11-13)
    prio_labels = orders.select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("id"),
        F.col("o_orderpriority").alias("name"),
    ).distinct()
    status_labels = orders.select(
        (
            F.when(F.col("o_orderstatus") == "P", 11)
            .when(F.col("o_orderstatus") == "O", 12)
            .otherwise(13)
        ).cast("long").alias("id"),
        F.concat(F.lit("status-"), F.col("o_orderstatus")).alias("name"),
    ).distinct()
    labels = prio_labels.unionByName(status_labels)

    message_labels = (
        orders.select(
            F.col("o_orderkey").cast("long").alias("message_id"),
            F.substring("o_orderpriority", 1, 1).cast("long").alias("label_id"),
        )
        .unionByName(
            orders.select(
                F.col("o_orderkey").cast("long").alias("message_id"),
                (
                    F.when(F.col("o_orderstatus") == "P", 11)
                    .when(F.col("o_orderstatus") == "O", 12)
                    .otherwise(13)
                ).cast("long").alias("label_id"),
            )
        )
    )

    # attachments: lineitems of every 5th order, first (1 + key%3) lines
    att_filename = F.concat(
        F.lit("att_"),
        F.col("l_orderkey").cast("string"),
        F.lit("_"),
        F.col("l_linenumber").cast("string"),
        F.lit(".pdf"),
    )
    attachments = lineitem.filter(
        (F.col("l_orderkey") % 5 == 0)
        & (F.col("l_linenumber") <= F.col("l_orderkey") % 3 + 1)
    ).select(
        # attachment primary key (GetAttachment's lookup key): order key ×
        # 10 + line number — unique per LOGICAL attachment, but the
        # testdata lineitem is not PK-clean ((l_orderkey, l_linenumber)
        # repeats, see plans/lookup.py), so the id can repeat across
        # duplicate rows; the PK-read groupBy dedup in get_attachments is
        # what guarantees one row per id
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long")
        .alias("id"),
        F.col("l_orderkey").cast("long").alias("message_id"),
        F.floor(F.col("l_extendedprice")).cast("long").alias("size"),
        att_filename.alias("filename"),
        F.element_at(
            F.array(
                F.lit("application/pdf"),
                F.lit("image/png"),
                F.lit("text/plain"),
            ),
            (F.col("l_linenumber") % 3 + 1).cast("int"),
        ).alias("mime_type"),
        F.sha2(att_filename, 256).alias("content_hash"),
    )

    conversations = customer.select(
        F.col("c_custkey").cast("long").alias("id"),
        F.concat(F.lit("conv-"), F.col("c_custkey").cast("string")).alias(
            "source_conversation_id"
        ),
        F.lit("").alias("title"),
    )

    # sources dim (reference schema.sql:9-28; the 8th RequiredParquetDir,
    # duckdb.go:1804-1813): message source_id is synthesized 1..3 above —
    # two gmail accounts and one imap, so gmail-scoped surfaces
    # (GetGmailIDsByFilter) have a non-trivial predicate to prove
    sources = spark.range(1, 4).select(
        F.col("id").cast("long").alias("id"),
        F.when(F.col("id") == 3, F.lit("imap"))
        .otherwise(F.lit("gmail"))
        .alias("source_type"),
        F.concat(
            F.lit("account"), F.col("id").cast("string"), F.lit("@example.com")
        ).alias("identifier"),
    )

    return {
        "messages": messages,
        "message_recipients": message_recipients,
        "participants": participants,
        "labels": labels,
        "message_labels": message_labels,
        "attachments": attachments,
        "conversations": conversations,
        "sources": sources,
    }


# ---------------------------------------------------------------------------
# DuckDB oracle side — the same mapping as a SQL CTE prelude.  Each
# engine-backed oracle query is  ARCHIVE_SQL_PRELUDE + "SELECT …".
# Table names the driver pre-registers: region nation customer supplier part
# orders lineitem events documents embeddings.
# ---------------------------------------------------------------------------

ARCHIVE_SQL_PRELUDE = f"""
WITH participants AS (
    SELECT CAST(c_custkey AS BIGINT) AS id,
           'customer' || CAST(c_custkey AS VARCHAR) || '@' ||
               lower(replace(n_name, ' ', '-')) || '.example.com' AS email_address,
           lower(replace(n_name, ' ', '-')) || '.example.com' AS domain,
           c_name AS display_name,
           '' AS phone_number
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    UNION ALL
    SELECT CAST(s_suppkey + {SUPPLIER_ID_OFFSET} AS BIGINT) AS id,
           'supplier' || CAST(s_suppkey AS VARCHAR) || '@' ||
               lower(replace(n_name, ' ', '-')) || '.example.com' AS email_address,
           lower(replace(n_name, ' ', '-')) || '.example.com' AS domain,
           s_name AS display_name,
           '' AS phone_number
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
),
messages AS (
    SELECT CAST(o_orderkey AS BIGINT) AS id,
           CAST(o_orderkey % 3 + 1 AS BIGINT) AS source_id,
           'ord-' || CAST(o_orderkey AS VARCHAR) AS source_message_id,
           CAST(o_custkey AS BIGINT) AS conversation_id,
           o_orderpriority || ' order ' || CAST(o_orderkey AS VARCHAR) AS subject,
           'status ' || o_orderstatus AS snippet,
           o_orderdate AS sent_at,
           CAST(floor(o_totalprice) AS BIGINT) AS size_estimate,
           (o_orderkey % 5 = 0) AS has_attachments,
           CAST(CASE WHEN o_orderkey % 5 = 0 THEN o_orderkey % 3 + 1 ELSE 0 END
                AS INTEGER) AS attachment_count,
           CAST(NULL AS TIMESTAMP) AS deleted_from_source_at,
           CASE WHEN o_orderkey % 11 = 0 OR o_orderkey % 7 = 0
                THEN CAST(o_custkey AS BIGINT) END AS sender_id,
           CASE WHEN o_orderkey % 11 = 0 THEN 'sms'
                WHEN o_orderkey % 7 = 0 THEN 'whatsapp'
                ELSE 'email' END AS message_type,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS year,
           CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS month
    FROM orders
),
message_recipients AS (
    SELECT CAST(o_orderkey AS BIGINT) AS message_id,
           CAST(o_custkey AS BIGINT) AS participant_id,
           'from' AS recipient_type,
           '' AS display_name
    FROM orders
    UNION ALL
    SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS message_id,
           CAST(l_suppkey + {SUPPLIER_ID_OFFSET} AS BIGINT) AS participant_id,
           CASE WHEN l_linenumber = 3 THEN 'cc'
                WHEN l_linenumber = 4 THEN 'bcc'
                ELSE 'to' END AS recipient_type,
           '' AS display_name
    FROM lineitem
),
labels AS (
    SELECT DISTINCT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS id,
           o_orderpriority AS name
    FROM orders
    UNION ALL
    SELECT DISTINCT CAST(CASE o_orderstatus WHEN 'P' THEN 11 WHEN 'O' THEN 12
                         ELSE 13 END AS BIGINT) AS id,
           'status-' || o_orderstatus AS name
    FROM orders
),
message_labels AS (
    SELECT CAST(o_orderkey AS BIGINT) AS message_id,
           CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS label_id
    FROM orders
    UNION ALL
    SELECT CAST(o_orderkey AS BIGINT) AS message_id,
           CAST(CASE o_orderstatus WHEN 'P' THEN 11 WHEN 'O' THEN 12
                ELSE 13 END AS BIGINT) AS label_id
    FROM orders
),
attachments AS (
    SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS id,
           CAST(l_orderkey AS BIGINT) AS message_id,
           CAST(floor(l_extendedprice) AS BIGINT) AS size,
           'att_' || CAST(l_orderkey AS VARCHAR) || '_' ||
               CAST(l_linenumber AS VARCHAR) || '.pdf' AS filename,
           ['application/pdf', 'image/png', 'text/plain']
               [CAST(l_linenumber % 3 + 1 AS INT)] AS mime_type,
           sha256('att_' || CAST(l_orderkey AS VARCHAR) || '_' ||
               CAST(l_linenumber AS VARCHAR) || '.pdf') AS content_hash
    FROM lineitem
    WHERE l_orderkey % 5 = 0 AND l_linenumber <= l_orderkey % 3 + 1
),
conversations AS (
    SELECT CAST(c_custkey AS BIGINT) AS id,
           'conv-' || CAST(c_custkey AS VARCHAR) AS source_conversation_id,
           '' AS title
    FROM customer
),
sources AS (
    SELECT CAST(range AS BIGINT) AS id,
           CASE WHEN range = 3 THEN 'imap' ELSE 'gmail' END AS source_type,
           'account' || CAST(range AS VARCHAR) || '@example.com' AS identifier
    FROM range(1, 4)
)
"""


def oracle(select_sql: str) -> str:
    """Wrap a final SELECT with the archive CTE prelude."""
    return ARCHIVE_SQL_PRELUDE + select_sql

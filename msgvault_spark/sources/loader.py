"""Parquet sources with canonicalizing projections and tolerant schemas.

The reference normalizes every scan with ``SELECT * REPLACE (CAST …)`` CTEs
and probes for optional columns, synthesizing defaults when absent
(reference: internal/query/duckdb.go:262-310, internal/query/views.go:23-111).
Spark-first equivalent: ``mergeSchema`` readers + one canonicalizing
projection per table (cast + coalesce), applied lazily so Catalyst still
pushes filters/pruning into the parquet scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. mergeSchema tolerates drift across files
    (reference probes DESCRIBE output for the same purpose, views.go:26-56).

    ``events`` is written with nanosecond timestamps, which the vectorized
    Spark parquet reader rejects; read them as raw int64 nanos
    (legacy.parquet.nanosAsLong) and rebuild a microsecond timestamp with
    integer division (never through double — ns-since-epoch exceeds 2^53).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _ntz_to_ltz(df)
    return _ntz_to_ltz(spark.read.option("mergeSchema", "true").parquet(path))


def _ntz_to_ltz(df: DataFrame) -> DataFrame:
    """Canonicalize TIMESTAMP_NTZ columns to TIMESTAMP (LTZ). Parquet files
    whose timestamps carry isAdjustedToUTC=false surface as NTZ under Spark
    4's inferTimestampNTZ default; with the session timezone pinned to UTC
    (session.py) the LTZ cast is value-identical, and downstream epoch
    arithmetic (``cast(ts as bigint)``) — legal on LTZ, rejected on NTZ —
    keeps working regardless of which writer produced the lake."""
    ntz = [f.name for f in df.schema.fields
           if isinstance(f.dataType, T.TimestampNTZType)]
    if not ntz:
        return df
    return df.select(
        *[F.col(c).cast("timestamp").alias(c) if c in ntz else F.col(c)
          for c in df.columns]
    )


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (raw-SQL surface, the
    reference's RegisterViews analogue, views.go:129-341)."""
    dfs = load_testdata(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


# ---------------------------------------------------------------------------
# Canonical message-archive schemas (FIXTURES.md §1-7; reference DDL
# internal/store/schema.sql + export queries cmd/msgvault/cmd/build_cache.go)
# ---------------------------------------------------------------------------

MESSAGES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("source_id", T.LongType()),
        T.StructField("source_message_id", T.StringType()),
        T.StructField("conversation_id", T.LongType()),
        T.StructField("subject", T.StringType()),
        T.StructField("snippet", T.StringType()),
        T.StructField("sent_at", T.TimestampType()),
        T.StructField("size_estimate", T.LongType()),
        T.StructField("has_attachments", T.BooleanType()),
        T.StructField("attachment_count", T.IntegerType()),
        T.StructField("deleted_from_source_at", T.TimestampType()),
        T.StructField("sender_id", T.LongType()),
        T.StructField("message_type", T.StringType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("month", T.IntegerType()),
    ]
)

MESSAGE_RECIPIENTS_SCHEMA = T.StructType(
    [
        T.StructField("message_id", T.LongType()),
        T.StructField("participant_id", T.LongType()),
        T.StructField("recipient_type", T.StringType()),
        T.StructField("display_name", T.StringType()),
    ]
)

PARTICIPANTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("email_address", T.StringType()),
        T.StructField("domain", T.StringType()),
        T.StructField("display_name", T.StringType()),
        T.StructField("phone_number", T.StringType()),
    ]
)

LABELS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)

MESSAGE_LABELS_SCHEMA = T.StructType(
    [
        T.StructField("message_id", T.LongType()),
        T.StructField("label_id", T.LongType()),
    ]
)

ATTACHMENTS_SCHEMA = T.StructType(
    [
        T.StructField("message_id", T.LongType()),
        T.StructField("size", T.LongType()),
        T.StructField("filename", T.StringType()),
        # GetAttachment surface (engine.go:29): primary key + metadata;
        # appended so older cached archives canonicalize with NULLs
        T.StructField("id", T.LongType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("content_hash", T.StringType()),
    ]
)

CONVERSATIONS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("source_conversation_id", T.StringType()),
        T.StructField("title", T.StringType()),
    ]
)

ARCHIVE_SCHEMAS: dict[str, T.StructType] = {
    "messages": MESSAGES_SCHEMA,
    "message_recipients": MESSAGE_RECIPIENTS_SCHEMA,
    "participants": PARTICIPANTS_SCHEMA,
    "labels": LABELS_SCHEMA,
    "message_labels": MESSAGE_LABELS_SCHEMA,
    "attachments": ATTACHMENTS_SCHEMA,
    "conversations": CONVERSATIONS_SCHEMA,
}


def canonicalize(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Type-normalizing projection (operator P1): cast existing columns to the
    canonical type, synthesize NULL-typed columns for missing ones. Stays a
    pure projection so pushdown/pruning still reach the scan."""
    existing = {f.name.lower(): f.name for f in df.schema.fields}
    cols = []
    for field in schema.fields:
        src = existing.get(field.name.lower())
        if src is not None:
            cols.append(F.col(src).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def load_archive(spark: SparkSession, base_dir: str) -> dict[str, DataFrame]:
    """Load a message-archive parquet lake (the reference's analytics cache
    layout: messages/ hive-partitioned by year, flat dims; duckdb.go:1804-1813)
    and canonicalize each table."""
    out: dict[str, DataFrame] = {}
    for name, schema in ARCHIVE_SCHEMAS.items():
        path = os.path.join(base_dir, name)
        if not os.path.exists(path):
            path = os.path.join(base_dir, f"{name}.parquet")
        df = spark.read.option("mergeSchema", "true").parquet(path)
        out[name] = canonicalize(df, schema)
    return out

"""Filtered message listing with two-phase pagination.

Rebuild of ListMessages (reference internal/query/duckdb.go:1213-1310):
phase 1 sorts/pages bare message ids, phase 2 decorates only the page with
sender resolution + conversation metadata, then re-sorts the (tiny) page.
OFFSET uses the native offset().limit() — one distributed
TakeOrderedAndProject(limit=offset+limit, offset), a per-partition k-heap
plus a single reduce; the scalable shape at 100 TB.

Sender resolution is the dual path (J6): FIRST 'from'-recipient per message —
made deterministic with min_by over participant_id, unlike the reference's
unordered FIRST() — with fallback to messages.sender_id (chat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from msgvault_spark.operators.present import present_sorted

from msgvault_spark.plans.filters import apply_message_filter
from msgvault_spark.plans.models import (
    MessageFilter,
    MessageSortField,
    SortDirection,
)


def _sort_cols(filter_: MessageFilter):
    field = {
        MessageSortField.DATE: "sent_at",
        MessageSortField.SIZE: "size_estimate",
        MessageSortField.SUBJECT: "subject",
    }[filter_.sorting.field]
    primary = F.col(field)
    if filter_.sorting.direction == SortDirection.DESC:
        # deterministic tie-break (O6, reference duckdb.go:1772)
        return [primary.desc(), F.col("id").desc()]
    return [primary.asc(), F.col("id").asc()]


def list_messages(
    archive: dict[str, DataFrame], filter_: MessageFilter
) -> DataFrame:
    msg_all = archive["messages"]
    filtered = apply_message_filter(archive, filter_)
    order = _sort_cols(filter_)
    limit = filter_.pagination.limit or 500
    offset = filter_.pagination.offset

    # ---- phase 1: page of ids only ----------------------------------------
    # native OFFSET (O4): TakeOrderedAndProject(limit=offset+limit, offset)
    # — per-partition k-heap + one reduce, never the single-partition
    # global window a row_number() spelling would force
    if offset:
        page_ids = (
            filtered.orderBy(*order).offset(offset).limit(limit).select("id")
        )
    else:
        page_ids = filtered.orderBy(*order).limit(limit).select("id")

    page = msg_all.join(F.broadcast(page_ids), "id", "left_semi")

    # ---- phase 2: decorate the page ---------------------------------------
    # rename-projections + string refs throughout (no df["col"] attribute
    # references) so participants can appear on both sender paths without
    # self-join ambiguity
    mr = archive["message_recipients"]
    p_ren = archive["participants"].select(
        F.col("id").alias("p_id"),
        F.col("email_address").alias("p_email"),
        F.col("display_name").alias("p_display"),
        F.col("phone_number").alias("p_phone"),
    )
    conv = archive["conversations"].select(
        F.col("id").alias("conv_id"),
        F.col("source_conversation_id").alias("c_source_conversation_id"),
        F.col("title").alias("c_title"),
    )

    page_from = mr.filter(F.col("recipient_type") == "from").join(
        F.broadcast(page.select(F.col("id").alias("message_id"))),
        "message_id",
        "left_semi",
    )
    sender_rows = page_from.join(
        F.broadcast(p_ren), F.col("participant_id") == F.col("p_id")
    ).select(
        F.col("message_id"),
        F.col("p_email").alias("_email"),
        F.coalesce(
            F.when(F.trim(F.col("display_name")) != "", F.trim(F.col("display_name"))),
            F.when(F.trim(F.col("p_display")) != "", F.trim(F.col("p_display"))),
            F.when(F.col("p_phone") != "", F.col("p_phone")),
            F.col("p_email"),
            F.lit(""),
        ).alias("_name"),
        F.coalesce(F.col("p_phone"), F.lit("")).alias("_phone"),
        F.col("participant_id").alias("_pid"),
    )
    # deterministic FIRST(): take the row with the smallest participant_id
    msg_sender = sender_rows.groupBy("message_id").agg(
        F.min_by("_email", "_pid").alias("from_email"),
        F.min_by("_name", "_pid").alias("from_name"),
        F.min_by("_phone", "_pid").alias("from_phone"),
    )

    direct_sender = (
        page.filter(F.col("sender_id").isNotNull())
        .join(F.broadcast(p_ren), F.col("sender_id") == F.col("p_id"))
        .select(
            F.col("id").alias("d_message_id"),
            F.coalesce(F.col("p_email"), F.lit("")).alias("d_from_email"),
            F.coalesce(F.col("p_display"), F.lit("")).alias("d_from_name"),
            F.coalesce(F.col("p_phone"), F.lit("")).alias("d_from_phone"),
        )
    )

    out = (
        page.join(F.broadcast(msg_sender), F.col("id") == F.col("message_id"), "left")
        .join(F.broadcast(direct_sender), F.col("id") == F.col("d_message_id"), "left")
        .join(F.broadcast(conv), F.col("conversation_id") == F.col("conv_id"), "left")
        .select(
            F.col("id"),
            F.coalesce(F.col("source_message_id"), F.lit("")).alias(
                "source_message_id"
            ),
            F.coalesce(F.col("conversation_id"), F.lit(0)).alias("conversation_id"),
            F.coalesce(F.col("c_source_conversation_id"), F.lit("")).alias(
                "source_conversation_id"
            ),
            F.coalesce(F.col("subject"), F.lit("")).alias("subject"),
            F.coalesce(F.col("snippet"), F.lit("")).alias("snippet"),
            F.coalesce(F.col("from_email"), F.col("d_from_email"), F.lit("")).alias(
                "from_email"
            ),
            F.coalesce(F.col("from_name"), F.col("d_from_name"), F.lit("")).alias(
                "from_name"
            ),
            F.coalesce(F.col("from_phone"), F.col("d_from_phone"), F.lit("")).alias(
                "from_phone"
            ),
            F.col("sent_at"),
            F.coalesce(F.col("size_estimate"), F.lit(0)).alias("size_estimate"),
            F.coalesce(F.col("has_attachments"), F.lit(False)).alias(
                "has_attachments"
            ),
            F.coalesce(F.col("attachment_count"), F.lit(0)).alias("attachment_count"),
            F.coalesce(F.col("message_type"), F.lit("")).alias("message_type"),
            F.coalesce(F.col("c_title"), F.lit("")).alias("conv_title"),
        )
        .transform(present_sorted, *_sort_cols(filter_))
    )
    return out


def list_with_labels(
    archive: dict[str, DataFrame], filter_: MessageFilter
) -> DataFrame:
    """Listing decorated with a sorted label-name array (A6, reference
    duckdb.go:1857-1862): page-scoped label lookup, not a full-table join."""
    base = list_messages(archive, filter_)
    ml = archive["message_labels"]
    lbl = archive["labels"]
    page_labels = (
        ml.join(F.broadcast(base.select(F.col("id").alias("message_id"))), "message_id", "left_semi")
        .join(F.broadcast(lbl), ml["label_id"] == lbl["id"])
        .groupBy("message_id")
        .agg(F.array_sort(F.collect_list(lbl["name"])).alias("labels"))
    )
    return (
        base.join(
            F.broadcast(page_labels), base["id"] == page_labels["message_id"], "left"
        )
        .drop("message_id")
        .withColumn(
            "labels", F.coalesce(F.col("labels"), F.array().cast("array<string>"))
        )
    )

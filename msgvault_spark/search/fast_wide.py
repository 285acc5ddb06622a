"""Fast search + listing over the denormalized wide view.

Same user-visible semantics as search/fast.py and plans/listing.py for the
single-'from'-row case, but compiled against the wide view: every predicate
— including from:/text-term/sender-field matches — is a column filter on ONE
scan, no joins until the (tiny) page decoration. This is the 100 TB shape:
the wide view is the columnar search index, filters push into parquet, and
a query is scan → filter → top-k.

Recipient (to:/cc:/bcc:/recipient) filters compile to EXISTS over the wide
row's denormalized recipient_emails/recipient_phones arrays — one scan, no
junction-table shuffle — mirroring the reference's denormalized search
columns (internal/query/duckdb.go:719-770, SURVEY §1.1). Semantics match
the join path's semi-join exactly: to:/cc:/bcc: all probe the merged
to∪cc∪bcc set (search/fast.py), ilike on email-or-phone; `recipient` is
exact equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from msgvault_spark.functions.text import (
    email_only_predicate,
    ilike_contains,
    ilike_endswith,
    ilike_equals,
    time_key,
)
from msgvault_spark.plans.models import (
    MessageFilter,
    MessageSortField,
    SortDirection,
    infer_time_granularity,
)
from msgvault_spark.search.parser import ParsedQuery, parse_query


# lowered-contains compilation of ILIKE '%escaped%' (functions/text.py)
_ilike = ilike_contains


def compile_search_wide(
    wide: DataFrame,
    q: ParsedQuery,
    filter_: MessageFilter | None = None,
    email_only: bool = True,
) -> DataFrame:
    filter_ = filter_ or MessageFilter()
    df = wide
    if "deleted_at" in df.columns:
        df = df.filter(F.col("deleted_at").isNull())
    if filter_.hide_deleted_from_source:
        df = df.filter(F.col("deleted_from_source_at").isNull())
    if email_only:
        df = df.filter(email_only_predicate())

    source_ids = filter_.source_ids if filter_.source_ids is not None else (
        q.account_ids or None
    )
    if source_ids is not None:
        df = df.filter(
            F.col("source_id").isin(*source_ids) if source_ids else F.lit(False)
        )
    for after in (filter_.after, q.after_date):
        if after is not None:
            df = df.filter(F.col("sent_at") >= F.lit(after))
    for before in (filter_.before, q.before_date):
        if before is not None:
            df = df.filter(F.col("sent_at") < F.lit(before))
    if filter_.with_attachments_only or q.has_attachment:
        df = df.filter(F.col("has_attachments") == F.lit(True))
    if q.larger_than is not None:
        df = df.filter(F.col("size_estimate") > q.larger_than)
    if q.smaller_than is not None:
        df = df.filter(F.col("size_estimate") < q.smaller_than)
    if filter_.time_period:
        g = infer_time_granularity(filter_.time_granularity, filter_.time_period)
        df = df.filter(time_key(g) == filter_.time_period)
    for term in q.subject_terms:
        df = df.filter(_ilike(F.col("subject"), term))
    if filter_.sender:
        df = df.filter(
            (F.col("from_email") == filter_.sender)
            | (F.col("from_phone") == filter_.sender)
        )
    if filter_.domain:
        df = df.filter(
            ilike_endswith(F.col("from_email"), "@" + filter_.domain)
        )
    for addr in q.from_addrs:
        df = df.filter(
            _ilike(F.col("from_email"), addr)
            | _ilike(F.col("from_phone"), addr)
            | _ilike(F.col("from_name"), addr)
        )
    # factory closures: a higher-order lambda must stay single-parameter
    # (PySpark feeds the array index to any second parameter)
    def _elem_equals(term: str):
        return lambda x: ilike_equals(x, term)

    def _elem_contains(term: str):
        return lambda x: ilike_contains(x, term)

    if filter_.label:
        df = df.filter(F.exists("labels", _elem_equals(filter_.label)))
    for label in q.labels:
        df = df.filter(F.exists("labels", _elem_contains(label)))
    for term in q.text_terms:
        df = df.filter(
            _ilike(F.col("subject"), term)
            | _ilike(F.coalesce(F.col("snippet"), F.lit("")), term)
            | _ilike(F.col("from_email"), term)
            | _ilike(F.col("from_name"), term)
            | _ilike(F.col("from_phone"), term)
        )
    # to:/cc:/bcc: probe the merged to∪cc∪bcc arrays, same as the join
    # path's _recipient_ids(("to","cc","bcc"), email ILIKE | phone ILIKE).
    # Fast path: the operator value is a LITERAL substring, and a literal
    # without '\n' cannot span a '\n' join boundary, so lowered-contains
    # over concat_ws("\n", array) is exactly exists(array, ILIKE) — and
    # stays inside whole-stage codegen, where the array-exists
    # higher-order function drops to interpreted evaluation (~4× slower
    # per scan).
    for addr in q.to_addrs + q.cc_addrs + q.bcc_addrs:
        if addr == "":
            # join-path parity: an empty operator value ('to:') matches
            # messages with at least one recipient row whose email OR
            # phone is non-NULL ('' ILIKE '%%' is true, NULL is not);
            # '%%' over the concat would instead match EVERY message
            df = df.filter(
                (F.size(F.col("recipient_emails")) > 0)
                | (F.size(F.col("recipient_phones")) > 0)
            )
            continue
        if "\n" in addr:
            df = df.filter(
                F.exists("recipient_emails", _elem_contains(addr))
                | F.exists("recipient_phones", _elem_contains(addr))
            )
        elif "recipient_emails_lc" in df.columns:
            # pre-lowered build-time blobs (sources/cache.py): the scan
            # reads two flat strings instead of decoding both arrays and
            # lowering their concat per row; contains(lower(lit)) is the
            # identical predicate (blob = lower(concat_ws("\n", arr)))
            df = df.filter(
                F.col("recipient_emails_lc").contains(F.lower(F.lit(addr)))
                | F.col("recipient_phones_lc").contains(F.lower(F.lit(addr)))
            )
        else:
            df = df.filter(
                ilike_contains(F.concat_ws("\n", F.col("recipient_emails")), addr)
                | ilike_contains(F.concat_ws("\n", F.col("recipient_phones")), addr)
            )
    if filter_.recipient:
        df = df.filter(
            F.array_contains("recipient_emails", filter_.recipient)
            | F.array_contains("recipient_phones", filter_.recipient)
        )
    return df


def search_fast_wide(
    wide: DataFrame,
    query: str | ParsedQuery,
    filter_: MessageFilter | None = None,
    limit: int = 100,
) -> DataFrame:
    q = parse_query(query) if isinstance(query, str) else query
    df = compile_search_wide(wide, q, filter_)
    return (
        df.select(
            "id",
            F.coalesce(F.col("subject"), F.lit("")).alias("subject"),
            F.coalesce(F.col("snippet"), F.lit("")).alias("snippet"),
            F.coalesce(F.col("from_email"), F.lit("")).alias("from_email"),
            F.coalesce(F.col("from_name"), F.lit("")).alias("from_name"),
            "sent_at",
            F.coalesce(F.col("size_estimate"), F.lit(0)).alias("size_estimate"),
            F.coalesce(F.col("has_attachments"), F.lit(False)).alias(
                "has_attachments"
            ),
        )
        .orderBy(F.col("sent_at").desc(), F.col("id").desc())
        .limit(limit)
    )


def list_messages_wide(
    wide: DataFrame,
    conversations: DataFrame,
    filter_: MessageFilter,
) -> DataFrame:
    """Two-phase listing where phase 2 is a single broadcast join against
    conversations — sender fields and labels already ride on the wide row."""
    df = compile_search_wide(wide, ParsedQuery(), filter_, email_only=False)
    field = {
        MessageSortField.DATE: "sent_at",
        MessageSortField.SIZE: "size_estimate",
        MessageSortField.SUBJECT: "subject",
    }[filter_.sorting.field]
    primary = F.col(field)
    order = (
        [primary.desc(), F.col("id").desc()]
        if filter_.sorting.direction == SortDirection.DESC
        else [primary.asc(), F.col("id").asc()]
    )
    limit = filter_.pagination.limit or 500
    offset = filter_.pagination.offset
    # native OFFSET (O4): distributed TakeOrdered, not a global window
    if offset:
        page = df.orderBy(*order).offset(offset).limit(limit)
    else:
        page = df.orderBy(*order).limit(limit)

    conv = conversations.select(
        F.col("id").alias("conv_id"),
        F.col("source_conversation_id").alias("c_source_conversation_id"),
        F.col("title").alias("c_title"),
    )
    return (
        page.join(F.broadcast(conv), F.col("conversation_id") == F.col("conv_id"), "left")
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
            F.coalesce(F.col("from_email"), F.lit("")).alias("from_email"),
            F.coalesce(F.col("from_name"), F.lit("")).alias("from_name"),
            F.coalesce(F.col("from_phone"), F.lit("")).alias("from_phone"),
            F.col("sent_at"),
            F.coalesce(F.col("size_estimate"), F.lit(0)).alias("size_estimate"),
            F.coalesce(F.col("has_attachments"), F.lit(False)).alias(
                "has_attachments"
            ),
            F.coalesce(F.col("attachment_count"), F.lit(0)).alias(
                "attachment_count"
            ),
            F.coalesce(F.col("message_type"), F.lit("")).alias("message_type"),
            F.coalesce(F.col("c_title"), F.lit("")).alias("conv_title"),
        )
        .orderBy(*order)
    )

"""Catalog entries: ETL sink roundtrip (S5/S6), conversation stats (A10),
text-modality aggregates (A11), empty-bucket anti-join drilldowns (P11).

Registered into the main CATALOG via the import at the tail of catalog.py.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from msgvault_spark.catalog import register
from msgvault_spark.operators.present import present_sorted
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
        .transform(present_sorted, "year")
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
        .transform(present_sorted, "year")
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


# ---------------------------------------------------------------------------
# TextEngine completion (round 3): the three reference TextEngine methods
# that had no repo mirror yet — ListConversationMessages, TextSearch,
# GetTextStats (reference internal/query/text_engine.go:20-28).
# ---------------------------------------------------------------------------

_TEXT_TYPES_SQL = "('whatsapp', 'imessage', 'sms', 'google_voice_text')"


@register(
    "list_conversation_messages",
    oracle(
        f"""
, txt AS (
    SELECT * FROM messages
    WHERE message_type IN {_TEXT_TYPES_SQL}
      AND deleted_from_source_at IS NULL
),
target AS (
    SELECT conversation_id FROM txt
    GROUP BY conversation_id
    ORDER BY COUNT(*) DESC, conversation_id ASC
    LIMIT 1
),
m AS (SELECT t.* FROM txt t JOIN target USING (conversation_id)),
sender AS (
    SELECT mr.message_id,
           min(mr.participant_id) AS pid,
           min_by(mr.display_name, mr.participant_id) AS mr_name
    FROM message_recipients mr JOIN m ON m.id = mr.message_id
    WHERE mr.recipient_type = 'from'
    GROUP BY mr.message_id
)
SELECT m.id, m.source_message_id, m.conversation_id,
       COALESCE(c.source_conversation_id, '') AS source_conversation_id,
       COALESCE(m.subject, '') AS subject,
       COALESCE(m.snippet, '') AS snippet,
       COALESCE(p.email_address, '') AS from_email,
       COALESCE(NULLIF(TRIM(s.mr_name), ''), NULLIF(TRIM(p.display_name), ''),
                NULLIF(p.phone_number, ''), p.email_address, '') AS from_name,
       COALESCE(p.phone_number, '') AS from_phone,
       m.sent_at,
       CAST(m.size_estimate AS BIGINT) AS size_estimate,
       m.has_attachments,
       CAST(m.attachment_count AS INTEGER) AS attachment_count,
       m.message_type,
       COALESCE(c.title, '') AS conv_title
FROM m
LEFT JOIN sender s ON s.message_id = m.id
LEFT JOIN participants p ON p.id = COALESCE(s.pid, m.sender_id)
LEFT JOIN conversations c ON c.id = m.conversation_id
ORDER BY m.sent_at ASC, m.id ASC
LIMIT 500
"""
    ),
)
def list_conversation_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ListConversationMessages (reference text_engine.go:20-21,
    duckdb_text.go:296-391): chronological timeline of ONE conversation
    under the chat-modality predicate, sender resolved first-from-row
    (min_by participant) with the direct sender_id fallback (J6), conv
    title decoration. The target conversation is picked deterministically
    (most text messages, smallest id tiebreak) so the entry is stable at
    every SF. Filtered ids are a broadcast semi-join, never a driver
    collect; decorations are per-message pre-aggregates before the left
    joins — the timeline stays one narrow scan + k broadcast joins."""
    from msgvault_spark.functions.text import text_only_predicate

    arch = get_archive(spark, sf_dir)
    txt = (
        arch["messages"]
        .filter(text_only_predicate())
        .filter(F.col("deleted_from_source_at").isNull())
    )
    target = (
        txt.groupBy("conversation_id")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.col("__n").desc(), F.col("conversation_id").asc())
        .limit(1)
        .select("conversation_id")
    )
    m = txt.join(F.broadcast(target), "conversation_id")
    sender = (
        arch["message_recipients"]
        .filter(F.col("recipient_type") == "from")
        .join(
            F.broadcast(m.select(F.col("id").alias("message_id"))),
            "message_id",
        )
        .groupBy("message_id")
        .agg(
            F.min("participant_id").alias("pid"),
            F.min_by("display_name", "participant_id").alias("mr_name"),
        )
    )
    p = arch["participants"].select(
        F.col("id").alias("p_id"),
        F.col("email_address").alias("p_email"),
        F.col("display_name").alias("p_display"),
        F.col("phone_number").alias("p_phone"),
    )
    c = arch["conversations"].select(
        F.col("id").alias("c_id"),
        F.col("source_conversation_id").alias("c_src"),
        F.col("title").alias("c_title"),
    )
    return (
        m.join(sender, m["id"] == sender["message_id"], "left")
        .drop("message_id")
        .withColumn("sender_pid", F.coalesce(F.col("pid"), F.col("sender_id")))
        .join(F.broadcast(p), F.col("sender_pid") == F.col("p_id"), "left")
        .join(F.broadcast(c), F.col("conversation_id") == F.col("c_id"), "left")
        .select(
            "id",
            "source_message_id",
            "conversation_id",
            F.coalesce(F.col("c_src"), F.lit("")).alias("source_conversation_id"),
            F.coalesce(F.col("subject"), F.lit("")).alias("subject"),
            F.coalesce(F.col("snippet"), F.lit("")).alias("snippet"),
            F.coalesce(F.col("p_email"), F.lit("")).alias("from_email"),
            F.coalesce(
                F.when(F.trim(F.col("mr_name")) != "", F.trim(F.col("mr_name"))),
                F.when(F.trim(F.col("p_display")) != "", F.trim(F.col("p_display"))),
                F.when(F.col("p_phone") != "", F.col("p_phone")),
                F.col("p_email"),
                F.lit(""),
            ).alias("from_name"),
            F.coalesce(F.col("p_phone"), F.lit("")).alias("from_phone"),
            "sent_at",
            F.col("size_estimate").cast("long").alias("size_estimate"),
            "has_attachments",
            F.col("attachment_count").cast("int").alias("attachment_count"),
            "message_type",
            F.coalesce(F.col("c_title"), F.lit("")).alias("conv_title"),
        )
        .orderBy(F.col("sent_at").asc(), F.col("id").asc())
        .limit(500)
    )


@register(
    "text_search_messages",
    oracle(
        f"""
SELECT m.id,
       COALESCE(m.subject, '') AS subject,
       COALESCE(m.snippet, '') AS snippet,
       COALESCE(p.email_address, '') AS from_email,
       m.sent_at,
       m.message_type,
       COALESCE(c.title, '') AS conv_title
FROM messages m
LEFT JOIN participants p ON p.id = m.sender_id
LEFT JOIN conversations c ON c.id = m.conversation_id
WHERE m.message_type IN {_TEXT_TYPES_SQL}
  AND m.deleted_from_source_at IS NULL
  AND list_contains(
        string_split_regex(lower(COALESCE(m.subject, '') || ' ' ||
                                 COALESCE(m.snippet, '')), '[^a-z0-9]+'),
        'urgent')
ORDER BY m.sent_at DESC, m.id DESC
LIMIT 50 OFFSET 10
"""
    ),
)
def text_search_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextSearch (reference text_engine.go:23-25, duckdb_text.go:393-450):
    plain token-match FTS over the chat modality — the FTS5 MATCH
    semantics replayed as tokenize + membership, sent_at DESC with id
    tiebreak, LIMIT/OFFSET pagination (offset via row_number, O4). The
    token test is a pure map pushed to the scan; sender/conversation
    decoration joins are broadcast; OFFSET compiles to one distributed
    TakeOrderedAndProject (per-partition k-heap), not a global window."""
    from msgvault_spark.functions.text import text_only_predicate

    arch = get_archive(spark, sf_dir)
    toks = F.split(
        F.lower(
            F.concat_ws(
                " ",
                F.coalesce(F.col("subject"), F.lit("")),
                F.coalesce(F.col("snippet"), F.lit("")),
            )
        ),
        "[^a-z0-9]+",
    )
    hits = (
        arch["messages"]
        .filter(text_only_predicate())
        .filter(F.col("deleted_from_source_at").isNull())
        .filter(F.array_contains(toks, "urgent"))
    )
    p = arch["participants"].select(
        F.col("id").alias("p_id"), F.col("email_address").alias("p_email")
    )
    c = arch["conversations"].select(
        F.col("id").alias("c_id"), F.col("title").alias("c_title")
    )
    return (
        hits.join(F.broadcast(p), F.col("sender_id") == F.col("p_id"), "left")
        .join(F.broadcast(c), F.col("conversation_id") == F.col("c_id"), "left")
        .select(
            "id",
            F.coalesce(F.col("subject"), F.lit("")).alias("subject"),
            F.coalesce(F.col("snippet"), F.lit("")).alias("snippet"),
            F.coalesce(F.col("p_email"), F.lit("")).alias("from_email"),
            "sent_at",
            "message_type",
            F.coalesce(F.col("c_title"), F.lit("")).alias("conv_title"),
        )
        .orderBy(F.col("sent_at").desc(), F.col("id").desc())
        .offset(10)
        .limit(50)
    )


@register(
    "text_stats_total",
    oracle(
        f"""
, t AS (
    SELECT * FROM messages
    WHERE message_type IN {_TEXT_TYPES_SQL}
      AND deleted_from_source_at IS NULL
      AND (subject ILIKE '%urgent%' ESCAPE '\\'
           OR snippet ILIKE '%urgent%' ESCAPE '\\')
),
att AS (
    SELECT message_id, COUNT(*) AS att_n,
           CAST(SUM(size) AS BIGINT) AS att_sz
    FROM attachments GROUP BY message_id
),
mainq AS (
    SELECT COUNT(*) AS message_count,
           CAST(COALESCE(SUM(CAST(t.size_estimate AS BIGINT)), 0) AS BIGINT)
               AS total_size,
           CAST(COALESCE(SUM(att.att_n), 0) AS BIGINT) AS attachment_count,
           CAST(COALESCE(SUM(att.att_sz), 0) AS BIGINT) AS attachment_size,
           COUNT(DISTINCT t.source_id) AS account_count
    FROM t LEFT JOIN att ON att.message_id = t.id
),
lab AS (
    SELECT COUNT(DISTINCT l.name) AS label_count
    FROM t
    JOIN message_labels ml ON ml.message_id = t.id
    JOIN labels l ON l.id = ml.label_id
)
SELECT mainq.message_count, mainq.total_size, mainq.attachment_count,
       mainq.attachment_size, mainq.account_count, lab.label_count
FROM mainq, lab
"""
    ),
)
def text_stats_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GetTextStats (reference text_engine.go:27-28, duckdb_text.go:452-515):
    global chat-modality stats — message count/size, attachment pre-agg
    sums (A4 before the join), distinct accounts, distinct labels — under
    the optional SearchQuery ILIKE filter (here 'urgent', exercising the
    escape path F8). Two single-row aggregates cross-joined 1×1 (the W1
    broadcast pattern); everything partial-aggregates map-side."""
    from msgvault_spark.functions.text import text_only_predicate

    arch = get_archive(spark, sf_dir)
    t = (
        arch["messages"]
        .filter(text_only_predicate())
        .filter(F.col("deleted_from_source_at").isNull())
        .filter(
            F.lower(F.col("subject")).contains("urgent")
            | F.lower(F.col("snippet")).contains("urgent")
        )
    )
    att = arch["attachments"].groupBy("message_id").agg(
        F.count(F.lit(1)).alias("att_n"),
        F.sum("size").cast("long").alias("att_sz"),
    )
    mainq = (
        t.join(att, t["id"] == att["message_id"], "left")
        .agg(
            F.count(F.lit(1)).alias("message_count"),
            F.coalesce(F.sum(F.col("size_estimate").cast("long")), F.lit(0))
            .cast("long").alias("total_size"),
            F.coalesce(F.sum("att_n"), F.lit(0)).cast("long")
            .alias("attachment_count"),
            F.coalesce(F.sum("att_sz"), F.lit(0)).cast("long")
            .alias("attachment_size"),
            F.countDistinct("source_id").alias("account_count"),
        )
    )
    lbl = arch["labels"].select(
        F.col("id").alias("lbl_id"), F.col("name").alias("lbl_name")
    )
    lab = (
        t.select(F.col("id").alias("message_id"))
        .join(arch["message_labels"], "message_id")
        .join(F.broadcast(lbl), F.col("label_id") == F.col("lbl_id"))
        .agg(F.countDistinct("lbl_name").alias("label_count"))
    )
    return mainq.crossJoin(F.broadcast(lab))


# ---------------------------------------------------------------------------
# Round 3: oracle rows for two previously test-only surfaces (F16, S7)
# ---------------------------------------------------------------------------


@register(
    "encoding_repair_docs",
    """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE WHEN doc_id % 2 = 0 THEN text
            ELSE text || 'ÿþ' END AS repaired
FROM documents WHERE doc_id < 100
ORDER BY doc_id
""",
)
def encoding_repair_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding repair (F16) under the oracle: even docs carry valid
    UTF-8; odd docs get a deliberate invalid-UTF-8 tail (0x07 0xFF 0xFE)
    so strict decode fails and the latin-1 fallback + control-char strip
    must produce text + 'ÿþ' (BEL stripped). The oracle states the known
    repaired form directly — proving the repair INVERTS the corruption,
    not merely that it runs."""
    from msgvault_spark.functions.mime import repair_encoding
    from msgvault_spark.sources.cache import get_table

    docs = (
        get_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    corrupted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0, F.encode(F.col("text"), "UTF-8")
        )
        .otherwise(
            F.concat(
                F.encode(F.col("text"), "UTF-8"),
                F.lit(bytearray(b"\x07\xff\xfe")),
            )
        )
        .alias("raw"),
    )
    return corrupted.select(
        "doc_id", repair_encoding(F.col("raw")).alias("repaired")
    ).sortWithinPartitions("doc_id")


_CSV_MEMO: dict[tuple, str] = {}


@register(
    "csv_roundtrip_stats",
    oracle(
        """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(sender_id) AS BIGINT) AS n_with_sender,
       CAST(SUM(size_estimate) AS BIGINT) AS total_size,
       CAST(COUNT(DISTINCT message_type) AS BIGINT) AS n_types
FROM messages
"""
    ),
)
def csv_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV export/read round trip (S7) under the oracle: messages written
    through the '\\N'-sentinel CSV sink and read back with an explicit
    schema must aggregate identically to the source — the non-null
    sender_id count is the row that catches a broken null sentinel."""
    import tempfile

    from msgvault_spark.api import read_csv_export, write_csv_export

    arch = get_archive(spark, sf_dir)
    cols = ["id", "sender_id", "size_estimate", "message_type"]
    src = arch["messages"].select(*cols)
    key = (spark.sparkContext.applicationId, sf_dir, "csvrt")
    if key not in _CSV_MEMO:
        d = tempfile.mkdtemp(prefix="msgvault_csv_") + "/messages"
        write_csv_export(src, d)
        _CSV_MEMO[key] = d
    back = read_csv_export(
        spark, _CSV_MEMO[key],
        "id long, sender_id long, size_estimate long, message_type string",
    )
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("sender_id").cast("long").alias("n_with_sender"),
        F.sum("size_estimate").cast("long").alias("total_size"),
        F.count_distinct("message_type").cast("long").alias("n_types"),
    )


_INCR_MEMO: dict[tuple, str] = {}


@register(
    "incremental_cache_append",
    oracle(
        """
, lbl AS (
    SELECT m.year, COUNT(*) AS label_links
    FROM messages m JOIN message_labels ml ON ml.message_id = m.id
    GROUP BY m.year
)
SELECT m.year,
       CAST(COUNT(*) AS BIGINT) AS message_count,
       CAST(SUM(m.size_estimate) AS BIGINT) AS total_size,
       CAST(MAX(l.label_links) AS BIGINT) AS label_links
FROM messages m JOIN lbl l ON l.year = m.year
GROUP BY m.year
ORDER BY m.year
"""
    ),
)
def incremental_cache_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cache refresh (S6) under the oracle: phase 1 builds the
    lake from the low-id half of the archive, phase 2 runs in incremental
    mode — the watermark admits ONLY ids above the phase-1 high-water
    mark, appended as new shards (messages AND junction tables). The
    re-read lake must aggregate exactly like the full source: a dropped
    batch, a duplicated append, or a junction row missed by the watermark
    semi-join all change the per-year counts."""
    from msgvault_spark.sources.build_cache import build_cache
    from msgvault_spark.sources.loader import load_archive as _load_archive

    arch = get_archive(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, "incr")
    if key not in _INCR_MEMO:
        base = tempfile.mkdtemp(prefix="msgvault_incr_")
        bounds = arch["messages"].agg(
            F.min("id").alias("lo"), F.max("id").alias("hi")
        ).collect()[0]
        mid = (int(bounds["lo"]) + int(bounds["hi"])) // 2
        phase1 = dict(arch)
        phase1["messages"] = arch["messages"].filter(F.col("id") <= mid)
        # the live store at T1 only holds junction rows for messages that
        # exist at T1 — simulate it consistently
        for junction in ("message_recipients", "message_labels", "attachments"):
            phase1[junction] = arch[junction].filter(
                F.col("message_id") <= mid
            )
        build_cache(spark, phase1, base, mode="full")
        build_cache(spark, arch, base, mode="incremental")
        _INCR_MEMO[key] = base
    lake = _load_archive(spark, _INCR_MEMO[key])
    m = lake["messages"].select("id", "year", "size_estimate")
    lbl = (
        m.select("id", "year")
        .join(
            lake["message_labels"].select("message_id"),
            F.col("id") == F.col("message_id"),
        )
        .groupBy("year")
        .agg(F.count(F.lit(1)).alias("label_links"))
    )
    return (
        m.groupBy("year")
        .agg(
            F.count(F.lit(1)).cast("long").alias("message_count"),
            F.sum("size_estimate").cast("long").alias("total_size"),
        )
        .join(lbl, "year")
        .select(
            F.col("year").cast("int").alias("year"),
            "message_count",
            "total_size",
            F.col("label_links").cast("long").alias("label_links"),
        )
        .transform(present_sorted, "year")
    )


_DRIFT_MEMO: dict[tuple, str] = {}


@register(
    "schema_drift_read",
    """
SELECT COALESCE(CASE WHEN doc_id % 2 = 0 THEN NULL ELSE lang END, '??')
           AS lang_eff,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_legacy
FROM documents
GROUP BY 1
ORDER BY 1
""",
)
def schema_drift_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift under the oracle (S1 mergeSchema + S3 tolerant
    defaults, reference views.go:26-56 DESCRIBE probing): the lake holds
    two generations of shards — legacy files WITHOUT the lang column
    (even doc_ids) and current files WITH it. mergeSchema surfaces the
    union schema (lang null on legacy rows); the canonicalizing
    projection (sources/loader.py:canonicalize) then applies the
    tolerant default. The oracle states the expected per-lang rollup
    with legacy rows under the '??' default — a dropped column, a
    misaligned union, or a default applied to the wrong generation all
    change the counts."""
    from pyspark.sql import types as T

    from msgvault_spark.sources.cache import get_table as load_table
    from msgvault_spark.sources.loader import canonicalize

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "lang"
    )
    key = (spark.sparkContext.applicationId, sf_dir, "drift")
    if key not in _DRIFT_MEMO:
        base = tempfile.mkdtemp(prefix="msgvault_drift_") + "/docs"
        docs.filter(F.col("doc_id") % 2 == 0).drop("lang").write.mode(
            "overwrite"
        ).parquet(base)
        docs.filter(F.col("doc_id") % 2 != 0).write.mode("append").parquet(
            base
        )
        _DRIFT_MEMO[key] = base
    target = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    lake = canonicalize(
        spark.read.option("mergeSchema", "true").parquet(_DRIFT_MEMO[key]),
        target,
    )
    return (
        lake.select(
            F.coalesce(F.col("lang"), F.lit("??")).alias("lang_eff"),
            "n_chars",
            (F.col("doc_id") % 2 == 0).cast("long").alias("legacy"),
        )
        .groupBy("lang_eff")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum("legacy").cast("long").alias("n_legacy"),
        )
        .transform(present_sorted, "lang_eff")
    )

"""Materialize-once archive cache + denormalized wide view.

The reference's analytics speed comes from an ETL step (`build-cache`) that
materializes query-shaped tables once and serves every query from them,
with NO per-session warm-in (cmd/msgvault/cmd/build_cache.go:52-56 serves
straight off the prebuilt cache). Spark-first equivalents here:

  - get_archive(): the fact tables live in the artifact lake as BUCKETED
    parquet (hash-clustered + sorted on their join keys: messages by id,
    message_recipients/message_labels/attachments by message_id, same
    bucket count), written once at ETL. A serving session registers the
    directories as external bucketed tables (metadata-only) and scans
    them — fact⋈fact joins read `Bucketed: true` scans whose
    HashPartitioning satisfies the join requirement with no exchange, and
    the session pays ZERO warm-in (no repartition, no persist, no count).
    On a 1000-executor cluster this is exactly bucketed-lake layout with
    bucket count sized to the data (16 here ≈ local cores/2; ~512 MB
    buckets at 100 TB).

  - wide_messages(): the v_messages-style denormalized view
    (reference internal/query/views.go:346-489): messages + resolved sender
    (first-'from' per message, min_by-deterministic) + sorted label array +
    attachment pre-agg. Sender/domain/time aggregates become scan+agg with
    ZERO joins — the shape that wins at 100 TB, built once per ETL and
    served as a plain lake scan (column pruning + pushdown reach the
    parquet footers, which full-width in-memory caching would forfeit).

When the artifact store is disabled (SPARK_GRAFT_ARTIFACT_DIR="") the
pre-round-11 in-session fallback applies: repartition by join key +
MEMORY_AND_DISK persist, the same co-partitioning paid per session.

NOTE wide-view semantics: sender columns hold the FIRST 'from' participant.
For archives where a message can carry several 'from' rows the canonical
join path (plans/aggregate.py) keeps per-row multiplicity; the wide path is
the fast path for the (overwhelmingly common) single-sender case.
"""

from __future__ import annotations

import functools
import threading

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from msgvault_spark.sources.adapter import build_archive

_ARCHIVE_MEMO: dict[tuple[str, str], dict[str, DataFrame]] = {}
_WIDE_MEMO: dict[tuple[str, str], DataFrame] = {}

FACT_PARTITIONS = 16

# serving.prewarm_plans builds catalog plans on background driver threads;
# the memoized getters below must not double-build (wasted jobs, and a
# losing thread's persisted dims would stay pinned unreferenced). One
# reentrant lock around each getter: with a warm lake the held section is
# metadata-only (registration + footer reads); builds serialize, which is
# exactly the single-flight behavior a stale store needs.
_MEMO_LOCK = threading.RLock()


def _locked(fn):
    @functools.wraps(fn)
    def inner(*a, **kw):
        with _MEMO_LOCK:
            return fn(*a, **kw)

    return inner


def _key(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    return (spark.sparkContext.applicationId, sf_dir)


# write-time co-partitioning spec: each fact clustered on its join key
_ARCHIVE_BUCKETS: dict[str, tuple[str, int]] = {
    "messages": ("id", FACT_PARTITIONS),
    "message_recipients": ("message_id", FACT_PARTITIONS),
    "message_labels": ("message_id", FACT_PARTITIONS),
    "attachments": ("message_id", FACT_PARTITIONS),
}


@_locked
def get_archive(
    spark: SparkSession, sf_dir: str, *, materialize: bool = True
) -> dict[str, DataFrame]:
    """Adapter archive, served straight off the bucketed artifact lake.
    Round 11: co-partitioning moved from session warm-in (a repartition +
    persist + count of every fact, ~10s of the sf1 cold budget) to a
    write-time property — serving sessions register the stored bucketed
    directories and scan them, paying nothing up front. The in-session
    repartition+persist fallback survives only for store-disabled runs."""
    from msgvault_spark.sources import artifact_store

    key = _key(spark, sf_dir)
    if key in _ARCHIVE_MEMO:
        return _ARCHIVE_MEMO[key]
    kind = ("archive",)
    loaded = artifact_store.load_group(spark, sf_dir, kind)
    if loaded is not None:
        arch = _persist_dims(loaded[0])
        _ARCHIVE_MEMO[key] = arch
        return arch
    arch = build_archive(spark, sf_dir)
    stored = artifact_store.save_group(
        spark, sf_dir, kind, arch, buckets=_ARCHIVE_BUCKETS
    )
    if stored:
        # the stored frames ARE bucketed-table reads: the build session
        # serves the same plans every later load session will
        stored = _persist_dims(stored)
        _ARCHIVE_MEMO[key] = stored
        return stored
    if materialize:  # store disabled: per-session co-partition fallback
        arch = dict(arch)
        for name, (bucket_key, n) in _ARCHIVE_BUCKETS.items():
            arch[name] = arch[name].repartition(n, bucket_key).persist(
                StorageLevel.MEMORY_AND_DISK
            )
        for name in ("participants", "labels", "conversations", "sources"):
            arch[name] = arch[name].persist(StorageLevel.MEMORY_AND_DISK)
        # force materialization now so first query isn't charged for it
        for df in arch.values():
            df.count()
    _ARCHIVE_MEMO[key] = arch
    return arch


def _persist_dims(arch: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Pin the four dimension tables in memory (lazily). Every archive
    query broadcast-joins at least one of them, and broadcast relations
    are rebuilt per job — without a cached source each warm collect pays
    a fresh parquet scan per dim (~10 ms × dims × queries, the uniform
    warm smear measured when r11 first went persist-free). Dims are
    KB-to-MB at any SF that fits one machine; the facts stay pure
    bucketed lake scans."""
    arch = dict(arch)
    for name in ("participants", "labels", "conversations", "sources"):
        arch[name] = arch[name].persist(StorageLevel.MEMORY_AND_DISK)
    return arch


def build_wide_messages(archive: dict[str, DataFrame]) -> DataFrame:
    """Denormalized wide view: one row per live message with resolved
    sender, sorted label-name array, and attachment sums."""
    from msgvault_spark.plans.aggregate import _attachment_preagg, live_messages

    msg = live_messages(archive["messages"])
    mr = archive["message_recipients"]
    p_ren = archive["participants"].select(
        F.col("id").alias("p_id"),
        F.col("email_address").alias("p_email"),
        F.col("domain").alias("p_domain"),
        F.col("display_name").alias("p_display"),
        F.col("phone_number").alias("p_phone"),
    )
    name_expr = F.coalesce(
        F.when(F.trim(F.col("p_display")) != "", F.trim(F.col("p_display"))),
        F.when(F.col("p_phone") != "", F.col("p_phone")),
        F.col("p_email"),
    )
    first_from = (
        mr.filter(F.col("recipient_type") == "from")
        .join(F.broadcast(p_ren), F.col("participant_id") == F.col("p_id"))
        .select(
            "message_id",
            F.col("p_email").alias("_email"),
            F.col("p_domain").alias("_domain"),
            name_expr.alias("_name"),
            F.coalesce(F.col("p_phone"), F.lit("")).alias("_phone"),
            F.col("participant_id").alias("_pid"),
        )
        .groupBy("message_id")
        .agg(
            F.min_by("_email", "_pid").alias("ff_email"),
            F.min_by("_domain", "_pid").alias("ff_domain"),
            F.min_by("_name", "_pid").alias("ff_name"),
            F.min_by("_phone", "_pid").alias("ff_phone"),
        )
    )
    # direct-sender fallback (chat messages without a 'from' row — J6)
    direct = (
        msg.filter(F.col("sender_id").isNotNull())
        .join(F.broadcast(p_ren), F.col("sender_id") == F.col("p_id"))
        .select(
            F.col("id").alias("d_message_id"),
            F.coalesce(F.col("p_email"), F.lit("")).alias("ds_email"),
            F.coalesce(F.col("p_domain"), F.lit("")).alias("ds_domain"),
            F.coalesce(F.col("p_display"), F.lit("")).alias("ds_name"),
            F.coalesce(F.col("p_phone"), F.lit("")).alias("ds_phone"),
        )
    )
    # recipient (to/cc/bcc) email + phone lists per message, multiplicity-
    # preserving and sorted for determinism — recipient aggregates become
    # explode+agg, and to:/cc:/bcc:/recipient filters become array exists
    # on ONE scan (the join-path semi-join shuffles the full junction table
    # per query; the denormalized array is the reference's own search shape,
    # internal/query/duckdb.go:719-770). Phones ride separately: a
    # phone-only recipient has a NULL email, which collect_list drops.
    recips_arr = (
        mr.filter(F.col("recipient_type").isin("to", "cc", "bcc"))
        .join(F.broadcast(p_ren), F.col("participant_id") == F.col("p_id"))
        .groupBy("message_id")
        .agg(
            F.array_sort(F.collect_list("p_email")).alias("recipient_emails"),
            F.array_sort(F.collect_list("p_phone")).alias("recipient_phones"),
        )
    )
    labels_arr = (
        archive["message_labels"]
        .join(
            F.broadcast(
                archive["labels"].select(
                    F.col("id").alias("lbl_id"), F.col("name").alias("lbl_name")
                )
            ),
            F.col("label_id") == F.col("lbl_id"),
        )
        .groupBy("message_id")
        .agg(F.array_sort(F.collect_list("lbl_name")).alias("labels"))
    )
    # rename pre-agg columns: messages itself has an attachment_count column
    att = _attachment_preagg(archive["attachments"]).select(
        "message_id",
        F.col("attachment_size").alias("att_size_sum"),
        F.col("attachment_count").alias("att_count_sum"),
    )

    wide = (
        msg.join(first_from, F.col("id") == first_from["message_id"], "left")
        .drop(first_from["message_id"])
        .join(direct, F.col("id") == F.col("d_message_id"), "left")
        .drop("d_message_id")
        .join(labels_arr, F.col("id") == labels_arr["message_id"], "left")
        .drop(labels_arr["message_id"])
        .join(recips_arr, F.col("id") == recips_arr["message_id"], "left")
        .drop(recips_arr["message_id"])
        .join(att, F.col("id") == att["message_id"], "left")
        .drop(att["message_id"])
        .withColumn("has_from_row", F.col("ff_email").isNotNull())
        .withColumn("from_email", F.coalesce(F.col("ff_email"), F.col("ds_email")))
        .withColumn("from_domain", F.coalesce(F.col("ff_domain"), F.col("ds_domain")))
        .withColumn("from_name", F.coalesce(F.col("ff_name"), F.col("ds_name")))
        .withColumn("from_phone", F.coalesce(F.col("ff_phone"), F.col("ds_phone")))
        .drop("ff_email", "ff_domain", "ff_name", "ff_phone",
              "ds_email", "ds_domain", "ds_name", "ds_phone")
        .withColumn(
            "labels", F.coalesce(F.col("labels"), F.array().cast("array<string>"))
        )
        .withColumn(
            "recipient_emails",
            F.coalesce(F.col("recipient_emails"), F.array().cast("array<string>")),
        )
        .withColumn(
            "recipient_phones",
            F.coalesce(F.col("recipient_phones"), F.array().cast("array<string>")),
        )
        .withColumn(
            "att_size_sum", F.coalesce(F.col("att_size_sum"), F.lit(0)).cast("long")
        )
        .withColumn(
            "att_count_sum", F.coalesce(F.col("att_count_sum"), F.lit(0)).cast("long")
        )
        # denormalized lowered recipient search blobs (r12): the hottest
        # wide-search predicate (to:/cc:/bcc: substring match) otherwise
        # pays array-decode + concat_ws + lower per row per query; these
        # two flat strings move that work to build time — the reference's
        # own denormalized-search-column shape (duckdb.go:719-770). A
        # literal term without '\n' cannot span the '\n' join boundary,
        # so contains() on the blob is exactly exists(array, ILIKE)
        # (search/fast_wide.py).
        .withColumn(
            "recipient_emails_lc",
            F.lower(F.concat_ws("\n", F.col("recipient_emails"))),
        )
        .withColumn(
            "recipient_phones_lc",
            F.lower(F.concat_ws("\n", F.col("recipient_phones"))),
        )
    )
    return wide


@_locked
def get_wide_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized wide view: lake twin + LAZY persist. The wide view is the
    hottest serving table (nine headline entries scan it, several with
    scan-only plans that cannot reuse shuffle outputs across collects), so
    it keeps an in-memory copy — but materialization is lazy: the r10
    eager count() charged every session ~3s at sf1 up front; now the first
    wide consumer materializes it as a side effect and the other eight
    read memory (measured sf1 serving-cold: 9 entries × ~1s of re-scans
    → one ~2s build + 8 × ~0.15s)."""
    from msgvault_spark.sources import artifact_store

    key = _key(spark, sf_dir)
    if key in _WIDE_MEMO:
        return _WIDE_MEMO[key]
    kind = ("wide_messages",)
    loaded = artifact_store.load_group(spark, sf_dir, kind)
    if loaded is not None:
        wide = loaded[0]["wide"].persist(StorageLevel.MEMORY_AND_DISK)
    else:
        # build at few, larger partitions: the wide view is dimension-scale
        # (≤ a few hundred MB at bench SFs) and every consumer is a
        # scan+agg, so per-task scheduling dominates — 8 partitions keeps
        # scans at 8 tasks instead of 32 (measured 25% off the 4 wide
        # aggregates at sf0.1). The lake-persisted twin (build_wide_cache)
        # sizes by year partition/file instead, which is the knob that
        # matters on a real cluster.
        built = build_wide_messages(get_archive(spark, sf_dir)).coalesce(8)
        stored = artifact_store.save_group(spark, sf_dir, kind, {"wide": built})
        if stored:
            wide = stored["wide"].persist(StorageLevel.MEMORY_AND_DISK)
        else:  # store disabled: in-session persist fallback
            wide = built.persist(StorageLevel.MEMORY_AND_DISK)
            wide.count()
    _WIDE_MEMO[key] = wide
    return wide


_TABLE_MEMO: dict[tuple[str, str, str], DataFrame] = {}
_TEXT_INDEX_MEMO: dict[tuple[str, str, str, str, str], tuple[DataFrame, DataFrame]] = {}
_CORPUS_STATS_MEMO: dict[tuple[str, str, str, str, str], tuple[int, float]] = {}
_TERM_STATS_MEMO: dict[tuple[str, str, str, str, str], DataFrame] = {}


# Tables at or above this raw-parquet footprint serve from a pre-sharded
# lake twin instead of an in-memory cache: for a big fact the per-session
# repartition shuffle + full-width persist+count (lineitem alone was 7.4s
# of the sf1 cold budget) buys nothing a pruned parquet scan doesn't do
# better — queries read only the columns they project (the cache always
# materialized all 16 lineitem columns including l_comment). Small tables
# keep the in-memory cache: their warm-in is milliseconds and their
# CPU-heavy consumers (tokenizers over documents) want the full core-count
# partitioning the cache layout provides.
TWIN_MIN_BYTES = 8 * 1024 * 1024

# Join-key clustering for the big raw-table twins: the same write-time
# co-partitioning the archive facts get. orders⋈lineitem on orderkey is
# the backbone of half the TPC-H plans (Q3/Q4/Q12/Q18/Q21); events
# cluster on user_id so sessionization's window+rollup reads an already-
# clustered scan. Pure scans are unaffected (auto-bucketed-scan falls
# back to file-split planning when no operator needs the clustering).
_TWIN_BUCKETS: dict[str, tuple[str, int]] = {
    "lineitem": ("l_orderkey", FACT_PARTITIONS),
    "orders": ("o_orderkey", FACT_PARTITIONS),
    "events": ("user_id", FACT_PARTITIONS),
}


def _layout_partitions(spark: SparkSession, n_rows: int, n_bytes: int | None) -> int:
    """Partition count for a table layout: ~100k rows per partition OR
    ~256 KB of compressed parquet per partition, whichever demands more,
    capped at core count. The bytes term matters for text/vector tables:
    sf1 `documents` is only 50k rows (row rule → ONE partition) but its
    zstd text decodes ~10×, and every tokenizer/GEMM consumer is
    CPU-bound — the r10 tree ran those map stages single-threaded. 256 KB
    compressed ≈ a 1-4 MB decoded task, the local-mode analog of sizing
    maxPartitionBytes on a real lake. The bytes term is itself floored
    at ~2k rows/partition: below that, per-task scheduling (~5 ms)
    outweighs any work the task holds (sf0.1 embeddings is 2.9 MB of
    float arrays but only 2k rows — 12 partitions bought nothing and
    taxed every KNN job; measured in the r11 A/B smear)."""
    by_rows = -(-n_rows // 100_000)  # ceil
    by_bytes = min(
        -(-(n_bytes or 0) // (256 * 1024)),
        -(-n_rows // 2_000),
    )
    return min(
        spark.sparkContext.defaultParallelism, max(1, by_rows, by_bytes)
    )


@_locked
def get_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Memoized testdata table (the raw-parquet analog of the reference
    keeping its DuckDB connection's buffer pool warm).

    Two regimes by raw size:
      * big facts (≥ TWIN_MIN_BYTES): served as plain scans of a
        pre-sharded lake twin ("table_shards" artifact group — row-count-
        sized round-robin files written once at ETL). No per-session
        shuffle, no persist; scan parallelism comes from the file layout,
        and column pruning + pushdown reach the parquet footers.
      * small tables: repartitioned to ~100k-row partitions (capped at
        core count) and MEMORY_AND_DISK-persisted, so CPU-heavy consumers
        get full-width parallelism on data whose warm-in costs ms."""
    from msgvault_spark.sources import artifact_store
    from msgvault_spark.sources.loader import load_table

    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key in _TABLE_MEMO:
        return _TABLE_MEMO[key]
    # size the layout from the parquet FOOTER (free) instead of a
    # full counting scan — at sf1 the old scan-count-then-repartition
    # sequence read lineitem twice before the first query could run
    n_rows = _footer_rows(sf_dir, name)
    n_bytes = _footer_bytes(sf_dir, name)
    if (
        n_bytes is not None
        and n_rows is not None
        and n_bytes >= TWIN_MIN_BYTES
    ):
        kind = ("table_shards", name)
        loaded = artifact_store.load_group(spark, sf_dir, kind)
        if loaded is not None:
            _TABLE_MEMO[key] = loaded[0]["data"]
            return _TABLE_MEMO[key]
        bucket = _TWIN_BUCKETS.get(name)
        if bucket is not None:
            stored = artifact_store.save_group(
                spark,
                sf_dir,
                kind,
                {"data": load_table(spark, sf_dir, name)},
                buckets={"data": bucket},
            )
        else:
            n_part = _layout_partitions(spark, n_rows, n_bytes)
            stored = artifact_store.save_group(
                spark,
                sf_dir,
                kind,
                {"data": load_table(spark, sf_dir, name).repartition(n_part)},
            )
        if stored is not None:
            _TABLE_MEMO[key] = stored["data"]
            return _TABLE_MEMO[key]
        # store disabled → fall through to the in-session cache path
    raw = load_table(spark, sf_dir, name)
    if n_rows is None:
        raw = raw.persist(StorageLevel.MEMORY_AND_DISK)
        n_rows = raw.count()
    n_part = _layout_partitions(spark, n_rows, n_bytes)
    if n_part > raw.rdd.getNumPartitions():
        df = raw.repartition(n_part).persist(StorageLevel.MEMORY_AND_DISK)
        df.count()  # one scan+shuffle lays out AND materializes
        raw.unpersist()
    else:
        df = raw.persist(StorageLevel.MEMORY_AND_DISK)
        df.count()
    _TABLE_MEMO[key] = df
    return _TABLE_MEMO[key]


def _footer_rows(sf_dir: str, name: str) -> int | None:
    """Row count from parquet footer metadata (no data pages touched) —
    None when the layout is not a plain local file/dir of parquet parts."""
    import os

    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover
        return None
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isfile(path):
            return pq.ParquetFile(path).metadata.num_rows
        if os.path.isdir(path):
            total = 0
            for f in os.listdir(path):
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(
                        os.path.join(path, f)
                    ).metadata.num_rows
            return total
    except Exception:
        return None
    return None


def _footer_bytes(sf_dir: str, name: str) -> int | None:
    """On-disk parquet footprint (stat only) — the TWIN_MIN_BYTES input."""
    import os

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isfile(path):
            return os.stat(path).st_size
        if os.path.isdir(path):
            return sum(
                os.stat(os.path.join(path, f)).st_size
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
    except OSError:
        return None
    return None


@_locked
def get_text_index(
    spark: SparkSession, sf_dir: str, table: str, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """Memoized persisted inverted index (postings, doc_stats) — the ETL-time
    FTS index the reference maintains as SQLite FTS5 tables."""
    key = (spark.sparkContext.applicationId, sf_dir, table, id_col, text_col)
    if key not in _TEXT_INDEX_MEMO:
        _build_text_index(spark, key, sf_dir, table, id_col, text_col)
    return _TEXT_INDEX_MEMO[key]


@_locked
def get_corpus_stats(
    spark: SparkSession, sf_dir: str, table: str, id_col: str, text_col: str
) -> tuple[int, float]:
    """(n_docs, avgdl) — corpus constants captured at index-build time so
    per-query BM25 folds them in as literals."""
    key = (spark.sparkContext.applicationId, sf_dir, table, id_col, text_col)
    if key not in _CORPUS_STATS_MEMO:
        _build_text_index(spark, key, sf_dir, table, id_col, text_col)
    return _CORPUS_STATS_MEMO[key]


@_locked
def get_term_stats(
    spark: SparkSession, sf_dir: str, table: str, id_col: str, text_col: str
) -> DataFrame:
    """ETL-time (term, df) document-frequency table — the statistic an FTS
    index keeps next to its postings. Queries broadcast a filtered slice of
    it instead of re-aggregating candidate postings per query."""
    key = (spark.sparkContext.applicationId, sf_dir, table, id_col, text_col)
    if key not in _TERM_STATS_MEMO:
        _build_text_index(spark, key, sf_dir, table, id_col, text_col)
    return _TERM_STATS_MEMO[key]


def _build_text_index(spark, key, sf_dir, table, id_col, text_col) -> None:
    from pyspark.sql import functions as F

    from msgvault_spark.search.fts import build_inverted_index
    from msgvault_spark.sources import artifact_store

    kind = ("text_index", table, id_col, text_col)
    n = max(4, spark.sparkContext.defaultParallelism // 8)
    loaded = artifact_store.load_group(spark, sf_dir, kind)
    if loaded is not None:
        # serve the lake scans directly (no persist/count warm-in): every
        # consumer filters postings to its query terms, and that predicate
        # pushes into the parquet scan — which the full-width cache blocked
        frames, scalars = loaded
        _TEXT_INDEX_MEMO[key] = (frames["postings"], frames["stats"])
        _TERM_STATS_MEMO[key] = frames["term_stats"]
        _CORPUS_STATS_MEMO[key] = (int(scalars["n"]), float(scalars["avgdl"]))
        return
    postings, stats = build_inverted_index(
        get_table(spark, sf_dir, table), id_col, text_col
    )
    # right-size the persisted index: a handful of partitions caps per-scan
    # task count locally; a real lake sizes this by bytes (term-hash
    # partitioned), not by the session's shuffle.partitions
    postings = postings.coalesce(n).persist(StorageLevel.MEMORY_AND_DISK)
    stats = stats.coalesce(n).persist(StorageLevel.MEMORY_AND_DISK)
    postings.count()
    term_stats = (
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .coalesce(n)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    term_stats.count()
    row = stats.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    stored = artifact_store.save_group(
        spark,
        sf_dir,
        kind,
        {"postings": postings, "stats": stats, "term_stats": term_stats},
        scalars={"n": int(row["n"]), "avgdl": float(row["avgdl"])},
    )
    if stored:
        # serve the parquet-backed copies so the build session and every
        # later load session produce IDENTICAL downstream plans (and the
        # served bits are the lake bits)
        for df in (postings, stats, term_stats):
            df.unpersist()
        postings = stored["postings"]
        stats = stored["stats"]
        term_stats = stored["term_stats"]
    _TEXT_INDEX_MEMO[key] = (postings, stats)
    _TERM_STATS_MEMO[key] = term_stats
    _CORPUS_STATS_MEMO[key] = (int(row["n"]), float(row["avgdl"]))


_ARTIFACT_MEMO: dict[tuple, DataFrame] = {}


@_locked
def get_artifact(spark: SparkSession, cache_key: tuple, builder) -> DataFrame:
    """Generic memoized persisted ETL artifact — the build-cache pattern
    (reference cmd/build_cache.go) for any query-independent derived frame
    a real pipeline materializes next to the lake: deletion vectors,
    per-user rollups, normed vectors. Built + persisted once per
    (application, key); queries then scan the artifact instead of
    re-deriving it."""
    key = (spark.sparkContext.applicationId, *cache_key)
    if key not in _ARTIFACT_MEMO:
        _ARTIFACT_MEMO[key] = _disk_backed(
            spark, cache_key, ("artifact", *cache_key[1:]), builder
        )
    return _ARTIFACT_MEMO[key]


def _disk_backed(
    spark: SparkSession, cache_key: tuple, kind: tuple, builder
) -> DataFrame:
    """Load the artifact's parquet twin from the on-disk lake when fresh,
    else build and persist it there (artifact_store.py — the reference's
    build-cache + staleness-probe serving model). cache_key[0] is the
    sf_dir by the package-wide memo convention; the served frame is the
    stored copy, so served bits == lake bits.

    Lake-served frames come back as PLAIN SCANS (no persist/count — that
    per-artifact warm-in was most of the sf1 cold budget, and consumers'
    predicates now push into the artifact's parquet). Only the
    store-disabled fallback persists: there the builder's plan would
    otherwise re-run per query (iterative builders like connected
    components make that prohibitive)."""
    from msgvault_spark.sources import artifact_store

    sf_dir = cache_key[0]
    loaded = artifact_store.load_group(spark, sf_dir, kind)
    if loaded is not None:
        return loaded[0]["data"]
    df = builder()
    stored = artifact_store.save_group(spark, sf_dir, kind, {"data": df})
    if stored:
        return stored["data"]
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    return df


_SCALAR_MEMO: dict[tuple, object] = {}


@_locked
def get_scalar(spark: SparkSession, cache_key: tuple, compute):
    """Memoized scalar catalog statistic captured at build time (the
    corpus_stats pattern: n_docs/avgdl for BM25, distinct-group counts
    for the wide aggregates) — queries fold the value in as a literal
    instead of paying a 1-row aggregate job per invocation."""
    key = (spark.sparkContext.applicationId, *cache_key)
    if key not in _SCALAR_MEMO:
        from msgvault_spark.sources import artifact_store

        kind = ("scalar", *cache_key[1:])
        stored = artifact_store.load_scalars(cache_key[0], kind)
        if stored is not None and "value" in stored:
            _SCALAR_MEMO[key] = stored["value"]
        else:
            value = compute()
            artifact_store.save_scalars(cache_key[0], kind, {"value": value})
            _SCALAR_MEMO[key] = value
    return _SCALAR_MEMO[key]


_COMPONENTS_MEMO: dict[tuple, DataFrame] = {}


@_locked
def get_components(
    spark: SparkSession, cache_key: tuple, edges_builder, **params
) -> DataFrame:
    """Memoized persisted connected-components labeling (dedup/
    components.py) — the cluster-assignment table a dedup pipeline
    materializes once per corpus snapshot (an ETL artifact exactly like
    the minhash/FTS indexes above), so queries aggregate a label table
    instead of re-running the iterative fixpoint per invocation."""
    from msgvault_spark.dedup.components import connected_components

    key = (spark.sparkContext.applicationId, *cache_key, *sorted(params.items()))
    if key not in _COMPONENTS_MEMO:
        kind = ("components", *cache_key[1:], *sorted(params.items()))
        _COMPONENTS_MEMO[key] = _disk_backed(
            spark,
            cache_key,
            kind,
            lambda: connected_components(edges_builder(), **params),
        )
    return _COMPONENTS_MEMO[key]


_MINHASH_MEMO: dict[tuple, DataFrame] = {}


@_locked
def get_minhash_index(
    spark: SparkSession,
    cache_key: tuple,
    df_builder,
    id_col: str,
    text_col: str,
    **params,
) -> DataFrame:
    """Memoized persisted MinHash-LSH band index (dedup/minhash.py) — the
    ETL-time artifact a real pipeline materializes next to the corpus, so
    queries pay only candidate-join + verify."""
    from msgvault_spark.dedup.minhash import build_minhash_index

    key = (spark.sparkContext.applicationId, *cache_key, *sorted(params.items()))
    if key not in _MINHASH_MEMO:
        kind = (
            "minhash_index",
            *cache_key[1:],
            id_col,
            text_col,
            *sorted(params.items()),
        )
        _MINHASH_MEMO[key] = _disk_backed(
            spark,
            cache_key,
            kind,
            lambda: build_minhash_index(df_builder(), id_col, text_col, **params),
        )
    return _MINHASH_MEMO[key]


def _unpersist_tree(obj) -> int:
    """Unpersist every DataFrame reachable inside obj (DFs, dicts,
    tuples/lists of them). blocking=True: callers are memory-pressure
    recovery, which needs the blocks actually gone before retrying."""
    n = 0
    if isinstance(obj, DataFrame):
        try:
            obj.unpersist(blocking=True)
            n += 1
        except Exception:
            pass
    elif isinstance(obj, dict):
        for v in obj.values():
            n += _unpersist_tree(v)
    elif isinstance(obj, (tuple, list)):
        for v in obj:
            n += _unpersist_tree(v)
    return n


@_locked
def clear_serving_caches() -> int:
    """Memory-pressure recovery level 2 (cold-restart-without-process-
    restart): drop every long-lived serving cache this module holds —
    the persisted archive twins, wide view, sharded tables, FTS/term
    indexes, generic artifacts, components and minhash labelings. Each
    getter rebuilds lazily from the artifact lake on next use, so the
    only cost is the next consumer's re-warm; the benefit is a driver
    heap no longer carrying every entry ever served this session.
    Returns the number of memo entries dropped. Scalar memos stay: they
    hold bytes, not relations."""
    dropped = 0
    for memo in (
        _ARCHIVE_MEMO,
        _WIDE_MEMO,
        _TABLE_MEMO,
        _TEXT_INDEX_MEMO,
        _TERM_STATS_MEMO,
        _ARTIFACT_MEMO,
        _COMPONENTS_MEMO,
        _MINHASH_MEMO,
        _CORPUS_STATS_MEMO,  # scalars, but lifecycle-tied to the index
    ):
        for v in memo.values():
            _unpersist_tree(v)
        dropped += len(memo)
        memo.clear()
    return dropped

"""Training-data-pipeline catalog entries: sessionization, deterministic /
stratified sampling, dataset mixing, dedup connected components.
Registered on import by catalog.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from msgvault_spark.operators.present import present_sorted
from msgvault_spark.catalog import register
from msgvault_spark.sources.cache import get_table as load_table


# ---------------------------------------------------------------------------
# batch sessionization (operators/sessionize.py)
# ---------------------------------------------------------------------------


@register(
    "sessionize_events",
    """
WITH s AS (
    SELECT user_id, ts,
           CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER w > 1800
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s2 AS (
    SELECT user_id,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS session_id
    FROM s
),
roll AS (
    SELECT user_id, session_id, COUNT(*) AS events
    FROM s2 GROUP BY 1, 2
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(events) AS BIGINT) AS total_events,
       CAST(MAX(events) AS BIGINT) AS max_session_events
FROM roll
GROUP BY user_id
ORDER BY n_sessions DESC, user_id ASC
LIMIT 100
""",
    headline=True,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap sessionization of the events stream (batch/backfill twin
    of streaming/stateful.py): per-user session count / volume, heaviest
    sessionizers first (operators/sessionize.py)."""
    from msgvault_spark.operators.sessionize import session_rollup

    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    roll = session_rollup(events, timeout_s=1800)
    return (
        roll.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("events").cast("long").alias("total_events"),
            F.max("events").cast("long").alias("max_session_events"),
        )
        .orderBy(F.col("n_sessions").desc(), F.col("user_id").asc())
        .limit(100)
    )


# ---------------------------------------------------------------------------
# deterministic sampling / stratified quotas / dataset mixing
# ---------------------------------------------------------------------------

_HASH_SQL = "((doc_id % 2147483647) * 1327217885) % 2147483647"


@register(
    "stratified_sample_docs",
    f"""
WITH ranked AS (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {_HASH_SQL} ASC, doc_id ASC
           ) AS rn
    FROM documents
)
SELECT lang AS key,
       CAST(COUNT(*) AS BIGINT) AS sampled,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM ranked WHERE rn <= 7
GROUP BY lang
ORDER BY key
""",
    headline=True,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota sampling (7 docs/lang) by deterministic hash
    order — rerun-stable, engine-portable (operators/sampling.py). id_sum
    pins the exact membership, not just the count."""
    from msgvault_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    picked = stratified_sample(docs, ["lang"], "doc_id", quota=7)
    return (
        picked.groupBy(F.col("lang").alias("key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("sampled"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        .transform(present_sorted, "key")
    )


@register(
    "weighted_mix_sources",
    f"""
SELECT source AS key,
       CAST(COUNT(*) AS BIGINT) AS kept,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM documents
WHERE {_HASH_SQL} < CASE source
    WHEN 'src0' THEN CAST(1.00 * 2147483647 AS BIGINT)
    WHEN 'src1' THEN CAST(0.25 * 2147483647 AS BIGINT)
    WHEN 'src2' THEN CAST(0.50 * 2147483647 AS BIGINT)
    ELSE 0 END
GROUP BY source
ORDER BY key
""",
)
def weighted_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset mixing: per-source keep rates applied as a pure map-side
    hash filter (operators/sampling.py:weighted_source_mix)."""
    from msgvault_spark.operators.sampling import weighted_source_mix

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    kept = weighted_source_mix(
        docs, "source", "doc_id",
        {"src0": 1.00, "src1": 0.25, "src2": 0.50},
    )
    return (
        kept.groupBy(F.col("source").alias("key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("kept"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        .transform(present_sorted, "key")
    )


# ---------------------------------------------------------------------------
# dedup connected components (dedup/components.py)
# ---------------------------------------------------------------------------


@register(
    "dedup_component_sizes",
    """
WITH RECURSIVE base AS (SELECT doc_id FROM documents),
e AS (
    SELECT doc_id AS a, doc_id + 10000 AS b FROM base WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id + 10000 AS a, doc_id + 20000 AS b
    FROM base WHERE doc_id % 6 = 0
),
sym AS (
    SELECT a, b FROM e UNION SELECT b, a FROM e
),
nodes AS (SELECT DISTINCT a AS node FROM sym),
cc AS (
    SELECT node, node AS label FROM nodes
    UNION
    SELECT s.b AS node, cc.label
    FROM cc JOIN sym s ON s.a = cc.node
),
comp AS (SELECT node, MIN(label) AS component FROM cc GROUP BY node),
sizes AS (
    SELECT component, COUNT(*) AS size FROM comp GROUP BY component
)
SELECT size, CAST(COUNT(*) AS BIGINT) AS n_components
FROM sizes GROUP BY size ORDER BY size
""",
    headline=True,
)
def dedup_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of a near-dup pair graph (chains doc→copyA→copyB,
    so A~C is never an input edge): component-size histogram from iterative
    min-label propagation (dedup/components.py). The DuckDB oracle walks the
    same graph with a recursive CTE — viable at oracle scale only; the
    Spark path is the one that works at 100 TB."""
    from msgvault_spark.dedup.components import component_sizes
    from msgvault_spark.sources.cache import get_components

    def edges():
        base = load_table(spark, sf_dir, "documents").select("doc_id")
        e1 = base.filter(F.col("doc_id") % 3 == 0).select(
            F.col("doc_id").alias("src"), (F.col("doc_id") + 10000).alias("dst")
        )
        e2 = base.filter(F.col("doc_id") % 6 == 0).select(
            (F.col("doc_id") + 10000).alias("src"),
            (F.col("doc_id") + 20000).alias("dst"),
        )
        return e1.unionByName(e2)

    # cluster labels are a build-cache product (materialized once per
    # corpus snapshot, like the minhash/FTS indexes); the query itself is
    # the histogram aggregate over the label table
    comp = get_components(spark, (sf_dir, "doc_chain_pairs"), edges)
    return component_sizes(comp).select(
        "size", F.col("n_components").cast("long").alias("n_components")
    )


# ---------------------------------------------------------------------------
# as-of (point-in-time) join (operators/asof.py)
# ---------------------------------------------------------------------------


@register(
    "asof_events_orders",
    """
WITH r AS (
    SELECT o_custkey AS user_id, o_orderdate,
           MAX(o_orderkey) AS last_order
    FROM orders GROUP BY 1, 2
)
SELECT e.event_type AS key,
       CAST(COUNT(*) AS BIGINT) AS events,
       CAST(COUNT(r.last_order) AS BIGINT) AS matched,
       CAST(COALESCE(SUM(r.last_order), 0) AS BIGINT) AS order_ref_sum
FROM events e
ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
GROUP BY key
ORDER BY key
""",
    headline=True,
)
def asof_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each event picks the user's most recent order at
    or before it (operators/asof.py union-and-carry-forward — one shuffle,
    no row explosion). Right side pre-deduped per (user, ts) so ties are
    deterministic; oracle is DuckDB's native ASOF LEFT JOIN. The deduped
    right side is the classic point-in-time DIMENSION a feature pipeline
    maintains as an ETL rollup (one row per user-date), so it builds once
    via the artifact memo; the per-query cost is the event-side pass."""
    from msgvault_spark.operators.asof import asof_join
    from msgvault_spark.sources.cache import get_artifact

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    right = get_artifact(
        spark,
        (sf_dir, "orders_last_per_user_date"),
        lambda: (
            load_table(spark, sf_dir, "orders")
            .groupBy(
                F.col("o_custkey").alias("user_id"),
                F.col("o_orderdate"),
            )
            .agg(F.max("o_orderkey").alias("last_order"))
        ),
    )
    joined = asof_join(
        events, right, on="user_id", left_ts="ts", right_ts="o_orderdate"
    )
    return (
        joined.groupBy(F.col("event_type").alias("key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("events"),
            F.count("last_order").cast("long").alias("matched"),
            F.coalesce(F.sum("last_order"), F.lit(0))
            .cast("long")
            .alias("order_ref_sum"),
        )
        .transform(present_sorted, "key")
    )


# ---------------------------------------------------------------------------
# pivot + rollup (reshaping aggregates)
# ---------------------------------------------------------------------------


@register(
    "pivot_events_weekly",
    """
SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'click'    THEN 1 END), 0) AS BIGINT) AS click,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'error'    THEN 1 END), 0) AS BIGINT) AS error,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'signup'   THEN 1 END), 0) AS BIGINT) AS signup,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'view'     THEN 1 END), 0) AS BIGINT) AS view
FROM events
GROUP BY 1
ORDER BY week
""",
)
def pivot_events_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide reshape: weekly event counts, one column per event type.
    Explicit pivot values skip Spark's values-discovery job and keep the
    output schema static (a must for a 100 TB pivot — never let the key
    domain drive the schema at runtime)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"),
        "event_type",
    )
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy("week")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "week", *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in types]
    ).transform(present_sorted, "week")


@register(
    "rollup_priority_status",
    """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT)
           AS grouping_level,
       CAST(COUNT(*) AS BIGINT) AS orders,
       CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS total
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
ORDER BY grouping_level ASC, priority ASC, status ASC
""",
)
def rollup_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals in ONE pass: (priority, status), per-priority,
    and grand total via ROLLUP — Spark's Expand operator emits all three
    grouping sets map-side, so the cube costs one shuffle, not three
    queries. GROUPING() disambiguates real NULLs from subtotal rows."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderpriority",
        "o_orderstatus",
        F.floor("o_totalprice").cast("long").alias("price_l"),
    )
    return (
        base.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            (
                F.grouping("o_orderpriority") * 2 + F.grouping("o_orderstatus")
            ).cast("long").alias("grouping_level"),
            F.count(F.lit(1)).cast("long").alias("orders"),
            F.sum("price_l").cast("long").alias("total"),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            "grouping_level",
            "orders",
            "total",
        )
        .transform(present_sorted, "grouping_level", "priority", "status")
    )


# ---------------------------------------------------------------------------
# repetition / boilerplate quality filters (textstats/analysis.py)
# ---------------------------------------------------------------------------


@register(
    "repetition_filter_docs",
    """
WITH feats AS (
    SELECT lang,
           list_filter(list_transform(string_split(text, chr(10)),
                                      s -> trim(s)), s -> s != '') AS lines,
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       w -> w != '') AS ws
    FROM documents
),
bg AS (
    SELECT lang, lines, ws,
           CASE WHEN len(ws) >= 2
                THEN list_transform(range(1, len(ws)),
                                    i -> ws[i] || ' ' || ws[i + 1])
                END AS bigrams
    FROM feats
),
ppm AS (
    SELECT lang,
           CASE WHEN len(lines) > 0
                THEN CAST(floor((len(lines) - len(list_distinct(lines)))
                                * 1000000.0 / len(lines)) AS BIGINT)
                ELSE 0 END AS dup_line_ppm,
           CASE WHEN len(ws) > 0
                THEN CAST(floor((len(ws) - len(list_distinct(ws)))
                                * 1000000.0 / len(ws)) AS BIGINT)
                ELSE 0 END AS dup_word_ppm,
           CASE WHEN len(ws) >= 2
                THEN CAST(floor(list_max(list_transform(list_distinct(bigrams),
                               x -> len(list_filter(bigrams, y -> y = x))))
                                * 1000000.0 / (len(ws) - 1)) AS BIGINT)
                ELSE 0 END AS top_bigram_ppm
    FROM bg
)
SELECT lang AS key,
       CAST(COUNT(*) AS BIGINT) AS docs,
       CAST(SUM(CASE WHEN dup_line_ppm < 300000 AND dup_word_ppm < 400000
                      AND top_bigram_ppm < 400000 THEN 1 ELSE 0 END)
            AS BIGINT) AS kept,
       CAST(SUM(dup_word_ppm) AS BIGINT) AS dup_word_ppm_sum,
       CAST(SUM(top_bigram_ppm) AS BIGINT) AS top_bigram_ppm_sum
FROM ppm
GROUP BY lang
ORDER BY key
""",
)
def repetition_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-family repetition filters (duplicate-line/word fraction, top
    word-bigram share; Rae et al. 2021 §A1.1) as ppm integers so both
    engines' float paths are bit-identical (same (count*1e6)/n op order).
    All array ops, no explode, no shuffle until the final per-lang rollup
    (textstats/analysis.py repetition family)."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")

    lines = F.filter(
        F.transform(F.split(F.col("text"), "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    ws = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda w: w != ""
    )
    base = docs.select(
        "lang", lines.alias("lines"), ws.alias("ws")
    ).withColumn(
        "bigrams",
        F.when(
            F.size("ws") >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size("ws") - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("ws", i + 1),
                    F.element_at("ws", i + 2),
                ),
            ),
        ),
    )
    nl, nw = F.size("lines"), F.size("ws")
    dup_line_ppm = F.when(
        nl > 0,
        F.floor((nl - F.size(F.array_distinct("lines"))) * 1000000.0 / nl),
    ).otherwise(0).cast("long")
    dup_word_ppm = F.when(
        nw > 0,
        F.floor((nw - F.size(F.array_distinct("ws"))) * 1000000.0 / nw),
    ).otherwise(0).cast("long")
    top_count = F.aggregate(
        F.array_distinct("bigrams"),
        F.lit(0),
        lambda acc, b: F.greatest(
            acc, F.size(F.filter(F.col("bigrams"), lambda y: y == b))
        ),
    )
    top_bigram_ppm = F.when(
        nw >= 2, F.floor(top_count * 1000000.0 / (nw - 1))
    ).otherwise(0).cast("long")

    ppm = base.select(
        "lang",
        dup_line_ppm.alias("dup_line_ppm"),
        dup_word_ppm.alias("dup_word_ppm"),
        top_bigram_ppm.alias("top_bigram_ppm"),
    )
    keep = (
        (F.col("dup_line_ppm") < 300000)
        & (F.col("dup_word_ppm") < 400000)
        & (F.col("top_bigram_ppm") < 400000)
    )
    return (
        ppm.groupBy(F.col("lang").alias("key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum(keep.cast("int")).cast("long").alias("kept"),
            F.sum("dup_word_ppm").cast("long").alias("dup_word_ppm_sum"),
            F.sum("top_bigram_ppm").cast("long").alias("top_bigram_ppm_sum"),
        )
        .transform(present_sorted, "key")
    )


# ---------------------------------------------------------------------------
# semi-structured JSON expansion (F11 at event scale)
# ---------------------------------------------------------------------------


@register(
    "events_json_props",
    """
SELECT event_type AS key,
       CAST(COUNT(*) AS BIGINT) AS events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
       CAST(SUM(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) >= 50
                     THEN 1 ELSE 0 END) AS BIGINT) AS k_high
FROM events
GROUP BY key
ORDER BY key
""",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from a JSON string column with an explicit schema
    (from_json, JVM-side) — no schema inference pass over 100 TB, malformed
    rows become NULLs not failures."""
    from pyspark.sql.types import LongType, StructField, StructType

    ev = load_table(spark, sf_dir, "events").select("event_type", "props")
    schema = StructType([StructField("k", LongType())])
    k = F.from_json(F.col("props"), schema)["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy(F.col("event_type").alias("key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("events"),
            F.sum("k").cast("long").alias("k_sum"),
            F.max("k").cast("long").alias("k_max"),
            F.sum((F.col("k") >= 50).cast("int")).cast("long").alias("k_high"),
        )
        .transform(present_sorted, "key")
    )


# ---------------------------------------------------------------------------
# range (interval) join (operators/rangejoin.py)
# ---------------------------------------------------------------------------


@register(
    "range_join_error_context",
    """
SELECT c.event_type AS key,
       CAST(COUNT(*) AS BIGINT) AS pairs,
       CAST(COUNT(DISTINCT e.event_id) AS BIGINT) AS errors_matched,
       CAST(SUM(c.event_id) AS BIGINT) AS ctx_ref_sum
FROM events e
JOIN events c
  ON e.user_id = c.user_id
 AND c.event_type IN ('click', 'view')
 AND CAST(floor(epoch(c.ts)) AS BIGINT) <= CAST(floor(epoch(e.ts)) AS BIGINT)
 AND CAST(floor(epoch(c.ts)) AS BIGINT)
     >= CAST(floor(epoch(e.ts)) AS BIGINT) - 600
WHERE e.event_type = 'error'
GROUP BY key
ORDER BY key
""",
)
def range_join_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join without per-key cross products: each error event
    paired with the same user's click/view events from the preceding 10
    minutes (the "what led to the error" funnel query) via window-sized
    bucket equi-join + exact predicate (operators/rangejoin.py). The oracle
    runs the naive inequality join — hash-equality proves the bucketization
    is exactness-preserving."""
    from msgvault_spark.operators.rangejoin import range_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    context = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        "ts",
        F.col("event_id").alias("ctx_id"),
        F.col("event_type").alias("ctx_type"),
    )
    pairs = range_join(
        errors, context,
        on="user_id", left_ts="ts", right_ts="ts",
        window_s=600, direction="backward",
    )
    return (
        pairs.groupBy(F.col("ctx_type").alias("key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("pairs"),
            F.count_distinct("event_id").cast("long").alias("errors_matched"),
            F.sum("ctx_id").cast("long").alias("ctx_ref_sum"),
        )
        .transform(present_sorted, "key")
    )


# ---------------------------------------------------------------------------
# analytic window-function family (W-family breadth)
# ---------------------------------------------------------------------------


@register(
    "window_family_orders",
    """
WITH w AS (
    SELECT o_orderpriority AS pri,
           o_orderkey,
           CAST(floor(o_totalprice) AS BIGINT) AS price_l,
           LAG(o_orderkey) OVER win AS prev_key,
           LEAD(o_orderkey) OVER win AS next_key,
           NTILE(4) OVER win AS quartile,
           CAST(floor(PERCENT_RANK() OVER win * 1000000) AS BIGINT)
               AS pct_rank_ppm,
           CAST(floor(CUME_DIST() OVER win * 1000000) AS BIGINT)
               AS cume_ppm,
           FIRST_VALUE(o_orderkey) OVER win AS cheapest_key,
           CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)) OVER (
               PARTITION BY o_orderpriority ORDER BY o_totalprice ASC,
               o_orderkey ASC ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS running_total
    FROM orders
    WINDOW win AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice ASC, o_orderkey ASC)
)
SELECT pri AS key,
       CAST(SUM(quartile) AS BIGINT) AS quartile_sum,
       CAST(SUM(pct_rank_ppm) AS BIGINT) AS pct_rank_sum,
       CAST(SUM(cume_ppm) AS BIGINT) AS cume_sum,
       CAST(COUNT(prev_key) AS BIGINT) AS with_prev,
       CAST(COUNT(next_key) AS BIGINT) AS with_next,
       CAST(MIN(cheapest_key) AS BIGINT) AS cheapest_key,
       CAST(MAX(running_total) AS BIGINT) AS grand_total
FROM w
GROUP BY pri
ORDER BY key
""",
)
def window_family_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole analytic-window family over one shared (partition, order)
    spec — lag/lead/ntile/percent_rank/cume_dist/first_value/running sum
    all reuse a single sort+exchange (checked by the shared WINDOW clause
    on the oracle side too)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        "o_orderkey",
        F.floor("o_totalprice").cast("long").alias("price_l"),
        "o_totalprice",
    )
    win = Window.partitionBy("pri").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    run = win.rowsBetween(Window.unboundedPreceding, 0)
    w = orders.select(
        "pri",
        F.lag("o_orderkey").over(win).alias("prev_key"),
        F.lead("o_orderkey").over(win).alias("next_key"),
        F.ntile(4).over(win).alias("quartile"),
        F.floor(F.percent_rank().over(win) * 1000000).cast("long").alias(
            "pct_rank_ppm"
        ),
        F.floor(F.cume_dist().over(win) * 1000000).cast("long").alias("cume_ppm"),
        F.first("o_orderkey").over(win).alias("cheapest_key"),
        F.sum("price_l").over(run).alias("running_total"),
    )
    return (
        w.groupBy(F.col("pri").alias("key"))
        .agg(
            F.sum("quartile").cast("long").alias("quartile_sum"),
            F.sum("pct_rank_ppm").cast("long").alias("pct_rank_sum"),
            F.sum("cume_ppm").cast("long").alias("cume_sum"),
            F.count("prev_key").cast("long").alias("with_prev"),
            F.count("next_key").cast("long").alias("with_next"),
            F.min("cheapest_key").cast("long").alias("cheapest_key"),
            F.max("running_total").cast("long").alias("grand_total"),
        )
        .transform(present_sorted, "key")
    )


# ---------------------------------------------------------------------------
# incrementally-maintained aggregate state (operators/incremental_agg.py)
# ---------------------------------------------------------------------------


@register(
    "incremental_agg_orders",
    """
SELECT o_orderpriority AS key,
       CAST(COUNT(o_totalprice) AS BIGINT) AS price_cnt,
       CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS price_sum,
       CAST(MIN(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS price_min,
       CAST(MAX(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS price_max
FROM orders
GROUP BY key
ORDER BY key
""",
)
def incremental_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate served from per-year partial-state rows merged at query
    time (operators/incremental_agg.py) — ingest aggregates only its slice,
    history is never re-scanned. The oracle aggregates the raw table
    directly; hash-equality proves state-merge == full recompute."""
    from msgvault_spark.operators.incremental_agg import (
        build_agg_state,
        merge_agg_state,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.year("o_orderdate").alias("y"),
        F.floor("o_totalprice").cast("long").alias("price"),
    )
    state = build_agg_state(orders, ["o_orderpriority"], ["y"], {"price": "price"})
    merged = merge_agg_state(state.drop("y"), ["o_orderpriority"])
    return merged.select(
        F.col("o_orderpriority").alias("key"),
        F.col("price_cnt").cast("long").alias("price_cnt"),
        F.col("price_sum").cast("long").alias("price_sum"),
        F.col("price_min").cast("long").alias("price_min"),
        F.col("price_max").cast("long").alias("price_max"),
    ).transform(present_sorted, "key")


# ---------------------------------------------------------------------------
# exact interpolated percentiles
# ---------------------------------------------------------------------------


@register(
    "percentiles_order_price",
    """
SELECT o_orderpriority AS key,
       CAST(floor(quantile_cont(CAST(floor(o_totalprice) AS BIGINT), 0.50)
                  * 100 + 0.5) AS BIGINT) AS p50_c,
       CAST(floor(quantile_cont(CAST(floor(o_totalprice) AS BIGINT), 0.95)
                  * 100 + 0.5) AS BIGINT) AS p95_c,
       CAST(floor(quantile_cont(CAST(floor(o_totalprice) AS BIGINT), 0.99)
                  * 100 + 0.5) AS BIGINT) AS p99_c
FROM orders
GROUP BY key
ORDER BY key
""",
)
def percentiles_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`, both (n-1)·p over the sorted values), scaled to
    cents and half-up rounded so the float interpolation is hash-stable.
    The scale path for p50/p95/p99 dashboards is `percentile_approx`
    (t-digest, mergeable) — exact here so the oracle can verify."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.floor("o_totalprice").cast("long").alias("price_l"),
    )
    def pct(p, name):
        return F.floor(
            F.percentile("price_l", F.lit(p)) * 100 + F.lit(0.5)
        ).cast("long").alias(name)

    return (
        orders.groupBy(F.col("o_orderpriority").alias("key"))
        .agg(pct(0.50, "p50_c"), pct(0.95, "p95_c"), pct(0.99, "p99_c"))
        .transform(present_sorted, "key")
    )


@register(
    "approx_percentile_check",
    """
SELECT o_orderpriority AS key,
       CAST(floor(quantile_cont(CAST(floor(o_totalprice) AS BIGINT), 0.5))
            AS BIGINT) AS exact_p50,
       CAST(CASE WHEN abs(approx_quantile(CAST(floor(o_totalprice) AS BIGINT), 0.5)
                          - quantile_cont(CAST(floor(o_totalprice) AS BIGINT), 0.5))
                      <= 0.02 * quantile_cont(CAST(floor(o_totalprice) AS BIGINT), 0.5)
                 THEN 1 ELSE 0 END AS BIGINT) AS approx_ok
FROM orders
GROUP BY key
ORDER BY key
""",
)
def approx_percentile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable approximate quantiles (Spark KLL-style percentile_approx /
    DuckDB t-digest) — the 100 TB p50 path. Engine-neutral comparable
    output, same contract as hll_distinct_rollup: exact median + a flag
    that THIS engine's sketch lands within 2%."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.floor("o_totalprice").cast("long").alias("price_l"),
    )
    exact = F.floor(F.percentile("price_l", F.lit(0.5))).cast("long")
    approx = F.percentile_approx("price_l", F.lit(0.5), F.lit(10000))
    return (
        orders.groupBy(F.col("o_orderpriority").alias("key"))
        .agg(
            exact.alias("exact_p50"),
            (
                F.abs(approx - exact) <= 0.02 * exact
            ).cast("long").alias("approx_ok"),
        )
        .transform(present_sorted, "key")
    )


# ---------------------------------------------------------------------------
# group-wise top-k + table profiling
# ---------------------------------------------------------------------------


@register(
    "topk_orders_per_priority",
    """
WITH ranked AS (
    SELECT o_orderpriority, o_orderkey,
           CAST(floor(o_totalprice) AS BIGINT) AS price_l,
           ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC
           ) AS rn
    FROM orders
)
SELECT o_orderpriority AS key, rn,
       CAST(o_orderkey AS BIGINT) AS o_orderkey, price_l
FROM ranked WHERE rn <= 3
ORDER BY key, rn
""",
)
def topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise top-k (3 priciest orders per priority): rank-filter
    window. Spark pushes the k-limit into the sort via
    WindowGroupLimit — each partition keeps a 3-row heap, never the full
    sorted group."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_orderpriority").alias("key"),
            "rn",
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.floor("o_totalprice").cast("long").alias("price_l"),
        )
        .transform(present_sorted, "key", "rn")
    )


@register(
    "profile_orders_table",
    """
SELECT 'o_custkey' AS col,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(o_custkey) AS BIGINT) AS n_nonnull,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
       CAST(MIN(o_custkey) AS VARCHAR) AS min_v,
       CAST(MAX(o_custkey) AS VARCHAR) AS max_v
FROM orders
UNION ALL
SELECT 'o_orderpriority',
       CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(o_orderpriority) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
       CAST(MIN(o_orderpriority) AS VARCHAR),
       CAST(MAX(o_orderpriority) AS VARCHAR)
FROM orders
ORDER BY col
""",
)
def profile_orders_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (null counts, distincts, min/max as strings) — the
    data-quality pass a pipeline runs before training ingestion. One row
    per profiled column, one scan per profile set (Spark computes all
    column profiles in a single aggregate; the UNION here is oracle-side
    only)."""
    orders = load_table(spark, sf_dir, "orders")

    def profile(col):
        return F.struct(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count(col).cast("long").alias("n_nonnull"),
            F.count_distinct(F.col(col)).cast("long").alias("n_distinct"),
            F.min(col).cast("string").alias("min_v"),
            F.max(col).cast("string").alias("max_v"),
        ).alias(col)

    row = orders.agg(profile("o_custkey"), profile("o_orderpriority"))
    cols = ["o_custkey", "o_orderpriority"]
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(c).alias("p"),
                    )
                    for c in cols
                ]
            )
        ).alias("e")
    )
    return stacked.select(
        F.col("e.col").alias("col"),
        F.col("e.p.n_rows").alias("n_rows"),
        F.col("e.p.n_nonnull").alias("n_nonnull"),
        F.col("e.p.n_distinct").alias("n_distinct"),
        F.col("e.p.min_v").alias("min_v"),
        F.col("e.p.max_v").alias("max_v"),
    ).orderBy("col")


# ---------------------------------------------------------------------------
# SCD Type-2 versioned dimension merge (operators/scd.py)
# ---------------------------------------------------------------------------


@register(
    "scd2_customer_priority",
    """
WITH dim AS (
    SELECT o_custkey AS id,
           min_by(o_orderpriority, o_orderdate || '-' || o_orderkey) AS pri,
           MIN(o_orderdate) AS valid_from
    FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY o_custkey
),
u AS (
    SELECT o_custkey AS id,
           max_by(o_orderpriority, o_orderdate || '-' || o_orderkey) AS pri,
           MAX(o_orderdate) AS eff
    FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY o_custkey
),
merged AS (
    -- untouched + unchanged current rows
    SELECT d.id, d.pri, 1 AS is_current FROM dim d
    LEFT JOIN u ON u.id = d.id
    WHERE u.id IS NULL OR u.pri = d.pri
    UNION ALL
    -- closed old versions
    SELECT d.id, d.pri, 0 FROM dim d JOIN u ON u.id = d.id
    WHERE u.pri != d.pri
    UNION ALL
    -- inserted new versions (changed or brand-new key)
    SELECT u.id, u.pri, 1 FROM u LEFT JOIN dim d ON d.id = u.id
    WHERE d.id IS NULL OR d.pri != u.pri
)
SELECT pri AS key,
       CAST(COUNT(*) AS BIGINT) AS versions,
       CAST(SUM(is_current) AS BIGINT) AS current_rows
FROM merged
GROUP BY pri
ORDER BY key
""",
)
def scd2_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 merge (operators/scd.py): customer priority dimension
    seeded from pre-1997 orders, updated with the 1997+ batch — changed
    keys close their old version and insert a new current one, unchanged
    keys don't churn, new keys insert. Version counts per priority; the
    oracle replays the same merge relationally."""
    from msgvault_spark.operators.scd import scd2_merge

    orders = load_table(spark, sf_dir, "orders")
    tiebreak = F.concat(
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        F.lit("-"),
        F.col("o_orderkey").cast("string"),
    )
    dim = (
        orders.filter(F.col("o_orderdate") < "1997-01-01")
        .groupBy(F.col("o_custkey").alias("id"))
        .agg(
            F.min_by("o_orderpriority", tiebreak).alias("pri"),
            F.min("o_orderdate").alias("valid_from"),
        )
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
    )
    updates = (
        orders.filter(F.col("o_orderdate") >= "1997-01-01")
        .groupBy(F.col("o_custkey").alias("id"))
        .agg(
            F.max_by("o_orderpriority", tiebreak).alias("pri"),
            F.max("o_orderdate").alias("effective_ts"),
        )
    )
    merged = scd2_merge(dim, updates, key="id", attrs=["pri"])
    return (
        merged.groupBy(F.col("pri").alias("key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("versions"),
            F.sum(F.col("valid_to").isNull().cast("int"))
            .cast("long")
            .alias("current_rows"),
        )
        .transform(present_sorted, "key")
    )


@register(
    "top_bigrams_corpus",
    r"""
WITH ws AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       w -> w != '') AS w
    FROM documents
),
bg AS (
    SELECT doc_id,
           unnest(CASE WHEN len(w) >= 2
                  THEN list_transform(range(1, len(w)),
                                      i -> w[i] || ' ' || w[i + 1])
                  ELSE [] END) AS bigram
    FROM ws
)
SELECT bigram AS key,
       CAST(COUNT(*) AS BIGINT) AS occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
FROM bg
GROUP BY bigram
ORDER BY occurrences DESC, key ASC
LIMIT 25
""",
)
def top_bigrams_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: top word-bigrams by occurrence with document
    frequency — the phrase-stats pass behind boilerplate detection and
    tokenizer vocab audits. Map-side: per-doc bigram arrays (no shuffle
    until the count), top-25 via TakeOrdered heap."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), "[^a-z0-9]+"), lambda w: w != ""
        ).alias("w"),
    )
    bg = ws.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("w") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - 2),
                    lambda i: F.concat_ws(
                        " ", F.element_at("w", i + 1), F.element_at("w", i + 2)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram"),
    )
    return (
        bg.groupBy(F.col("bigram").alias("key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("occurrences"),
            F.count_distinct("doc_id").cast("long").alias("doc_freq"),
        )
        .orderBy(F.col("occurrences").desc(), F.col("key").asc())
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Round-2: deterministic train/val/test split + temperature mixing
# ---------------------------------------------------------------------------

_T1 = int(0.8 * 2147483647)
_T2 = int(0.9 * 2147483647)


@register(
    "train_val_test_split",
    f"""
SELECT CASE WHEN {_HASH_SQL} < {_T1} THEN 'train'
            WHEN {_HASH_SQL} < {_T2} THEN 'val'
            ELSE 'test' END AS split,
       source AS key,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM documents
GROUP BY 1, 2
ORDER BY split, key
""",
)
def train_val_test_split_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 split as a pure function of the key hash (operators/
    sampling.py:train_val_test_split): membership can never migrate
    between train and eval across reruns/backfills/engines. id_sum pins
    exact membership per (split, source) cell, not just counts."""
    from msgvault_spark.operators.sampling import train_val_test_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        train_val_test_split(docs, "doc_id", train=0.8, val=0.1)
        .groupBy("split", F.col("source").alias("key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        .transform(present_sorted, "split", "key")
    )


@register(
    "temperature_mix_sources",
    f"""
WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
w AS (SELECT source, n,
             CAST(floor(sqrt(n) * 1000000) AS BIGINT) AS w
      FROM counts),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tot_n, CAST(SUM(w) AS BIGINT) AS tot_w
        FROM w),
rates AS (
    SELECT source,
           CAST(floor(least(1.0,
               (0.5 * CAST(tot_n AS DOUBLE) * CAST(w AS DOUBLE))
               / (CAST(tot_w AS DOUBLE) * CAST(n AS DOUBLE))) * 2147483647)
             AS BIGINT) AS thr
    FROM w CROSS JOIN tot)
SELECT d.source AS key,
       CAST(COUNT(*) AS BIGINT) AS kept,
       CAST(SUM(d.doc_id) AS BIGINT) AS id_sum
FROM documents d JOIN rates r ON r.source = d.source
WHERE {_HASH_SQL} < r.thr
GROUP BY d.source
ORDER BY key
""",
)
def temperature_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """√n temperature mixing (operators/sampling.py:temperature_mix):
    keep rates derived in-plan from per-source counts (broadcast dim, no
    collect), applied as a map-side hash filter targeting ~50% survival.
    Fixed-point weights make the cross-source total an order-free integer
    sum, so the thresholds are bit-identical in any engine."""
    from msgvault_spark.operators.sampling import temperature_mix

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        temperature_mix(docs, "source", "doc_id", target_frac=0.5)
        .groupBy(F.col("source").alias("key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("kept"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        .transform(present_sorted, "key")
    )


@register(
    "token_budget_mix_plan",
    """
WITH tokens AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(COALESCE(text, '')),
                  '[^a-z0-9]+')) AS term
    FROM documents
),
ntok AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens
         FROM tokens WHERE term != '' GROUP BY doc_id),
per_src AS (
    SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(COALESCE(n.n_tokens, 0)) AS BIGINT) AS n_tokens
    FROM documents d LEFT JOIN ntok n ON n.doc_id = d.doc_id
    GROUP BY d.source
),
w AS (SELECT source, n_docs, n_tokens,
             CAST(floor(sqrt(n_tokens) * 1000000) AS BIGINT) AS weight
      FROM per_src),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tok,
               CAST(SUM(weight) AS BIGINT) AS tot_w FROM w),
plan AS (
    SELECT source, n_docs, n_tokens, weight,
           CAST(floor(0.5 * CAST(tot_tok AS DOUBLE)
                      * CAST(weight AS DOUBLE)
                      / CAST(tot_w AS DOUBLE)) AS BIGINT) AS target_tokens
    FROM w CROSS JOIN tot)
SELECT source, n_docs, n_tokens, weight, target_tokens,
       CASE WHEN n_tokens > 0
            THEN CAST(floor(CAST(target_tokens AS DOUBLE) * 1000000.0
                            / CAST(n_tokens AS DOUBLE)) AS BIGINT)
            ELSE 0 END AS epochs_micro
FROM plan
ORDER BY source
""",
)
def token_budget_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture planning — the recipe step a training-data
    pipeline runs BEFORE sampling: per-source token counts (from the
    memoized FTS postings, not a re-tokenize), √-temperature weights
    (T=2; sqrt is the one power IEEE-correctly-rounds everywhere, same
    discipline as temperature_mix), and for a budget of half the corpus
    tokens: the per-source token target and the fixed-point epoch factor
    (>10⁶ = upsample, <10⁶ = downsample) that epoch_upsample /
    temperature_mix then execute. Pure aggregation over artifact scans;
    per-source rows are dim-sized at any corpus scale."""
    from msgvault_spark.sources.cache import get_text_index

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    _postings, stats = get_text_index(
        spark, sf_dir, "documents", "doc_id", "text"
    )
    # doc_stats.dl IS the per-doc token count — no postings re-aggregation
    ntok = stats.select("doc_id", F.col("dl").cast("long").alias("n_tokens"))
    per_src = (
        docs.join(ntok, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.coalesce(F.col("n_tokens"), F.lit(0)))
            .cast("long")
            .alias("n_tokens"),
        )
    )
    w = per_src.withColumn(
        "weight", F.floor(F.sqrt(F.col("n_tokens")) * 1_000_000).cast("long")
    )
    tot = w.agg(
        F.sum("n_tokens").cast("long").alias("tot_tok"),
        F.sum("weight").cast("long").alias("tot_w"),
    )
    target = F.floor(
        F.lit(0.5)
        * F.col("tot_tok").cast("double")
        * F.col("weight").cast("double")
        / F.col("tot_w").cast("double")
    ).cast("long")
    staged = w.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", "n_tokens", "weight",
        target.alias("target_tokens"),
    )
    epochs = (
        F.when(
            F.col("n_tokens") > 0,
            F.floor(
                F.col("target_tokens").cast("double")
                * F.lit(1000000.0)
                / F.col("n_tokens").cast("double")
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
    )
    return staged.withColumn("epochs_micro", epochs).transform(
        present_sorted, "source"
    )


# ---------------------------------------------------------------------------
# Round-2: bloom-filter semi-join reduction
# ---------------------------------------------------------------------------


@register(
    "bloom_join_orders",
    """
SELECT o.o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_c
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = 'BUILDING' AND c.c_nationkey < 5
GROUP BY 1
ORDER BY priority
""",
)
def bloom_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact orders⋈customer join with bloom semi-join reduction
    (operators/bloomjoin.py): an 8 KiB relational bitset of the selective
    customer subset filters the fact side map-side before the exchange.
    Output equals the plain join (oracle), so false positives are
    harmless; the bloom machinery itself is pinned by
    tests/test_operators_scale.py (no false negatives, selectivity,
    filter-below-exchange plan)."""
    from msgvault_spark.operators.bloomjoin import bloom_join

    dim = load_table(spark, sf_dir, "customer").filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_nationkey") < 5)
    ).select(F.col("c_custkey").alias("o_custkey"))
    fact = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
    )
    return (
        bloom_join(fact, dim, "o_custkey")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("price_c").cast("long").alias("total_c"),
        )
        .transform(present_sorted, "priority")
    )


@register(
    "epoch_upsample_sources",
    f"""
WITH n AS (
    SELECT doc_id, source,
           CASE source
               WHEN 'src0' THEN 2 + CASE WHEN {_HASH_SQL}
                    < CAST(floor(0.5 * 2147483647) AS BIGINT) THEN 1 ELSE 0 END
               WHEN 'src2' THEN 1 + CASE WHEN {_HASH_SQL}
                    < CAST(floor(0.25 * 2147483647) AS BIGINT) THEN 1 ELSE 0 END
               ELSE 1
           END AS copies
    FROM documents
),
ex AS (SELECT doc_id, source, unnest(range(0, copies)) AS epoch FROM n)
SELECT source AS key,
       CAST(COUNT(*) AS BIGINT) AS rows_out,
       CAST(SUM(doc_id * (epoch + 1)) AS BIGINT) AS weighted_id_sum
FROM ex
GROUP BY source
ORDER BY key
""",
)
def epoch_upsample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-based upsampling (operators/sampling.py:epoch_upsample):
    src0 runs 2.5 epochs (2 copies + a deterministic hash-chosen half
    gets a 3rd), src1 exactly 1, src2 1.25. weighted_id_sum pins both
    membership AND per-row copy counts, not just totals."""
    from msgvault_spark.operators.sampling import epoch_upsample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    up = epoch_upsample(
        docs, "source", "doc_id", {"src0": 2.5, "src2": 1.25}
    )
    return (
        up.groupBy(F.col("source").alias("key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows_out"),
            F.sum(F.col("doc_id") * (F.col("epoch") + 1)).cast("long")
            .alias("weighted_id_sum"),
        )
        .transform(present_sorted, "key")
    )


@register(
    "skew_report_orders",
    """
WITH counts AS (
    SELECT o_orderpriority AS key, COUNT(*) AS n FROM orders GROUP BY 1
),
tot AS (SELECT SUM(n) AS t, MAX(n) AS mx, COUNT(*) AS k FROM counts)
SELECT c.key,
       CAST(c.n AS BIGINT) AS n,
       CAST((c.n * 1000000) // tot.t AS BIGINT) AS share_ppm,
       CAST((tot.mx * tot.k * 1000000) // tot.t AS BIGINT)
           AS hot_over_mean_ppm
FROM counts c CROSS JOIN tot
ORDER BY n DESC, key ASC
""",
)
def skew_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew report — the diagnostic run BEFORE choosing
    between a plain groupBy and the salted operators (operators/
    salted.py): per-key share and the hottest key's multiple of the mean
    (both in exact ppm, integer division). hot_over_mean ≈ k means one
    reducer does k× the average work; that number is the salting
    decision."""
    counts = load_table(spark, sf_dir, "orders").groupBy(
        F.col("o_orderpriority").alias("key")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum("n").alias("t"), F.max("n").alias("mx"),
        F.count(F.lit(1)).alias("k"),
    )
    return (
        counts.join(F.broadcast(tot))
        .select(
            "key",
            F.col("n").cast("long").alias("n"),
            F.expr("(n * 1000000) div t").cast("long").alias("share_ppm"),
            F.expr("(mx * k * 1000000) div t").cast("long")
            .alias("hot_over_mean_ppm"),
        )
        .transform(present_sorted, F.col("n").desc(), F.col("key").asc())
    )


# ---------------------------------------------------------------------------
# Round-2: snapshot/merge machinery under the driver oracle
# ---------------------------------------------------------------------------

_SNAP_MEMO: dict[tuple, str] = {}


@register(
    "snapshot_merge_timetravel",
    """
SELECT 1 AS version,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
UNION ALL
SELECT 2 AS version,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(n_chars + CASE WHEN doc_id % 10 = 3
                               THEN 1000000 ELSE 0 END) AS BIGINT)
           AS sum_chars
FROM documents
ORDER BY version
""",
)
def snapshot_merge_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot isolation + CoW MERGE end-to-end under the oracle
    (sources/snapshots.py, sources/merge.py): v1 = documents committed,
    v2 = MERGE bumping n_chars by 1e6 for doc_id%10==3. Reading BOTH
    versions side by side proves time travel (v1 unchanged post-merge)
    and merge semantics (v2 = base with matched rows replaced) — the
    oracle states each version's expected aggregate directly."""
    import tempfile

    from msgvault_spark.sources.merge import merge_upsert
    from msgvault_spark.sources.snapshots import read_snapshot

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SNAP_MEMO:
        lake = tempfile.mkdtemp(prefix="msgvault_snap_") + "/t"
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "n_chars"
        )
        merge_upsert(spark, lake, docs.repartitionByRange(4, "doc_id"), "doc_id")
        upd = docs.filter(F.col("doc_id") % 10 == 3).select(
            "doc_id", (F.col("n_chars") + 1000000).alias("n_chars")
        )
        merge_upsert(spark, lake, upd, "doc_id")
        _SNAP_MEMO[key] = lake
    lake = _SNAP_MEMO[key]

    def _agg(v: int) -> DataFrame:
        return read_snapshot(spark, lake, version=v).agg(
            F.lit(v).alias("version"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )

    return _agg(1).unionByName(_agg(2)).orderBy("version")


@register(
    "snapshot_diff_versions",
    """
WITH upd AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(CAST(1000000 AS BIGINT)) AS BIGINT) AS delta_chars
    FROM documents WHERE doc_id % 10 = 3
),
ins AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(CAST(7 AS BIGINT)) AS BIGINT) AS delta_chars
    FROM documents WHERE doc_id % 17 = 0
)
SELECT 'inserted' AS change_type, docs, delta_chars FROM ins
UNION ALL
SELECT 'updated', docs, delta_chars FROM upd
ORDER BY change_type
""",
)
def snapshot_diff_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC change feed between two committed versions (Delta CDF /
    Iceberg changelog shape; sources/snapshots.snapshot_diff): v2 = one
    MERGE carrying updates (n_chars +1e6 for doc_id%10==3) AND inserts
    (key −doc_id−1, the negative id space, with n_chars=7 for
    doc_id%17==0 — an additive offset like doc_id+1e6 collides with real
    ids once the corpus passes the constant, silently turning inserts
    into updates). The diff derives
    inserted/updated rows from a full-outer join of the two pinned file
    lists — no snapshot mutated, no table re-scan by consumers — rolled
    up per change_type with the exact BIGINT delta mass. The 'deleted'
    leg of the operator is pinned by tests/test_pipeline_ops.py (merges
    never delete, so this scenario cannot produce one)."""
    import tempfile

    from msgvault_spark.sources.merge import merge_upsert
    from msgvault_spark.sources.snapshots import snapshot_diff

    key = (spark.sparkContext.applicationId, sf_dir, "diff")
    if key not in _SNAP_MEMO:
        lake = tempfile.mkdtemp(prefix="msgvault_snapdiff_") + "/t"
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "n_chars"
        )
        merge_upsert(spark, lake, docs.repartitionByRange(4, "doc_id"), "doc_id")
        upd = docs.filter(F.col("doc_id") % 10 == 3).select(
            "doc_id", (F.col("n_chars") + 1000000).alias("n_chars")
        )
        ins = docs.filter(F.col("doc_id") % 17 == 0).select(
            (-F.col("doc_id") - 1).alias("doc_id"),
            F.lit(7).cast("long").alias("n_chars"),
        )
        merge_upsert(spark, lake, upd.unionByName(ins), "doc_id")
        _SNAP_MEMO[key] = lake
    lake = _SNAP_MEMO[key]

    diff = snapshot_diff(spark, lake, 1, 2, "doc_id", ["n_chars"])
    return (
        diff.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum(
                F.coalesce(F.col("new_n_chars"), F.lit(0))
                - F.coalesce(F.col("old_n_chars"), F.lit(0))
            )
            .cast("long")
            .alias("delta_chars"),
        )
        .transform(present_sorted, "change_type")
    )


@register(
    "snapshot_optimize_vacuum",
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(1 AS BIGINT) AS n_versions
FROM documents
""",
)
def snapshot_optimize_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-aware OPTIMIZE + vacuum end-to-end under the oracle
    (sources/optimize.py:optimize_snapshot): v1 = documents committed
    across 16 scattered files, v2 = z-order-clustered rewrite committed
    as a NEW version (old files left on disk), vacuum retains only v2.
    The latest read after the whole cycle must still be exactly the base
    table (content invariant under re-layout) with exactly one retained
    version — which is what the oracle states."""
    import tempfile

    from msgvault_spark.sources.merge import merge_upsert
    from msgvault_spark.sources.optimize import optimize_snapshot
    from msgvault_spark.sources.snapshots import (
        read_snapshot,
        snapshot_versions,
        vacuum,
    )

    key = (spark.sparkContext.applicationId, sf_dir, "optvac")
    if key not in _SNAP_MEMO:
        lake = tempfile.mkdtemp(prefix="msgvault_optvac_") + "/t"
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "n_chars"
        )
        merge_upsert(spark, lake, docs.repartition(16), "doc_id")
        optimize_snapshot(
            spark, lake, ("doc_id", "n_chars"), target_bytes=1 << 20
        )
        vacuum(spark, lake, keep_versions=1)
        _SNAP_MEMO[key] = lake
    lake = _SNAP_MEMO[key]
    n_versions = len(snapshot_versions(lake))
    return read_snapshot(spark, lake).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.lit(n_versions).cast("long").alias("n_versions"),
    )


@register(
    "global_shuffle_shards",
    f"""
WITH h AS (
    SELECT doc_id, source,
           CAST(({_HASH_SQL}) % 8 AS INT) AS shard,
           (({_HASH_SQL}) * 1327217885) % 2147483647 AS pos_key
    FROM documents
),
ranked AS (
    SELECT doc_id, source, shard,
           ROW_NUMBER() OVER (
               PARTITION BY shard ORDER BY pos_key ASC, doc_id ASC
           ) - 1 AS pos
    FROM h
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       CAST(SUM(CASE WHEN pos < 3 THEN doc_id ELSE 0 END) AS BIGINT)
           AS head_ids,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM ranked
GROUP BY shard
ORDER BY shard
""",
)
def global_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard assignment
    (operators/sharding.py): the dataloader-facing final step — shard =
    hash mod 8, within-shard order by a second-round hash. ``head_ids``
    (sum of doc_ids at positions 0-2) pins the exact within-shard ORDER,
    not just membership; ``n_sources`` shows each shard mixes sources.
    One exchange + one sort — the floor for any global shuffle."""
    from msgvault_spark.operators.sharding import global_shuffle_shards as gss

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sharded = gss(docs, "doc_id", 8)
    return (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.sum(F.when(F.col("pos") < 3, F.col("doc_id")).otherwise(0))
            .cast("long")
            .alias("head_ids"),
            F.count_distinct("source").cast("long").alias("n_sources"),
        )
        .transform(present_sorted, "shard")
    )

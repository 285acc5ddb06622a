"""Repeated-substring span coverage: how much of each document is made of
token runs that occur elsewhere in the corpus (or again in the same doc).

Published shape: Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better" find duplicated >=50-token substrings with a
corpus-wide suffix array and delete them.  A suffix array is a global
sorted structure with no good shuffle decomposition; the Spark-first
equivalent used by at-scale pipelines is fixed-width shingle matching:
any duplicated run of >= 2w-1 tokens is guaranteed to contain a
duplicated w-token shingle, so w-shingle coverage is a sound detector
with resolution w.  The reference engine (wesm/msgvault) has no
counterpart; this extends the dedup family (minhash.py, winnow.py,
lines.py) from set- and fingerprint-similarity down to exact substring
evidence.

Exact interval union without a range join: a duplicated shingle starting
at s covers tokens [s, s+w-1].  Sorted by s per document, the union of
fixed-length intervals telescopes —

    covered = sum over duplicated starts of min(w, s - prev_s)

(first start contributes w).  That is one LAG window partitioned by
document, never by anything corpus-sized.

Scale shape (100 TB): tokenize+shingle is a pure map; the duplicate test
is ONE corpus-wide groupBy(shingle-hash) with map-side combine (hot
shingles collapse to a count before the shuffle); marking instances is a
hash-keyed shuffle join (AQE skew-split handles viral shingles); the
interval union is a per-doc window.  The shingle-count table is the ETL
artifact to persist when the corpus is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shingle_starts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    w: int = 8,
) -> DataFrame:
    """(doc_id, n_tokens, start, h): every w-token shingle instance with
    its 1-based start position and md5 hash (the portable hash — the
    DuckDB twin replays it bit-for-bit).  Docs with < w tokens emit
    nothing here; the report re-anchors on the doc table so they still
    appear with zero coverage."""
    from msgvault_spark.textstats.analysis import words

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        words(F.coalesce(F.col(text_col), F.lit(""))).alias("ws"),
    ).filter(F.size("ws") >= w)
    toks = toks.select("doc_id", "ws", F.size("ws").alias("n_tokens"))
    # plain column reference inside the lambda (winnow.py binding rule)
    sh = toks.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("n_tokens") - (w - 1)),
                lambda i: F.struct(
                    i.alias("start"),
                    F.md5(F.concat_ws(" ", F.slice(F.col("ws"), i, w))).alias(
                        "h"
                    ),
                ),
            )
        ).alias("s"),
    )
    return sh.select("doc_id", "n_tokens", "s.start", "s.h")


def duplicated_starts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    w: int = 8,
) -> DataFrame:
    """(doc_id, n_tokens, start): shingle instances whose hash occurs
    >= 2 times corpus-wide — the ETL artifact of this operator (the
    corpus-scale groupBy + join live here; everything after is a per-doc
    window).  'Duplicated' counts TOTAL occurrences, so a doc repeating
    its own paragraph is flagged too (Lee et al. include
    self-repetition)."""
    sh = shingle_starts(docs, id_col, text_col, w=w)
    dup = (
        sh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("h")
    )
    return sh.join(dup, "h").select("doc_id", "n_tokens", "start")


def duplicated_span_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    w: int = 8,
    top_n: int = 100,
    marked: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, dup_starts, covered_tokens, covered_ppm): the
    top-N documents by fraction of tokens inside duplicated w-shingles
    (ties by doc_id).  Pass ``marked`` (a persisted duplicated_starts
    frame) to serve from the artifact instead of re-deriving it."""
    if marked is None:
        marked = duplicated_starts(docs, id_col, text_col, w=w)
    win = Window.partitionBy("doc_id").orderBy("start")
    gap = F.col("start") - F.lag("start").over(win)
    cover = F.when(gap.isNull() | (gap >= w), F.lit(w)).otherwise(gap)
    per_doc = (
        marked.select("doc_id", "start", cover.alias("cov"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("dup_starts"),
            F.sum("cov").cast("long").alias("covered_tokens"),
        )
    )
    # the anchor (every doc with >= w tokens) is a pure map over the doc
    # table — no shingling, so serving from the artifact stays cheap
    from msgvault_spark.textstats.analysis import words

    base = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(
                words(F.coalesce(F.col(text_col), F.lit("")))
            ).alias("n_tokens"),
        )
        .filter(F.col("n_tokens") >= w)
    )
    out = (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("dup_starts"), F.lit(0)).cast("long").alias(
                "dup_starts"
            ),
            F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("long").alias(
                "covered_tokens"
            ),
        )
        .withColumn(
            "covered_ppm",
            F.expr("(covered_tokens * 1000000) div n_tokens"),
        )
    )
    return out.orderBy(
        F.col("covered_ppm").desc(), F.col("doc_id").asc()
    ).limit(top_n)


def span_coverage_oracle_sql(
    *,
    w: int = 8,
    top_n: int = 100,
    token_re: str = "[^a-z0-9]+",
) -> str:
    """DuckDB twin: identical tokenization, shingling (1-based inclusive
    list slice of w tokens), md5 hashing, >=2 duplicate rule, and LAG
    telescoping interval union."""
    return f"""
WITH m AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(COALESCE(text, '')),
                       '{token_re}'), x -> x != '') AS ws
    FROM documents
),
d AS (
    SELECT doc_id, len(ws) AS n_tokens, ws FROM m WHERE len(ws) >= {w}
),
sh0 AS (
    SELECT doc_id, n_tokens, ws,
           unnest(generate_series(1, len(ws) - {w - 1})) AS s
    FROM d
),
sh AS (
    SELECT doc_id, n_tokens, s,
           md5(list_aggregate(ws[s:s + {w - 1}], 'string_agg', ' ')) AS h
    FROM sh0
),
dup AS (SELECT h FROM sh GROUP BY h HAVING COUNT(*) >= 2),
ds AS (SELECT sh.doc_id, sh.s FROM sh JOIN dup USING (h)),
g AS (
    SELECT doc_id, s,
           s - lag(s) OVER (PARTITION BY doc_id ORDER BY s) AS gap
    FROM ds
),
c AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS dup_starts,
           CAST(SUM(CASE WHEN gap IS NULL OR gap >= {w}
                         THEN {w} ELSE gap END) AS BIGINT) AS covered_tokens
    FROM g GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(d.n_tokens AS BIGINT) AS n_tokens,
       COALESCE(c.dup_starts, 0) AS dup_starts,
       COALESCE(c.covered_tokens, 0) AS covered_tokens,
       (COALESCE(c.covered_tokens, 0) * 1000000) // d.n_tokens
           AS covered_ppm
FROM d LEFT JOIN c USING (doc_id)
ORDER BY covered_ppm DESC, doc_id ASC
LIMIT {top_n}
"""


def clean_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    w: int = 8,
    marked: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, kept_tokens, cleaned_hash): the DELETION half
    of Lee et al. 2022 — drop every token covered by a duplicated
    w-shingle, keep the rest in order, and emit md5 of the cleaned
    space-joined text (the hash keeps driver payloads scalar-small; the
    cleaned text itself is the same concat both engines compute).

    Per-doc work is a position filter against the doc's own duplicated
    START ARRAY — O(n·|starts|) per doc worst case, bounded by document
    length like the text itself (a sorted-merge bitmap is the constant-
    factor upgrade if pathological docs dominate; the shuffle shape is
    already minimal: the one corpus groupBy lives in the
    duplicated_starts artifact).  Every doc with >= 1 token appears;
    docs shorter than w keep everything."""
    from msgvault_spark.textstats.analysis import words

    if marked is None:
        marked = duplicated_starts(docs, id_col, text_col, w=w)
    sa = marked.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("start")).alias("sa")
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        words(F.coalesce(F.col(text_col), F.lit(""))).alias("ws"),
    ).filter(F.size("ws") >= 1)
    j = toks.join(sa, "doc_id", "left").select(
        "doc_id",
        "ws",
        F.coalesce(F.col("sa"), F.array().cast("array<int>")).alias("sa"),
    )
    kept = F.filter(
        F.sequence(F.lit(1), F.size(F.col("ws"))),
        lambda p: ~F.exists(
            F.col("sa"), lambda s: (s <= p) & (p < s + w)
        ),
    )
    j = j.select(
        "doc_id",
        F.size("ws").cast("long").alias("n_tokens"),
        F.transform(kept, lambda p: F.element_at(F.col("ws"), p)).alias(
            "kept"
        ),
    )
    return j.select(
        "doc_id",
        "n_tokens",
        F.size("kept").cast("long").alias("kept_tokens"),
        F.md5(F.concat_ws(" ", F.col("kept"))).alias("cleaned_hash"),
    )


def clean_spans_oracle_sql(
    *,
    w: int = 8,
    token_re: str = "[^a-z0-9]+",
) -> str:
    """DuckDB twin of clean_spans.  Two empty-input parity rules:
    string_agg over an empty kept list yields NULL where Spark's
    concat_ws yields '' (hash argument coalesces to ''), and
    list_bool_or over an EMPTY list yields NULL where Spark's
    F.exists yields false — without the COALESCE(..., FALSE) the NOT
    turns NULL and an unduplicated doc loses every token."""
    return f"""
WITH m AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(COALESCE(text, '')),
                       '{token_re}'), x -> x != '') AS ws
    FROM documents
),
d AS (
    SELECT doc_id, len(ws) AS n_tokens, ws FROM m WHERE len(ws) >= {w}
),
sh0 AS (
    SELECT doc_id, ws,
           unnest(generate_series(1, len(ws) - {w - 1})) AS s
    FROM d
),
sh AS (
    SELECT doc_id, s,
           md5(list_aggregate(ws[s:s + {w - 1}], 'string_agg', ' ')) AS h
    FROM sh0
),
dup AS (SELECT h FROM sh GROUP BY h HAVING COUNT(*) >= 2),
sa AS (
    SELECT sh.doc_id, list_sort(list(sh.s)) AS sa
    FROM sh JOIN dup USING (h) GROUP BY sh.doc_id
),
base AS (SELECT doc_id, ws FROM m WHERE len(ws) >= 1),
j AS (
    SELECT b.doc_id, b.ws, COALESCE(sa.sa, []) AS sa
    FROM base b LEFT JOIN sa USING (doc_id)
),
k AS (
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_tokens,
           list_transform(
               list_filter(generate_series(1, len(ws)),
                   p -> NOT COALESCE(list_bool_or(
                       list_transform(sa,
                           s -> s <= p AND p < s + {w})), FALSE)),
               p -> ws[p]) AS kept
    FROM j
)
SELECT doc_id, n_tokens,
       CAST(len(kept) AS BIGINT) AS kept_tokens,
       md5(COALESCE(list_aggregate(kept, 'string_agg', ' '), ''))
           AS cleaned_hash
FROM k
"""


def coverage_against_index(
    batch: DataFrame,
    index_hashes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    w: int = 8,
) -> DataFrame:
    """Incremental variant: span coverage of a NEW ingest batch against a
    FROZEN shingle-hash index (the duplicated_starts artifact's input,
    distilled to its distinct hash set) — each ingest pays O(batch
    shingles) probing the index, never re-scanning the old corpus (the
    minhash incremental_pairs shape).  ``index_hashes`` must have column
    ``h``."""
    sh = shingle_starts(batch, id_col, text_col, w=w)
    hit = sh.join(index_hashes.select("h").distinct(), "h")
    win = Window.partitionBy("doc_id").orderBy("start")
    gap = F.col("start") - F.lag("start").over(win)
    cover = F.when(gap.isNull() | (gap >= w), F.lit(w)).otherwise(gap)
    per_doc = (
        hit.select("doc_id", "start", cover.alias("cov"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("dup_starts"),
            F.sum("cov").cast("long").alias("covered_tokens"),
        )
    )
    base = sh.select("doc_id", "n_tokens").distinct()
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce(F.col("dup_starts"), F.lit(0)).cast("long").alias(
                "dup_starts"
            ),
            F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("long")
            .alias("covered_tokens"),
        )
        .withColumn(
            "covered_ppm",
            F.expr("(covered_tokens * 1000000) div n_tokens"),
        )
    )


def incremental_coverage_oracle_sql(
    batch_pred: str,
    *,
    w: int = 8,
    token_re: str = "[^a-z0-9]+",
) -> str:
    """DuckDB twin: the index is every shingle hash of the NON-batch
    docs; batch docs' coverage counts a start iff its hash is in the
    index."""
    return f"""
WITH m AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(COALESCE(text, '')),
                       '{token_re}'), x -> x != '') AS ws,
           ({batch_pred}) AS is_batch
    FROM documents
),
d AS (
    SELECT doc_id, len(ws) AS n_tokens, ws, is_batch
    FROM m WHERE len(ws) >= {w}
),
sh0 AS (
    SELECT doc_id, n_tokens, ws, is_batch,
           unnest(generate_series(1, len(ws) - {w - 1})) AS s
    FROM d
),
sh AS (
    SELECT doc_id, n_tokens, s, is_batch,
           md5(list_aggregate(ws[s:s + {w - 1}], 'string_agg', ' ')) AS h
    FROM sh0
),
idx AS (SELECT DISTINCT h FROM sh WHERE NOT is_batch),
hit AS (
    SELECT sh.doc_id, sh.s FROM sh JOIN idx USING (h) WHERE sh.is_batch
),
g AS (
    SELECT doc_id, s,
           s - lag(s) OVER (PARTITION BY doc_id ORDER BY s) AS gap
    FROM hit
),
c AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS dup_starts,
           CAST(SUM(CASE WHEN gap IS NULL OR gap >= {w}
                         THEN {w} ELSE gap END) AS BIGINT) AS covered_tokens
    FROM g GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(d.n_tokens AS BIGINT) AS n_tokens,
       COALESCE(c.dup_starts, 0) AS dup_starts,
       COALESCE(c.covered_tokens, 0) AS covered_tokens,
       (COALESCE(c.covered_tokens, 0) * 1000000) // d.n_tokens
           AS covered_ppm
FROM d LEFT JOIN c USING (doc_id)
WHERE d.is_batch
"""


def dup_position_profile(marked: DataFrame, *, w: int = 8) -> DataFrame:
    """(third, n_starts, n_docs) — WHERE duplicated spans sit inside
    documents: each duplicated shingle start is bucketed into the
    lead/body/tail third of its doc's start range.  Template headers and
    footers show up as lead- or tail-heavy mass, which decides whether
    the removal rule should be span deletion (uniform) or
    prefix/suffix stripping (concentrated) — the recon complement of
    boilerplate_prefixes.  ``marked`` = the duplicated_starts ETL
    artifact (doc_id, n_tokens, start, 1-based); the profile is one
    map + one tiny rollup over it."""
    third = F.least(
        F.lit(2).cast("long"),
        F.expr(f"(3 * (start - 1)) div (n_tokens - {w - 1})"),
    )
    return (
        marked.select(
            "doc_id", third.cast("long").alias("third")
        )
        .groupBy("third")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_starts"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
        )
    )


def dup_position_oracle_sql(
    *, w: int = 8, token_re: str = "[^a-z0-9]+"
) -> str:
    """DuckDB twin of dup_position_profile over the same dup-start
    derivation as span_coverage_oracle_sql."""
    return f"""
WITH m AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(COALESCE(text, '')),
                       '{token_re}'), x -> x != '') AS ws
    FROM documents
),
d AS (
    SELECT doc_id, len(ws) AS n_tokens, ws FROM m WHERE len(ws) >= {w}
),
sh0 AS (
    SELECT doc_id, n_tokens, ws,
           unnest(generate_series(1, len(ws) - {w - 1})) AS s
    FROM d
),
sh AS (
    SELECT doc_id, n_tokens, s,
           md5(list_aggregate(ws[s:s + {w - 1}], 'string_agg', ' ')) AS h
    FROM sh0
),
dup AS (SELECT h FROM sh GROUP BY h HAVING COUNT(*) >= 2),
ds AS (SELECT sh.doc_id, sh.n_tokens, sh.s FROM sh JOIN dup USING (h))
SELECT least(2, (3 * (s - 1)) // (n_tokens - {w - 1})) AS third,
       CAST(COUNT(*) AS BIGINT) AS n_starts,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM ds GROUP BY 1 ORDER BY 1
"""

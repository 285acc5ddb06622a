"""Exact n-gram Jaccard near-duplicate pairs with prefix filtering.

LLM-data-pipeline extension (BASELINE.json north star). Unlike MinHash-LSH
(probabilistic recall), this finds EVERY pair with Jaccard ≥ t over word
n-gram sets — made tractable at scale by PPJoin-style prefix filtering,
which is exactness-preserving:

  1. n-gram: distinct word n-grams per doc (shared shingler with minhash);
  2. global token order: ascending (document frequency, token) — rarest
     first, so prefix postings are the smallest possible;
  3. prefix: for threshold t a doc with |A| grams keeps its first
     |A| - ceil(t·|A|) + 1 grams. For any pair with Jaccard ≥ t the
     globally-smallest common gram provably sits in BOTH prefixes
     (|A∩B| ≥ ceil(t·|A|) ⇒ its first common gram is within the prefix),
     so joining prefix postings loses no qualifying pair;
  4. verify: exact Jaccard via array_intersect/array_union on candidates.

Shuffle profile at 100 TB: the only fat shuffle is the prefix-postings
self-join, whose key cardinality is bounded by rare tokens (common tokens
land outside prefixes) — the property that makes PPJoin practical where the
naive postings join explodes on stopword-grams.

The DuckDB oracle replays the NAIVE all-pairs postings join (no prefix
filter) — equal output is exactly the exactness-preservation claim under
test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from msgvault_spark.dedup.minhash import word_shingles


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    threshold: float = 0.3,
    round_to: int = 6,
    prefix_filter: bool = True,
    bucket_cap: int | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for every pair with n-gram Jaccard ≥ threshold.
    id_a < id_b, deterministic order.

    ``bucket_cap`` applies the hot-bucket policy (dedup/hotbuckets.py)
    to the gram posting lists: a gram held by more than ``bucket_cap``
    docs (boilerplate) emits O(B) representative star edges instead of
    O(B²) pairs — still exact-Jaccard verified, so no false positives."""
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), n).alias("grams"),
    ).withColumn("n_grams", F.size("grams"))

    postings = docs.select(
        "doc_id", "n_grams", F.explode("grams").alias("gram")
    )

    if prefix_filter:
        # df_freq via a window over the one postings pass (the tfidf df
        # rewrite, r12): postings holds exactly one row per (doc, gram) —
        # grams are array_distinct per doc — so count(*) over (partition
        # by gram) IS the posting-list length the old groupBy+join
        # computed. One corpus tokenize pass instead of two, and no
        # vocabulary-sized build side (a 100 TB corpus's vocabulary does
        # not broadcast; postings shuffle by gram instead, which scales).
        w_freq = Window.partitionBy("gram")
        w = Window.partitionBy("doc_id").orderBy("df_freq", "gram")
        prefix_len = (
            F.col("n_grams") - F.ceil(F.lit(threshold) * F.col("n_grams")) + 1
        )
        postings = (
            postings.withColumn("df_freq", F.count(F.lit(1)).over(w_freq))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= prefix_len)
            .select("doc_id", "gram")
        )
    else:
        postings = postings.select("doc_id", "gram")

    from msgvault_spark.dedup.hotbuckets import capped_pair_propose

    cands = capped_pair_propose(
        postings.select(F.col("gram").alias("bucket"), "doc_id"), bucket_cap
    ).distinct()

    a = docs.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("g_a"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("g_b"))
    inter = F.size(F.array_intersect(F.col("g_a"), F.col("g_b")))
    union = F.size(F.array_union(F.col("g_a"), F.col("g_b")))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard", F.round(inter.cast("double") / union.cast("double"), round_to)
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        .sortWithinPartitions("id_a", "id_b")
    )


def ngram_jaccard_oracle_sql(
    source_select: str,
    *,
    n: int = 2,
    threshold: float = 0.3,
    round_to: int = 6,
) -> str:
    """DuckDB replica via the naive postings join (see module docstring);
    ``source_select`` yields (doc_id, text)."""
    return f"""
WITH docs AS ({source_select}),
words AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       w -> w != '') AS w
    FROM docs
),
grammed AS (
    SELECT doc_id,
           CASE WHEN len(w) >= {n}
                THEN list_distinct(list_transform(
                     generate_series(1, len(w) - {n - 1}),
                     i -> list_aggregate(w[i:i+{n - 1}], 'string_agg', ' ')))
                ELSE [list_aggregate(w, 'string_agg', ' ')]
           END AS grams
    FROM words
),
postings AS (
    SELECT doc_id, unnest(grams) AS gram FROM grammed
),
cands AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM postings a JOIN postings b USING (gram)
    WHERE a.doc_id < b.doc_id
),
verified AS (
    SELECT c.id_a, c.id_b,
           round(CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE) /
                 len(list_distinct(list_concat(ga.grams, gb.grams))),
                 {round_to}) AS jaccard
    FROM cands c
    JOIN grammed ga ON ga.doc_id = c.id_a
    JOIN grammed gb ON gb.doc_id = c.id_b
)
SELECT id_a, id_b, jaccard FROM verified
WHERE jaccard >= {threshold}
ORDER BY id_a, id_b
"""

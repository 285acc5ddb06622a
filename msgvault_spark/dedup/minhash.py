"""MinHash + LSH near-duplicate detection, fully JVM-side (no UDFs).

LLM-data-pipeline extension (BASELINE.json north star). Design for 100 TB:
  1. shingle: k-word shingles per doc (split + slice — one narrow map);
  2. signature: n minhash values; hash_i(s) = md5(i ':' s) compared
     LEXICOGRAPHICALLY — fixed-width hex means string-min ≡ numeric-min, so
     the whole signature is array_min over a transform, no custom hasher and
     bit-identical in any engine (the trick that makes the DuckDB oracle
     exact);
  3. band: signature split into b bands of r values; band key = md5 of the
     concatenated band → groupBy bucket;
  4. candidates: pairs sharing ≥1 bucket (self-join per band — shuffle is
     bounded by bucket sizes, the classic LSH property);
  5. verify: exact shingle-set Jaccard on candidates only.

Probability a pair with Jaccard j becomes a candidate: 1-(1-j^r)^b.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F



def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (lowercased, non-alphanumeric splits).

    The word array is LET-BOUND through a single-element transform so the
    per-position lambda references a bound variable instead of capturing
    the split expression: interpreted higher-order lambdas re-evaluate
    captured subtrees once per element, so the naive
    ``F.slice(words, i, k)`` form re-ran the full regex split at every
    shingle position — O(words²) per document (measured round 10:
    decontaminate_docs full-compute 51s → 2.3s at sf1 from this binding
    alone)."""
    words = F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"), lambda w: w != ""
    )

    def _shingle(ws: Column) -> Column:
        return F.array_distinct(
            F.when(
                F.size(ws) >= k,
                F.transform(
                    F.sequence(F.lit(1), F.size(ws) - (k - 1)),
                    lambda i: F.concat_ws(" ", F.slice(ws, i, k)),
                ),
            ).otherwise(F.array(F.concat_ws(" ", ws)))
        )

    return F.element_at(F.transform(F.array(words), _shingle), 1)


# alias used by docs/tests
shingles = word_shingles


def _seeded_min_hash(shingle_col: Column, seed: int) -> Column:
    # factory keeps the transform lambda single-argument: a second (even
    # defaulted) parameter would make PySpark pass the array index into it
    prefix = f"{seed}:"
    return F.array_min(
        F.transform(shingle_col, lambda s: F.md5(F.concat(F.lit(prefix), s)))
    )


def minhash_signature(shingle_col: Column, n_hashes: int = 12) -> Column:
    """Array of n lexicographic-min md5 hex digests (see module docstring)."""
    return F.array(
        *[_seeded_min_hash(shingle_col, i) for i in range(n_hashes)]
    )


def band_keys(sig_col: Column, bands: int, rows_per_band: int) -> Column:
    """Array of band bucket keys: band index + md5 of its slice."""
    return F.array(
        *[
            F.concat(
                F.lit(f"{b}:"),
                F.md5(
                    F.concat_ws(
                        "|", F.slice(sig_col, b * rows_per_band + 1, rows_per_band)
                    )
                ),
            )
            for b in range(bands)
        ]
    )


def build_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k_shingle: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """The LSH index: (doc_id, sh, bucket) band postings. This is the
    ETL-time artifact (persist / bucket by `bucket` in a real lake) — the
    shingle + n×md5 signature pass runs once per corpus version, not per
    query, exactly like the reference maintains its FTS index ahead of
    search time."""
    rows_per_band = n_hashes // bands
    prepared = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), k_shingle).alias("sh"),
    ).withColumn("sig", minhash_signature(F.col("sh"), n_hashes))
    return prepared.select(
        "doc_id",
        "sh",
        F.explode(band_keys(F.col("sig"), bands, rows_per_band)).alias("bucket"),
    )


def _verify_jaccard(
    pairs: DataFrame,
    sh_map: DataFrame,
    *,
    jaccard_threshold: float,
    round_to: int,
) -> DataFrame:
    """Decorate distinct (id_a, id_b) pairs with each side's shingle set
    and keep exact Jaccard >= threshold. The decorate-AFTER-distinct
    shape: shingle arrays never ride the bucket self-join shuffle (the
    r6 verdict's heavy-payload finding; same pattern as
    catalog_dedup.cross_source_dup_report)."""
    cands = pairs.join(
        sh_map.select(
            F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")
        ),
        "id_a",
    ).join(
        sh_map.select(
            F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")
        ),
        "id_b",
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    jac = inter.cast("double") / union.cast("double")
    return (
        cands.withColumn("jaccard", F.round(jac, round_to))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
        .sortWithinPartitions("id_a", "id_b")
    )


def pairs_from_index(
    buckets: DataFrame,
    *,
    jaccard_threshold: float = 0.5,
    round_to: int = 6,
    bucket_cap: int | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard): LSH buckets propose, exact shingle-set Jaccard
    disposes. id_a < id_b, deterministic.

    Scale shape: the bucket self-join ships (bucket, doc_id) ONLY — the
    shingle arrays are joined onto the already-distinct pair list
    afterwards, so a B-member bucket shuffles O(B) ids, not O(B²) shingle
    arrays. ``bucket_cap`` bounds the remaining O(B²) id fan-out: buckets
    over the cap (hot boilerplate fingerprints — the 100 TB skew) emit
    O(B) representative star edges instead, still exact-verified; see
    dedup/hotbuckets.py for the policy and the drop accounting."""
    from msgvault_spark.dedup.hotbuckets import capped_pair_propose

    pairs = capped_pair_propose(
        buckets.select("bucket", "doc_id"), bucket_cap
    )
    # sh is functionally dependent on doc_id, so one row per doc suffices
    sh_map = buckets.select("doc_id", "sh").dropDuplicates(["doc_id"])
    return _verify_jaccard(
        pairs.distinct(),
        sh_map,
        jaccard_threshold=jaccard_threshold,
        round_to=round_to,
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k_shingle: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """One-shot convenience: build the index inline, then propose/verify."""
    buckets = build_minhash_index(
        df, id_col, text_col, k_shingle=k_shingle, n_hashes=n_hashes, bands=bands
    )
    return pairs_from_index(
        buckets, jaccard_threshold=jaccard_threshold, round_to=round_to
    )


def minhash_index_ctes(
    source_select: str,
    *,
    k_shingle: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
) -> str:
    """The docs→words→shingled→sigs→buckets CTE chain shared by the pair
    oracle and the hot-bucket stats oracle (no leading WITH, no trailing
    comma)."""
    rows_per_band = n_hashes // bands
    sig_items = ", ".join(
        f"list_min(list_transform(sh, s -> md5('{i}:' || s)))"
        for i in range(n_hashes)
    )
    band_items = ", ".join(
        f"'{b}:' || md5(list_aggregate(sig[{b * rows_per_band + 1}:"
        f"{(b + 1) * rows_per_band}], 'string_agg', '|'))"
        for b in range(bands)
    )
    return f"""docs AS ({source_select}),
words AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       w -> w != '') AS w
    FROM docs
),
shingled AS (
    SELECT doc_id,
           CASE WHEN len(w) >= {k_shingle}
                THEN list_distinct(list_transform(
                     generate_series(1, len(w) - {k_shingle - 1}),
                     i -> list_aggregate(w[i:i+{k_shingle - 1}],
                                         'string_agg', ' ')))
                ELSE [list_aggregate(w, 'string_agg', ' ')]
           END AS sh
    FROM words
),
sigs AS (
    SELECT doc_id, sh, [{sig_items}] AS sig FROM shingled
),
buckets AS (
    SELECT doc_id, sh, unnest([{band_items}]) AS bucket FROM sigs
)"""


def minhash_oracle_sql(
    source_select: str,
    *,
    k_shingle: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    round_to: int = 6,
    pair_where: str = "1=1",
    bucket_cap: int | None = None,
) -> str:
    """DuckDB replica of lsh_candidate_pairs over ``source_select``
    (a subquery yielding doc_id, text). ``bucket_cap`` replays the
    hot-bucket policy (hotbuckets.py): over-cap buckets contribute
    representative star edges instead of all pairs."""
    return f"""
WITH {minhash_index_ctes(source_select, k_shingle=k_shingle, n_hashes=n_hashes, bands=bands)},
{_pair_ctes(pair_where, bucket_cap)}
SELECT id_a, id_b,
       round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE) /
             len(list_distinct(list_concat(sh_a, sh_b))), {round_to}) AS jaccard
FROM cands
WHERE round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE) /
            len(list_distinct(list_concat(sh_a, sh_b))), {round_to})
      >= {jaccard_threshold}
ORDER BY id_a, id_b
"""


def _pair_ctes(pair_where: str, bucket_cap: int | None) -> str:
    """The candidate CTEs of minhash_oracle_sql: the classic all-pairs
    propose when uncapped, or the hotbuckets.py split (under-cap pairing
    + over-cap representative stars) when capped."""
    # pair_where predicates are written against the uncapped join's
    # a./b. aliases; no caller combines them with a cap
    assert bucket_cap is None or pair_where == "1=1"
    if bucket_cap is None:
        return f"""cands AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sh_a, b.sh AS sh_b
    FROM buckets a JOIN buckets b USING (bucket)
    WHERE a.doc_id < b.doc_id AND ({pair_where})
)"""
    return f"""sizes AS (
    SELECT bucket, COUNT(*) AS bsz FROM buckets GROUP BY bucket
),
under AS (
    SELECT b.bucket, b.doc_id FROM buckets b JOIN sizes USING (bucket)
    WHERE bsz <= {bucket_cap}
),
over_cap AS (
    SELECT b.bucket, b.doc_id FROM buckets b JOIN sizes USING (bucket)
    WHERE bsz > {bucket_cap}
),
reps AS (SELECT bucket, MIN(doc_id) AS id_a FROM over_cap GROUP BY bucket),
pair_ids AS (
    SELECT DISTINCT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM under a JOIN under b USING (bucket)
        WHERE a.doc_id < b.doc_id
        UNION ALL
        SELECT r.id_a, o.doc_id AS id_b
        FROM over_cap o JOIN reps r USING (bucket)
        WHERE o.doc_id != r.id_a
    )
),
cands AS (
    SELECT p.id_a, p.id_b, sa.sh AS sh_a, sb.sh AS sh_b
    FROM pair_ids p
    JOIN sigs sa ON sa.doc_id = p.id_a
    JOIN sigs sb ON sb.doc_id = p.id_b
    WHERE ({pair_where})
)"""


def incremental_pairs(
    buckets: DataFrame,
    is_new: Column,
    *,
    jaccard_threshold: float = 0.5,
    round_to: int = 6,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Incremental near-dup: candidates where AT LEAST ONE side is in the
    new batch — the production shape (dedupe today's crawl against the
    lake plus within itself) that never re-pairs old×old. The band index
    is the persisted artifact; the join streams the SMALL batch side
    against it, so cost is O(batch × bucket overlap), not O(corpus²) —
    re-running full pairs_from_index per ingest would redo the entire
    old×old work each day.

    ``is_new`` is a predicate over the index's doc_id column. Output
    matches pairs_from_index restricted to pairs touching the batch:
    (id_a < id_b, exact Jaccard ≥ threshold). Same slim shape as
    pairs_from_index: only (bucket, id) rides the probe join; shingles
    decorate the distinct pair list. ``bucket_cap`` bounds a hot bucket's
    per-ingest fan-out the same way (hotbuckets.py): each NEW member of
    an over-cap bucket pairs only with the bucket's min-id member
    instead of with every resident — a daily boilerplate crawl then
    costs O(batch), not O(batch × bucket)."""
    posts = buckets.select("bucket", "doc_id")
    if bucket_cap is not None:
        from msgvault_spark.dedup.hotbuckets import split_by_bucket_cap

        under, over = split_by_bucket_cap(posts, bucket_cap)
    else:
        under, over = posts, None
    new_b = under.filter(is_new).select(
        F.col("bucket"), F.col("doc_id").alias("id_n")
    )
    pairs = (
        under.join(new_b, "bucket")
        .filter(F.col("doc_id") != F.col("id_n"))
        .select(
            F.least(F.col("doc_id"), F.col("id_n")).alias("id_a"),
            F.greatest(F.col("doc_id"), F.col("id_n")).alias("id_b"),
        )
    )
    if over is not None:
        # representative = min OLD member when the bucket has one, else
        # the min member overall: a NEW doc whose id undercuts every
        # resident (backfill, recycled ids) must still get an edge — with
        # a plain min(doc_id) rep it would BE the rep, be filtered by the
        # self-edge guard, and silently drop out of dedup
        reps = over.groupBy("bucket").agg(
            F.min(F.when(~is_new, F.col("doc_id"))).alias("id_old"),
            F.min("doc_id").alias("id_any"),
        )
        star = (
            over.filter(is_new)
            .join(reps, "bucket")
            .withColumn("id_r", F.coalesce(F.col("id_old"), F.col("id_any")))
            .filter(F.col("doc_id") != F.col("id_r"))
            .select(
                F.least(F.col("doc_id"), F.col("id_r")).alias("id_a"),
                F.greatest(F.col("doc_id"), F.col("id_r")).alias("id_b"),
            )
        )
        pairs = pairs.unionByName(star)
    pairs = pairs.distinct()
    sh_map = buckets.select("doc_id", "sh").dropDuplicates(["doc_id"])
    return _verify_jaccard(
        pairs,
        sh_map,
        jaccard_threshold=jaccard_threshold,
        round_to=round_to,
    )

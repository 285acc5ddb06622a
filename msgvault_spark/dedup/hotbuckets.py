"""Hot-bucket containment for LSH propose stages (MinHash bands, SimHash
pigeonhole bands, random-hyperplane buckets).

The hazard (SCALING.md "hot boilerplate fingerprints are the skew"): on a
real 100 TB corpus, boilerplate (license headers, templated pages) puts
millions of documents into ONE band bucket, and an uncapped bucket
self-join explodes O(B²) candidate pairs inside a single shuffle key — the
one skew AQE's skew-split cannot fix, because the blow-up is in the join
OUTPUT, not an oversized input partition.

Policy implemented here (per-bucket population cap with an explicit
overflow path):
  - buckets with population <= cap pair normally (the classic LSH propose);
  - buckets OVER the cap are near-certain duplicate clusters (that is what
    an over-full LSH bucket means), so instead of O(B²) pairing each
    member is paired with the bucket's representative (the lexicographic
    minimum member) — O(B) star edges that still pass the exact verifier
    downstream, and that connected components stitches back into the full
    cluster;
  - dropped-pair accounting is queryable via ``hot_bucket_stats`` so a
    pipeline can alert on how much pairing the cap declined.

The same instinct at single-node scale is the reference's bounded dedup
worker pool (`internal/dedup/dedup.go:531-540` caps concurrent content
hashing at 16); here the bound is per-key join fan-out instead of
goroutines.

All arithmetic is integer (pair counts are n*(n-1)/2 of longs), so the
DuckDB oracle replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_by_bucket_cap(
    posts: DataFrame, bucket_cap: int
) -> tuple[DataFrame, DataFrame]:
    """Split postings (bucket, ...) into (under, over) by bucket
    population. One groupBy on the bucket key (map-side combinable; the
    size table is bucket-cardinality, joined back on the same key so the
    exchange is reused)."""
    sizes = posts.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("__bsz")
    )
    tagged = posts.join(sizes, "bucket")
    under = tagged.filter(F.col("__bsz") <= bucket_cap).drop("__bsz")
    over = tagged.filter(F.col("__bsz") > bucket_cap).drop("__bsz")
    return under, over


def star_edges(over: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id_a, id_b) linear edges inside over-cap buckets: every member
    pairs with the bucket's minimum-id representative. O(B) per bucket,
    deterministic, id_a < id_b by construction."""
    reps = over.groupBy("bucket").agg(F.min(id_col).alias("id_a"))
    return (
        over.join(reps, "bucket")
        .filter(F.col(id_col) != F.col("id_a"))
        .select("id_a", F.col(id_col).alias("id_b"))
    )


def capped_pair_propose(
    posts: DataFrame, bucket_cap: int | None
) -> DataFrame:
    """The full propose stage shared by the five LSH-style pair
    generators (MinHash bands, n-gram postings, SimHash bands,
    hyperplane buckets, winnow fingerprints): slim (bucket, id)
    self-join on under-cap buckets, star edges on over-cap ones.

    Returns (id_a, id_b) WITH multiplicity (one row per co-occurring
    bucket) — pair-dedup callers add .distinct(); winnow keeps the
    multiplicity as its shared-fingerprint count. ``bucket_cap=None``
    degrades to the classic uncapped self-join."""
    if bucket_cap is not None:
        under, over = split_by_bucket_cap(posts, bucket_cap)
        star = star_edges(over)
    else:
        under, star = posts, None
    pairs = (
        under.select("bucket", F.col("doc_id").alias("id_a"))
        .join(
            under.select("bucket", F.col("doc_id").alias("id_b")), "bucket"
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs


def hot_bucket_stats(
    posts: DataFrame, bucket_cap: int
) -> DataFrame:
    """One-row accounting frame for the cap policy: how many buckets
    overflowed, the worst population, and exactly how many candidate
    pairs the cap declined (C(b,2) - (b-1) per over-cap bucket). All
    long arithmetic — engine-exact."""
    sizes = posts.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("bsz")
    )
    over = F.col("bsz") > bucket_cap
    # integer div keeps the count exact past 2^53 (doubles would not)
    full = F.expr("bsz * (bsz - 1) div 2")
    return sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.coalesce(
            F.sum(F.when(over, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("n_over_cap"),
        F.coalesce(F.max("bsz"), F.lit(0)).cast("long").alias("max_bucket"),
        F.coalesce(
            F.sum(F.when(~over, full).otherwise(0)), F.lit(0)
        ).cast("long").alias("proposed_pairs"),
        F.coalesce(
            F.sum(F.when(over, F.col("bsz") - 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("star_pairs"),
        F.coalesce(
            F.sum(F.when(over, full - (F.col("bsz") - 1)).otherwise(0)),
            F.lit(0),
        ).cast("long").alias("dropped_pairs"),
    )


def hot_bucket_stats_oracle_sql(posts_select: str, bucket_cap: int) -> str:
    """DuckDB twin of hot_bucket_stats over ``posts_select`` (a subquery
    yielding at least a ``bucket`` column)."""
    return f"""
WITH posts AS ({posts_select}),
sizes AS (
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS bsz FROM posts GROUP BY bucket
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(COALESCE(SUM(CASE WHEN bsz > {bucket_cap} THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_over_cap,
       CAST(COALESCE(MAX(bsz), 0) AS BIGINT) AS max_bucket,
       CAST(COALESCE(SUM(CASE WHEN bsz <= {bucket_cap}
                              THEN bsz * (bsz - 1) // 2 ELSE 0 END), 0)
            AS BIGINT) AS proposed_pairs,
       CAST(COALESCE(SUM(CASE WHEN bsz > {bucket_cap}
                              THEN bsz - 1 ELSE 0 END), 0)
            AS BIGINT) AS star_pairs,
       CAST(COALESCE(SUM(CASE WHEN bsz > {bucket_cap}
                              THEN bsz * (bsz - 1) // 2 - (bsz - 1)
                              ELSE 0 END), 0)
            AS BIGINT) AS dropped_pairs
FROM sizes
"""

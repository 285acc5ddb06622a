"""KMV (k-minimum-values) sketch: cross-source overlap WITHOUT a doc join.

`cross_source_dup_report` answers "how much does source A duplicate source
B" exactly, by riding the banded MinHash pair list — cost proportional to
candidate pairs. This operator answers the same question approximately
from per-source sketches of BOUNDED size: keep the k lexicographically
smallest md5 digests of each source's distinct shingles (the classic KMV
/ bottom-k construction — Bar-Yossef et al., and the theta-sketch family's
base case). Then for any pair of sources,

    merged  = k smallest of sketch(A) ∪ sketch(B)      (a KMV of A ∪ B)
    matched = |merged ∩ sketch(A) ∩ sketch(B)|          (members of both)
    Jaccard ≈ matched / |merged|

100 TB shape: the sketch build is a SALTED TWO-LEVEL bottom-k — one
shuffle keyed by (source, pmod(xxhash64(digest), SALT)) producing a ≤k
partial sketch per salt bucket (collect_set inside the bucket dedupes
exactly, because the salt is a pure function of the digest — each
distinct digest lands in exactly one bucket), then a second tiny shuffle
keyed by source merging SALT partial sketches into the final bottom-k.
No stage ever holds more than one salt-bucket's distinct digests
(≈ distinct/SALT) in a single task, and no per-source global sort
exists: a 10 TB source fans out over SALT tasks instead of one. All
pair math then happens on an S-row sketch table (S = source count) —
the S² comparison that would be unthinkable on documents is trivial on
sketches. No doc⋈doc join exists anywhere in the plan.

Deterministic across engines: md5 hex digests compare lexicographically
the same everywhere, ties cannot occur (digests are distinct per source
after the DISTINCT), so the sketch content — not just the estimate — is
bit-identical between Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from msgvault_spark.dedup.minhash import word_shingles
from msgvault_spark.operators.present import present_sorted


def kmv_sketches(
    docs: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
    k: int = 64,
    k_shingle: int = 3,
    salt: int = 32,
) -> DataFrame:
    """(source, sketch array<string>): the k smallest distinct shingle
    digests per source. Sources with fewer than k distinct shingles get a
    shorter sketch (k_eff handles that downstream).

    Salted two-level bottom-k (no per-source global sort): level 1 groups
    by (source, pmod(xxhash64(h), salt)) and keeps the ≤k smallest
    distinct digests of each bucket — collect_set dedupes exactly because
    the salt is a pure function of the digest, so the classic global
    DISTINCT shuffle is folded into this one exchange. Level 2 merges the
    ≤salt partial sketches per source (≤ salt·k strings) into the final
    bottom-k. The result is set-defined, hence bit-identical to the
    single-sort formulation regardless of salt."""
    hashed = docs.select(
        F.col(source_col).alias("source"),
        F.explode(word_shingles(F.col(text_col), k_shingle)).alias("s"),
    ).select("source", F.md5(F.col("s")).alias("h"))
    partials = (
        hashed.groupBy(
            "source", F.pmod(F.xxhash64("h"), F.lit(salt)).alias("salt")
        )
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("part"))
    )
    return partials.groupBy("source").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("part"))), 1, k
        ).alias("sketch")
    )


def kmv_overlap(sketches: DataFrame, *, k: int = 64) -> DataFrame:
    """All-pairs overlap estimates from the sketch table:
    (source_a, source_b, matched, k_eff, jaccard_est), source_a < source_b.
    The pair join is sketch×sketch (S rows a side) — broadcast nested loop
    by design; the corpus is never touched."""
    a = sketches.select(
        F.col("source").alias("source_a"), F.col("sketch").alias("sk_a")
    )
    b = sketches.select(
        F.col("source").alias("source_b"), F.col("sketch").alias("sk_b")
    )
    merged = F.slice(
        F.array_sort(F.array_union(F.col("sk_a"), F.col("sk_b"))), 1, k
    )
    matched = F.size(
        F.array_intersect(F.array_intersect(merged, F.col("sk_a")), F.col("sk_b"))
    )
    return (
        a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            matched.cast("long").alias("matched"),
            F.size(merged).cast("long").alias("k_eff"),
            F.round(
                matched.cast("double") / F.size(merged), 6
            ).alias("jaccard_est"),
        )
        .transform(present_sorted, "source_a", "source_b")
    )

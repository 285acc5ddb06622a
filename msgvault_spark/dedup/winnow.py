"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
SIGMOD'03 — the MOSS algorithm): substring-level overlap detection that
MinHash misses.

MinHash/SimHash measure whole-document set similarity; a document that
COPIES A PARAGRAPH into otherwise-new text scores low on both. Winnowing
guarantees detection of any shared run of ≥ w + k - 1 characters:

    1. hash every k-gram of the text (rolling window, here via substring);
    2. slide a w-wide window over the hash sequence; record each window's
       MINIMUM hash (rightmost on ties) with its position;
    3. the distinct selected (hash) set is the fingerprint — ~2/(w+1)
       density, positions discarded for set matching.

Matching = inverted index on fingerprint hashes (same join shape as the
MinHash band index): documents sharing ≥ t fingerprints are candidate
substring-overlap pairs. All JVM-side array ops, no explode until the
final postings join.

Expression-binding discipline: every intermediate (normalized text, the
gram-hash array) is SELECTed into a column before a higher-order lambda
references it. A lambda that closes over a compound EXPRESSION re-evaluates
it per array element — an embedded regexp_replace turns O(n) hashing into
O(n²) per document (measured 340s → 3s on the catalog corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _gram_hasher(k: int, portable: bool):
    def gram_hash(t: Column):
        def h(i):
            g = F.substr(t, i, F.lit(k))
            if portable:
                return F.conv(
                    F.substring(F.md5(F.encode(g, "utf-8")), 1, 8), 16, 10
                ).cast("long")
            return F.xxhash64(g)

        return h

    return gram_hash


def kgram_hashes(text: Column, k: int, *, portable: bool = False) -> Column:
    """Hash each k-char gram of whitespace-normalized lowercase ``text``.

    Default: xxhash64 (JVM-native, the production path). ``portable=True``
    switches to first-8-hex-of-md5 — slower, but reproducible in any SQL
    engine (DuckDB: ``CAST(concat('0x', substr(md5(g),1,8)) AS BIGINT)``),
    which is what lets the oracle replay the fingerprint exactly.

    ``text`` must be a plain column reference (see module note) — use
    ``winnow_candidate_pairs`` for the correctly-staged pipeline."""
    # let-bind the normalized text (single-element transform): interpreted
    # HOF lambdas re-evaluate captured subtrees per element, so an
    # expression argument would re-run the regexp at every gram position.
    # The staged pipeline below binds real columns anyway; this keeps the
    # convenience form safe for expression inputs too.
    def _hashes(t: Column) -> Column:
        n = F.length(t)
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)), _gram_hasher(k, portable)(t)
            ),
        ).otherwise(F.array().cast("array<bigint>"))

    normed = F.regexp_replace(F.lower(text), r"\s+", " ")
    return F.element_at(F.transform(F.array(normed), _hashes), 1)


def _select_windows(hs: Column, w: int) -> Column:
    # same let-binding rationale as kgram_hashes: bind the hash array once
    def _windows(h: Column) -> Column:
        n = F.size(h)
        return F.array_distinct(
            F.when(
                n >= w,
                F.transform(
                    F.sequence(F.lit(0), n - w),
                    lambda i: F.array_min(F.slice(h, i + 1, w)),
                ),
            ).otherwise(F.when(n > 0, F.array(F.array_min(h))).otherwise(h))
        )

    return F.element_at(F.transform(F.array(hs), _windows), 1)


def winnow_fingerprints(
    text: Column, *, k: int = 8, w: int = 4, portable: bool = False
) -> Column:
    """Distinct selected hashes per the winnowing rule (min of each w-window
    of k-gram hashes; ties collapse in the distinct set). Single-expression
    convenience for small frames/tests — the staged ``winnow_candidate_pairs``
    is the scale path."""
    return _select_windows(kgram_hashes(text, k, portable=portable), w)


def winnow_candidate_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    portable: bool = False,
    bucket_cap: int | None = None,
) -> DataFrame:
    """(id_a, id_b, shared) for pairs sharing ≥ ``min_shared`` fingerprints
    (id_a < id_b). Postings self-join on fingerprint hash — identical scale
    shape to MinHash LSH banding: the shuffle key is the fingerprint, hot
    boilerplate fingerprints are the skew to watch.

    ``bucket_cap`` contains that skew (dedup/hotbuckets.py): fingerprints
    held by more than ``bucket_cap`` docs contribute O(B) star edges to
    the fingerprint's min-id representative instead of O(B²) pairs, with
    ``shared`` still counted exactly per surviving edge (under-cap
    co-occurrences + over-cap co-occurrences with the representative sum
    through the same groupBy)."""
    # stage 1: bind normalized text as a column (NOT inline in the lambda)
    normed = docs.select(
        F.col(id_col).alias("id"),
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ").alias("__t"),
    )
    # stage 2: gram hashes over the bound column
    t, n = F.col("__t"), F.length("__t")
    hashed = normed.select(
        "id",
        F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)), _gram_hasher(k, portable)(t)
            ),
        )
        .otherwise(F.array().cast("array<bigint>"))
        .alias("__hs"),
    )
    # stage 3: winnow windows over the bound hash array
    fp = hashed.select(
        "id", F.explode(_select_windows(F.col("__hs"), w)).alias("h")
    )
    from msgvault_spark.dedup.hotbuckets import capped_pair_propose

    # multiplicity preserved: one edge per co-occurring fingerprint
    edges = capped_pair_propose(
        fp.select(F.col("h").alias("bucket"), F.col("id").alias("doc_id")),
        bucket_cap,
    )
    return (
        edges.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )

"""SimHash document fingerprinting, JVM-side, engine-portable.

32-bit SimHash over word tokens: each token hashes to 32 bits (first 8 hex
chars of md5); per bit position the weighted vote Σ(±1) decides the output
bit. Near-duplicates have small Hamming distance between fingerprints.

Bit extraction is expressed in integer arithmetic over hex digits
(strpos on '0123456789abcdef') so the exact same formula runs in Spark and
DuckDB — no platform hash functions involved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BITS = 32
_HEX = "0123456789abcdef"


def _bit_shift(j: int) -> int:
    """Shift of fingerprint bit j inside the 32-bit integer value of the
    8-hex-char token hash. The hex STRING formula reads digit 1 + j//4
    from the LEFT (the most significant nibble first) and bit j%4 from
    that nibble's LSB; on the integer I = int(th, 16) that nibble sits at
    4·(7 − j//4), so bit j is (I div 2^(4·(7−j//4)+j%4)) % 2 — the exact
    same bit, extracted with one long div/mod instead of a substring +
    base-16 conv + double floor-divide per bit per token (r12, guide
    §1.2: 32× per-row expression cost was the whole stage)."""
    return 4 * (7 - j // 4) + (j % 4)


def _token_bit(tok_hash: Column, j: int) -> Column:
    """Bit j of the 32-bit token hash (hex digit j//4, bit j%4) — kept
    for the hex-string form; the hot path uses _bit_shift over the
    integer value."""
    digit = F.substring(tok_hash, 1 + j // 4, 1)
    val = F.conv(digit, 16, 10).cast("int")
    return F.floor(val / (2 ** (j % 4))).cast("long") % 2


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, simhash) — one shuffle: explode tokens, 32 conditional sums,
    recombine bits. Scales linearly in corpus size."""
    tokens = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda w: w != "",
                )
            )
        ).alias("tok"),
    ).withColumn(
        # one hex→long conversion per token; per-bit extraction below is
        # pure long arithmetic (bit-identical to the per-digit hex form —
        # see _bit_shift)
        "ti",
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long"),
    )

    votes = [
        F.sum(
            F.shiftright(F.col("ti"), _bit_shift(j)) % 2 * 2 - 1
        ).alias(f"v{j}")
        for j in range(N_BITS)
    ]
    agg = tokens.groupBy("doc_id").agg(*votes)
    fingerprint = sum(
        (F.when(F.col(f"v{j}") > 0, 2**j).otherwise(0) for j in range(N_BITS)),
        F.lit(0),
    )
    return agg.select("doc_id", fingerprint.cast("long").alias("simhash"))


def hamming32(a: Column, b: Column) -> Column:
    """Hamming distance via popcount of xor (bit_count works on longs)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_oracle_sql(source_select: str) -> str:
    """The identical computation in DuckDB SQL."""
    vote_items = []
    for j in range(N_BITS):
        digit = f"substr(th, {1 + j // 4}, 1)"
        val = f"(strpos('{_HEX}', {digit}) - 1)"
        bit = f"(CAST(floor({val} / {2 ** (j % 4)}) AS BIGINT) % 2)"
        vote_items.append(f"SUM({bit} * 2 - 1) AS v{j}")
    votes_sql = ", ".join(vote_items)
    fp = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {2**j} ELSE 0 END)" for j in range(N_BITS)
    )
    return f"""
WITH docs AS ({source_select}),
tokens AS (
    SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                      w -> w != '')) AS tok
        FROM docs
    )
),
hashed AS (SELECT doc_id, substr(md5(tok), 1, 8) AS th FROM tokens),
votes AS (SELECT doc_id, {votes_sql} FROM hashed GROUP BY doc_id)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes
"""


def hamming_neighbors(
    fps: DataFrame,
    *,
    max_dist: int = 3,
    n_bands: int = 4,
    bucket_cap: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) — all fingerprint pairs within ``max_dist``
    bits, via Manku et al. 2007 pigeonhole banding: split the 32-bit
    fingerprint into ``n_bands`` byte bands; any pair differing in at
    most n_bands−1 bits (here ≤3) must agree EXACTLY on at least one
    band, so same-(band, value) buckets propose and an exact popcount
    disposes — all-pairs never materializes.

    Band extraction is non-negative integer div/mod (no shift-semantics
    divergence between engines); verification is bit_count(xor), exact
    in both.  ``fps`` = (doc_id, simhash) — pass the persisted
    fingerprint artifact.

    Scale shape: the band self-join ships (band-bucket, doc_id) only;
    fingerprints decorate the already-distinct pair list (two joins
    against the fps artifact).  ``bucket_cap`` bounds the O(B²) fan-out
    of a hot band bucket (identical boilerplate fingerprints): over-cap
    buckets emit O(B) representative star edges instead, still
    popcount-verified — see dedup/hotbuckets.py."""
    assert 32 % n_bands == 0
    # pigeonhole guarantee: max_dist differing bits can zero out at most
    # max_dist bands, so completeness requires max_dist < n_bands —
    # out-of-contract arguments would silently DROP pairs, not error
    assert max_dist < n_bands, (
        f"max_dist={max_dist} requires n_bands > max_dist; got "
        f"n_bands={n_bands}"
    )
    width = 2 ** (32 // n_bands)
    bandcol = F.array(
        *[
            F.concat(
                F.lit(f"{b}:"),
                F.expr(f"(simhash div {width ** b}) % {width}").cast(
                    "string"
                ),
            )
            for b in range(n_bands)
        ]
    )
    from msgvault_spark.dedup.hotbuckets import capped_pair_propose

    posts = fps.select(
        "doc_id", F.explode(bandcol).alias("bucket")
    )
    cands = (
        capped_pair_propose(posts.select("bucket", "doc_id"), bucket_cap)
        .distinct()
        .join(
            fps.select(
                F.col("doc_id").alias("id_a"), F.col("simhash").alias("fa")
            ),
            "id_a",
        )
        .join(
            fps.select(
                F.col("doc_id").alias("id_b"), F.col("simhash").alias("fb")
            ),
            "id_b",
        )
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).cast("long")
        )
        .filter(F.col("hamming") <= max_dist)
        .select("id_a", "id_b", "hamming")
        .sortWithinPartitions("id_a", "id_b")
    )


def hamming_neighbors_oracle_sql(
    source_select: str,
    *,
    max_dist: int = 3,
    n_bands: int = 4,
    order_by: bool = True,
) -> str:
    """DuckDB twin: same banding (integer div/mod), same popcount.

    ``order_by=False`` emits the unordered SELECT so callers embedding
    this as a subquery (e.g. the histogram rollup in catalog_dedup) get
    a clean composable body instead of post-hoc string surgery."""
    width = 2 ** (32 // n_bands)
    band_rows = ", ".join(
        f"({b}, {width**b})" for b in range(n_bands)
    )
    fp_sql = simhash_oracle_sql(source_select).strip()
    tail = "ORDER BY id_a, id_b" if order_by else ""
    return f"""
WITH fp AS ({fp_sql}),
bands AS (
    SELECT f.doc_id, f.simhash, band.b,
           (f.simhash // band.d) % {width} AS v
    FROM fp f CROSS JOIN (VALUES {band_rows}) AS band(b, d)
),
cands AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           a.simhash AS fa, b.simhash AS fb
    FROM bands a JOIN bands b
      ON a.b = b.b AND a.v = b.v AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
FROM cands WHERE bit_count(xor(fa, fb)) <= {max_dist}
{tail}
"""

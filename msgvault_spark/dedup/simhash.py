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


def _token_bit(tok_hash: Column, j: int) -> Column:
    """Bit j of the 32-bit token hash (hex digit j//4, bit j%4)."""
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
    ).withColumn("th", F.substring(F.md5(F.col("tok")), 1, 8))

    votes = [
        F.sum(_token_bit(F.col("th"), j) * 2 - 1).alias(f"v{j}")
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

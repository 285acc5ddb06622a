"""Bloom-filter semi-join reduction — cut the fact-side shuffle BEFORE an
equi-join by testing fact keys against a compact bitset of the (already
filtered) build side.

This is the runtime-row-level-filtering idea Spark's optimizer applies
automatically when `spark.sql.optimizer.runtime.bloomFilter.enabled` fires
(and what Join Induction/DPP do for partition columns) — implemented here
as an explicit, inspectable operator because (a) the automatic rule only
triggers under size heuristics you cannot rely on at the 100 TB margins,
and (b) the SQL surface of this build does not expose bloom_filter_agg.

Everything is relational and JVM-side — no driver collect:

  build:  dim keys → num_hashes positions (xxhash64(k, seed_j) mod m) →
          (word = pos div 64, bit = pos mod 64) → groupBy(word) BIT_OR —
          partial aggregation makes this one tiny shuffle of ≤ m/64 rows
          → densified to ONE row holding array<long> via map + sequence.
  probe:  1-row broadcast cross join (the W1 total-count pattern), then
          a map-side filter testing all num_hashes bits. False-positive
          rate (m=2^16, k=3, n=|dim|): (1-e^(-kn/m))^k — ~0.1% at n=2k.
  join:   the REAL equi-join runs after, so results are exact; the bloom
          only shrinks what reaches the exchange. With a broadcastable
          dim Spark would broadcast anyway — the payoff is when the dim
          is too big to broadcast but its KEY SET still fits a bitset:
          8 KiB of bloom stands in for a multi-GiB build side.

Oracle story: the operator's output equals the plain join (bloom is a
pure pre-filter), so the DuckDB oracle is the unadorned join SQL — the
bloom machinery is pinned separately by plan/selectivity tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_WORDS_DEFAULT = 1024  # 2^16 bits


def build_bloom(
    dim: DataFrame,
    key: str,
    *,
    n_words: int = N_WORDS_DEFAULT,
    num_hashes: int = 3,
) -> DataFrame:
    """1-row frame: __bloom array<long> of length n_words (64·n_words
    bits). Dense — missing words filled with 0 so probe lookups are
    branch-free element_at."""
    m = n_words * 64
    pos = [
        F.pmod(F.xxhash64(F.col(key), F.lit(j)), F.lit(m))
        for j in range(num_hashes)
    ]
    bits = dim.select(F.explode(F.array(*pos)).alias("pos")).select(
        (F.col("pos") / 64).cast("int").alias("word"),
        # F.shiftleft only takes a literal shift; the SQL form takes a column
        F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias("b"),
    )
    words = bits.groupBy("word").agg(F.expr("bit_or(b)").alias("bits"))
    return words.agg(
        F.map_from_arrays(
            F.collect_list("word"), F.collect_list("bits")
        ).alias("__wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda w: F.coalesce(
                F.element_at(F.col("__wm"), w.cast("int")), F.lit(0).cast("long")
            ),
        ).alias("__bloom")
    )


def _might_contain(key: str, n_words: int, num_hashes: int) -> Column:
    m = n_words * 64
    cond = F.lit(True)
    for j in range(num_hashes):
        pos = f"pmod(xxhash64(`{key}`, {j}), {m})"
        test = (
            f"(element_at(__bloom, cast(({pos}) div 64 as int) + 1)"
            f" & shiftleft(cast(1 as bigint), cast(({pos}) % 64 as int))) != 0"
        )
        cond = cond & F.expr(test)
    return cond


def bloom_prefilter(
    fact: DataFrame,
    bloom: DataFrame,
    key: str,
    *,
    n_words: int = N_WORDS_DEFAULT,
    num_hashes: int = 3,
) -> DataFrame:
    """Fact rows whose key might be in the build side — map-side filter
    after a 1-row broadcast; definite non-members (the bulk, when the dim
    is selective) never reach the join exchange."""
    return (
        fact.join(F.broadcast(bloom))
        .filter(_might_contain(key, n_words, num_hashes))
        .drop("__bloom")
    )


def bloom_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    n_words: int = N_WORDS_DEFAULT,
    num_hashes: int = 3,
) -> DataFrame:
    """Exact inner equi-join with bloom semi-join reduction on the fact
    side. Result == fact.join(dim, key) — false positives are removed by
    the real join; the bloom only cuts shuffle volume."""
    bloom = build_bloom(dim, key, n_words=n_words, num_hashes=num_hashes)
    return bloom_prefilter(
        fact, bloom, key, n_words=n_words, num_hashes=num_hashes
    ).join(dim, key)

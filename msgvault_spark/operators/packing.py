"""Sequence packing: assign documents to fixed-token-budget training bins.

Every LLM training pipeline packs variable-length documents into
fixed-size sequences (batch shape is rigid; padding is wasted compute).
True bin packing is NP-hard and inherently sequential; the pipeline
standard is CONTIGUOUS OFFSET PACKING: order documents deterministically,
accumulate token counts, and cut a new bin every time the running total
crosses the budget. Deterministic, one pass, and — the property that
matters here — expressible as a window cumsum, so it stays relational.

Scale shape: the cumsum window partitions by a SHARD (id mod n_shards),
never globally — packing is per-shard exactly as real pipelines pack per
data shard, so no single-partition window exists at any size; one
exchange on shard total.

Bin-size contract (documented, test-pinned): a bin's total may overrun
the budget by less than its last document (the doc that crossed the
boundary) — i.e. ``bin_tokens < budget + max_doc_tokens``. Oversized
single documents (> budget) get a bin of their own; truncate upstream if
that is not acceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    *,
    budget: int,
    n_shards: int = 8,
) -> DataFrame:
    """(doc_id, shard, bin_id, n_tokens): bin assignment per document.
    bin_id = floor(pre_cumsum / budget) within the shard's id order."""
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
            F.col(tokens_col).cast("long").alias("n_tokens"),
        )
        .withColumn(
            "bin_id",
            (
                F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / budget
            ).cast("long"),
        )
        .select("doc_id", "shard", "bin_id", "n_tokens")
    )


def bin_stats(packed: DataFrame) -> DataFrame:
    """Per-bin rollup: (shard, bin_id, n_docs, bin_tokens)."""
    return (
        packed.groupBy("shard", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("bin_tokens"),
        )
        .sortWithinPartitions("shard", "bin_id")
    )


def packing_oracle_sql(
    source_select: str, *, budget: int, n_shards: int = 8
) -> str:
    """DuckDB replica of pack_sequences + bin_stats; ``source_select``
    yields (doc_id, n_tokens)."""
    return f"""
WITH src AS ({source_select}),
packed AS (
    SELECT doc_id,
           CAST(doc_id % {n_shards} AS INTEGER) AS shard,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
                    PARTITION BY doc_id % {n_shards} ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) // {budget} AS BIGINT) AS bin_id
    FROM src
)
SELECT shard, bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
FROM packed
GROUP BY 1, 2
ORDER BY shard, bin_id
"""

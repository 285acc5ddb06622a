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


def length_bucket_report(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    *,
    bucket_width: int = 8,
    max_bucket: int = 12,
    batch_size: int = 16,
) -> DataFrame:
    """Padded-batch economics per length bucket — the complement of
    pack_sequences: when the serving/training stack pads each batch to
    its longest member instead of packing, grouping similar lengths is
    what controls wasted compute. Reports, per bucket of
    ``bucket_width`` tokens (capped at ``max_bucket``):

      (bucket, n_docs, n_batches, real_tokens, padded_tokens, waste_ppm)

    where docs are assigned to ``ceil(n_docs / batch_size)`` batches by a
    portable hash of their id (md5-hex6 mod n_batches — the repo's
    engine-portable hash, dedup/minhash.py), each batch pads to its max
    length, and waste_ppm = (padded − real)·1e6 / padded in integer math.

    Scale shape: bucket assignment is a map; the per-bucket doc counts
    are a ≤(max_bucket+1)-row broadcast; batch membership is hash-derived
    (NO per-bucket sort or row_number — the naive length-sorted batching
    is a global sort that funnels each bucket through one reducer); the
    (bucket, batch) rollup and the bucket rollup both combine map-side.
    Hash batching trades intra-batch tightness for a shuffle-free
    assignment — exactly the report's point: the numbers say whether the
    bucketing is tight enough before anyone pays for a sort."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    ).withColumn(
        "bucket",
        F.least(
            F.expr(f"n_tokens div {bucket_width}"),
            F.lit(max_bucket).cast("long"),
        ),
    )
    counts = base.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    counts = counts.withColumn(
        "n_batches",
        F.expr(f"(n_docs + {batch_size - 1}) div {batch_size}"),
    )
    from msgvault_spark.functions.portable import md5_hex6_long

    assigned = base.join(F.broadcast(counts), "bucket").withColumn(
        "batch",
        md5_hex6_long(F.col("doc_id").cast("string")) % F.col("n_batches"),
    )
    per_batch = assigned.groupBy("bucket", "batch").agg(
        F.count(F.lit(1)).cast("long").alias("bd"),
        F.max("n_tokens").alias("bmax"),
        F.sum("n_tokens").cast("long").alias("bsum"),
    )
    return (
        per_batch.groupBy("bucket")
        .agg(
            F.sum("bd").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_batches"),
            F.sum("bsum").cast("long").alias("real_tokens"),
            F.sum(F.col("bd") * F.col("bmax")).cast("long").alias(
                "padded_tokens"
            ),
        )
        .withColumn(
            "waste_ppm",
            F.expr(
                "CAST((padded_tokens - real_tokens) * 1000000 AS BIGINT) "
                "div padded_tokens"
            ),
        )
        # no internal sort: the ≤(max_bucket+1)-row output's presentation
        # order is the caller's (catalog entries apply present_sorted,
        # which repartitions and re-sorts anyway)
    )


def length_bucket_oracle_sql(
    source_select: str,
    *,
    bucket_width: int = 8,
    max_bucket: int = 12,
    batch_size: int = 16,
) -> str:
    """DuckDB replica of length_bucket_report; ``source_select`` yields
    (doc_id, n_tokens). Integer division and md5-hex6 hashing match the
    Spark expressions digit-for-digit."""
    from msgvault_spark.functions.portable import MD5_HEX6_SQL

    h = MD5_HEX6_SQL.format(x="CAST(b.doc_id AS VARCHAR)")
    return f"""
WITH src AS ({source_select}),
base AS (
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           LEAST(CAST(n_tokens AS BIGINT) // {bucket_width},
                 {max_bucket}) AS bucket
    FROM src
),
counts AS (
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST((COUNT(*) + {batch_size - 1}) // {batch_size} AS BIGINT)
               AS n_batches
    FROM base GROUP BY 1
),
assigned AS (
    SELECT b.bucket, b.n_tokens,
           {h} % c.n_batches AS batch
    FROM base b JOIN counts c ON c.bucket = b.bucket
),
per_batch AS (
    SELECT bucket, batch,
           CAST(COUNT(*) AS BIGINT) AS bd,
           MAX(n_tokens) AS bmax,
           CAST(SUM(n_tokens) AS BIGINT) AS bsum
    FROM assigned GROUP BY 1, 2
)
SELECT bucket,
       CAST(SUM(bd) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_batches,
       CAST(SUM(bsum) AS BIGINT) AS real_tokens,
       CAST(SUM(bd * bmax) AS BIGINT) AS padded_tokens,
       CAST((SUM(bd * bmax) - SUM(bsum)) * 1000000 AS BIGINT)
           // CAST(SUM(bd * bmax) AS BIGINT) AS waste_ppm
FROM per_batch
GROUP BY 1
ORDER BY bucket
"""


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

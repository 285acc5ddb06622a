"""Deletion vectors: merge-on-read dedup without rewriting the base data.

The reference's dedup merge (internal/dedup/dedup.go:834-916) soft-deletes
losers by UPDATE-ing a delete_batch_id column — cheap in SQLite, but at
100 TB an update-in-place is a full rewrite of every affected file. The
lakehouse answer (Delta/Iceberg deletion vectors) is merge-on-read:

    build:  persist only the loser ids (plus batch id for undo) as a tiny
            sorted parquet table — bytes per deleted row, base untouched;
    read:   anti-join the base against the vector. The vector is orders of
            magnitude smaller than the base, so Catalyst broadcasts it and
            the "delete" costs one broadcast-hash-anti probe per row —
            no shuffle of the base table;
    undo:   drop the batch's rows from the vector (reference
            store/dedup.go:359-376 undo-by-batch).

Compaction (physically rewriting base files minus the vector) is the same
``apply_deletion_vector`` plan written back out — run it when the vector
grows past a few % of the base.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_deletion_vector(
    marked: DataFrame,
    *,
    id_col: str = "id",
    batch_id: str = "dedup-batch-1",
) -> DataFrame:
    """From a survivor-marked frame (dedup.exact.select_survivors output),
    the deletion vector: one row per loser (id, delete_batch_id)."""
    return (
        marked.filter(~F.col("is_survivor"))
        .select(
            F.col(id_col).alias("id"),
            F.lit(batch_id).alias("delete_batch_id"),
        )
    )


def apply_deletion_vector(
    df: DataFrame, dv: DataFrame, *, id_col: str = "id"
) -> DataFrame:
    """Merge-on-read: rows of ``df`` not present in the vector. The vector
    side is explicitly broadcast — a deletion vector that fits in executor
    memory (the designed-for case) never shuffles the base."""
    probe = dv.select(F.col("id").alias("__dv_id")).distinct()
    return df.join(
        F.broadcast(probe), F.col(id_col) == F.col("__dv_id"), "left_anti"
    )


def undo_batch(dv: DataFrame, batch_id: str) -> DataFrame:
    """Reference undo-by-batch: the vector without that batch's rows."""
    return dv.filter(F.col("delete_batch_id") != batch_id)


def write_deletion_vector(dv: DataFrame, base_dir: str) -> str:
    """Persist into the lake. Coalesced to 1 shard and sorted by id: the
    vector is tiny, and a single sorted shard makes the broadcast build and
    any range-pruned scan cheap."""
    path = os.path.join(base_dir, "deletion_vectors")
    dv.coalesce(1).sortWithinPartitions("id").write.mode("append").parquet(path)
    return path


def load_deletion_vector(spark: SparkSession, base_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base_dir, "deletion_vectors"))

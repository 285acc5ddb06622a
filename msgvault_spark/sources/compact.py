"""Small-file compaction for the parquet lake.

Incremental appends (stream_to_lake, append-shard junction writes) accrete
small files; at 100 TB the file COUNT becomes the scan bottleneck (listing,
footers, task scheduling — one task per tiny file). Compaction rewrites a
partition's files into ~target-sized ones; pair with the deletion-vector
apply to fold soft-deletes into the rewrite (dedup/deletion_vectors.py
compaction note).

Rewrite-then-swap: the new layout lands in a staging dir, the old dir is
replaced only after a successful write — readers never see a half-compacted
partition (object-store rename caveats apply; table formats do this with
metadata, this is the plain-parquet equivalent)."""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a local lake directory."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_dir(
    spark: SparkSession,
    path: str,
    *,
    target_bytes: int = 128 * 1024 * 1024,
    compression: str = "zstd",
) -> int:
    """Rewrite ``path``'s parquet into ceil(total/target) files. Returns the
    new file count. Row-level contents are preserved exactly (no dedup, no
    reorder guarantees)."""
    n, total = dir_stats(path)
    n_out = max(1, math.ceil(total / target_bytes))
    if n <= n_out:
        return n
    staging = path.rstrip("/") + ".__compact__"
    (
        spark.read.parquet(path)
        .repartition(n_out)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(staging)
    )
    old = path.rstrip("/") + ".__old__"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    return dir_stats(path)[0]

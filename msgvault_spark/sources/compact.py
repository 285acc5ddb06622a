"""Small-file compaction for the parquet lake.

Incremental appends (stream_to_lake, append-shard junction writes) accrete
small files; at 100 TB the file COUNT becomes the scan bottleneck (listing,
footers, task scheduling — one task per tiny file). Compaction rewrites a
partition's files into ~target-sized ones; pair with the deletion-vector
apply to fold soft-deletes into the rewrite (dedup/deletion_vectors.py
compaction note).

Rewrite-then-swap: the new layout lands in a staging dir and replaces the
live dir only after a successful write. The swap is two renames, NOT
atomic: between them the live path briefly does not exist, so compaction
requires a read quiesce (or a table format whose metadata swap is atomic —
this is the plain-parquet equivalent and inherits plain parquet's limits).
Crash safety comes from ``recover_dir``: every crash point is recoverable
because the data always exists in full at ``path``, ``.__old__`` or
``.__compact__`` (with Spark's _SUCCESS marker distinguishing a complete
staging write from a torn one); ``compact_dir`` runs recovery first, so a
crashed compaction heals on the next attempt."""

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


def recover_dir(path: str) -> None:
    """Heal a crashed compact_dir swap. Idempotent; safe to call anytime.

    States and resolutions (staging = ``.__compact__``, old = ``.__old__``):
      - live path exists → any leftover staging/old are from a crash before
        or after the swap: discard them (live data is intact);
      - live path missing, staging complete (_SUCCESS) → promote staging
        (the write finished; the crash hit between the two renames);
      - live path missing, staging absent/torn → restore old."""
    staging = path.rstrip("/") + ".__compact__"
    old = path.rstrip("/") + ".__old__"
    if os.path.exists(path):
        for leftover in (staging, old):
            if os.path.exists(leftover):
                shutil.rmtree(leftover)
        return
    staging_ok = os.path.exists(os.path.join(staging, "_SUCCESS"))
    if staging_ok:
        os.rename(staging, path)
        if os.path.exists(old):
            shutil.rmtree(old)
    elif os.path.exists(old):
        os.rename(old, path)
        if os.path.exists(staging):
            shutil.rmtree(staging)


def compact_dir(
    spark: SparkSession,
    path: str,
    *,
    target_bytes: int = 128 * 1024 * 1024,
    compression: str = "zstd",
) -> int:
    """Rewrite ``path``'s parquet into ceil(total/target) files. Returns the
    new file count. Row-level contents are preserved exactly (no dedup, no
    reorder guarantees). Runs crash recovery first; see module docstring
    for the (non-atomic) swap contract."""
    recover_dir(path)
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

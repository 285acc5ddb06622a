"""`OPTIMIZE`-style lake maintenance: one pass that leaves a partition
compacted, Z-order-clustered, and manifest-indexed — the composition of
sources/compact.py + operators/zorder.py + sources/manifest.py that a
Delta/Iceberg `OPTIMIZE table ZORDER BY (a, b)` performs, for a plain
parquet lake.

Order matters and each step feeds the next:

  1. read + Z-order cluster (operators/zorder.py): one range exchange on
     the Morton key — this is also the repartition a compaction pays, so
     clustering rides the rewrite for free;
  2. rewrite at target file size via the compact swap contract
     (staging dir → rename swap, crash recovery on the next call);
  3. rebuild the min/max manifest (sources/manifest.py) — file stats are
     only as tight as the layout, which step 1 just tightened on BOTH
     z-columns.

Run it per partition (e.g. per `year=`) after the day's appends; readers
need the same quiesce window the compact swap already documents.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from msgvault_spark.operators.zorder import zorder_by
from msgvault_spark.sources.compact import dir_stats, recover_dir
from msgvault_spark.sources.manifest import build_manifest, write_manifest


def optimize_table(
    spark: SparkSession,
    path: str,
    zorder_cols: tuple[str, str],
    *,
    stat_cols: list[str] | None = None,
    target_bytes: int = 128 * 1024 * 1024,
    compression: str = "zstd",
    manifest_dir: str | None = None,
) -> dict:
    """Compact + Z-order + manifest in one rewrite. Returns a summary
    dict (files before/after, rows, manifest path).

    IN-PLACE: the pre-rewrite files are DELETED after the swap. Never run
    this against a snapshot-managed lake (sources/snapshots.py) — prior
    versions' manifests would reference deleted files, breaking time
    travel and the vacuum retention guarantee. For versioned tables use
    ``optimize_snapshot`` below, which commits the rewrite as a new
    version and leaves old files for ``vacuum``."""
    recover_dir(path)
    n_before, total = dir_stats(path)
    n_out = max(1, math.ceil(total / target_bytes))
    df: DataFrame = spark.read.parquet(path)
    clustered = zorder_by(df, zorder_cols[0], zorder_cols[1], n_files=n_out)

    staging = path.rstrip("/") + ".__compact__"
    (
        clustered.write.mode("overwrite")
        .option("compression", compression)
        .parquet(staging)
    )
    old = path.rstrip("/") + ".__old__"
    os.rename(path, old)
    os.rename(staging, path)
    import shutil

    shutil.rmtree(old)

    n_after, _ = dir_stats(path)
    n_rows = spark.read.parquet(path).count()
    man = build_manifest(
        spark, path, stat_cols or list(zorder_cols)
    )
    # manifest lives BESIDE the lake dir (never inside it): dir_stats and
    # future compactions must see data files only
    man_path = write_manifest(
        man, manifest_dir or path.rstrip("/") + "_meta"
    )
    return {
        "files_before": n_before,
        "files_after": n_after,
        "n_rows": n_rows,
        "manifest": man_path,
    }


def optimize_snapshot(
    spark: SparkSession,
    lake_dir: str,
    zorder_cols: tuple[str, str],
    *,
    meta_dir: str | None = None,
    stat_cols: list[str] | None = None,
    target_bytes: int = 128 * 1024 * 1024,
    compression: str = "zstd",
) -> dict:
    """Snapshot-aware OPTIMIZE: Z-order + compact the CURRENT version's
    rows into a fresh generation directory and commit it as a new version.
    Old files stay on disk — readers pinned to prior versions keep
    working, and ``vacuum`` reclaims them once they leave the retention
    window. This is how Delta/Iceberg OPTIMIZE interacts with time travel;
    the in-place ``optimize_table`` is only for unversioned lakes."""
    from msgvault_spark.sources.merge import _gen_files
    from msgvault_spark.sources.snapshots import (
        commit_snapshot,
        latest_version,
        read_snapshot,
        snapshot_manifest,
    )

    v = latest_version(lake_dir, meta_dir=meta_dir)
    if v is None:
        raise ValueError(
            f"no committed snapshot for {lake_dir}; use optimize_table "
            "for unversioned lakes"
        )
    from msgvault_spark.sources.manifest import _local_path

    # ONE manifest read serves stats, row count, and the file list —
    # never a second full data scan on top of the rewrite's own read
    man_rows = snapshot_manifest(
        spark, lake_dir, meta_dir=meta_dir
    ).select("file", "n_rows").collect()
    files_before = len(man_rows)
    n_rows = sum(int(r["n_rows"] or 0) for r in man_rows)
    cur_files = [_local_path(r["file"]) for r in man_rows]
    df = read_snapshot(spark, lake_dir, meta_dir=meta_dir)
    total = sum(
        os.path.getsize(f) for f in cur_files if os.path.exists(f)
    )
    n_out = max(1, math.ceil(total / target_bytes))
    clustered = zorder_by(df, zorder_cols[0], zorder_cols[1], n_files=n_out)

    gen_dir = os.path.join(lake_dir, f"gen{v + 1}")
    (
        clustered.write.mode("overwrite")
        .option("compression", compression)
        .parquet(gen_dir)
    )
    new_v = commit_snapshot(
        spark, lake_dir, meta_dir=meta_dir,
        stat_cols=stat_cols or list(zorder_cols),
        files=_gen_files(gen_dir),
    )
    files_after = snapshot_manifest(
        spark, lake_dir, version=new_v, meta_dir=meta_dir
    ).count()
    return {
        "version": new_v,
        "files_before": files_before,
        "files_after": files_after,
        "n_rows": n_rows,
    }


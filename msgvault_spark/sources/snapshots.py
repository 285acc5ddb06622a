"""Snapshot isolation + time travel for a plain parquet lake — the core
mechanism of Delta/Iceberg (reads resolve a pinned FILE LIST, never a
directory listing) without the table-format lock-in.

Why directory reads break at scale: a query that lists the lake mid-append
sees half a commit — some of a writer's files, not others. Every modern
table format fixes this the same way: writers publish an immutable
manifest of exactly the files in a version, and readers resolve a VERSION,
then read only its files. This module is that protocol:

    commit_snapshot(lake)   →  _snapshots/v{N}/ (file list + row counts,
                               parquet) written FIRST, then the pointer
                               _snapshots/LATEST flipped by atomic rename —
                               a crash between the two leaves the previous
                               version live and v{N} invisible (torn
                               versions are never readable).
    read_snapshot(version)  →  DataFrame over exactly that version's
                               files. Files appended after the snapshot
                               are invisible (repeatable reads); files in
                               newer versions appear only after their
                               commit. Every historical version stays
                               readable: time travel == pass a version.

Composes with the rest of the S-layer: the version manifest rides the same
min/max stats as sources/manifest.py, so snapshot reads keep file-level
data skipping; sources/optimize.py:optimize_snapshot (rewrite into a new
generation, then commit — old files left for vacuum) is the compaction
story; the in-place optimize_table is for UNVERSIONED lakes only.
Metadata lives beside the lake (`<lake>_meta/`), like optimize.py.

At 100 TB the manifest is one tiny parquet per version (a row per file);
the LATEST flip is a single rename — the same object-store-atomic
primitive Delta's _last_checkpoint uses.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from msgvault_spark.sources.manifest import _local_path


def _snap_root(lake_dir: str, meta_dir: str | None) -> str:
    base = meta_dir or lake_dir.rstrip("/") + "_meta"
    return os.path.join(base, "_snapshots")


def snapshot_versions(lake_dir: str, *, meta_dir: str | None = None) -> list[int]:
    root = _snap_root(lake_dir, meta_dir)
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = re.fullmatch(r"v(\d+)", name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(lake_dir: str, *, meta_dir: str | None = None) -> int | None:
    """The committed latest — read from the pointer, not the directory
    listing, so a crashed half-written v{N} is never considered live."""
    marker = os.path.join(_snap_root(lake_dir, meta_dir), "LATEST")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return int(f.read().strip())


def commit_snapshot(
    spark: SparkSession,
    lake_dir: str,
    *,
    meta_dir: str | None = None,
    stat_cols: list[str] | None = None,
    files: list[str] | None = None,
    carry_rows: DataFrame | None = None,
) -> int:
    """Publish a file set as the next version (default: the lake dir's
    current files; pass ``files`` explicitly for copy-on-write commits
    that carry untouched files forward — sources/merge.py). Returns the
    new version number. Write order is manifest-then-pointer; the pointer
    flip is an atomic rename, so readers only ever resolve complete
    versions.

    ``carry_rows``: previous-version manifest rows to carry forward
    VERBATIM (same schema, i.e. the same ``stat_cols`` as this commit) —
    stats are then computed only over ``files``, so a CoW commit's IO is
    proportional to the files it rewrote, never the whole table."""
    root = _snap_root(lake_dir, meta_dir)
    os.makedirs(root, exist_ok=True)
    version = (latest_version(lake_dir, meta_dir=meta_dir) or 0) + 1

    df = spark.read.parquet(*files) if files else spark.read.parquet(lake_dir)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols or []:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    manifest = df.groupBy(F.input_file_name().alias("file")).agg(*aggs)
    if carry_rows is not None:
        manifest = manifest.unionByName(carry_rows.select(*manifest.columns))
    vdir = os.path.join(root, f"v{version}")
    manifest.coalesce(1).write.mode("overwrite").parquet(vdir)

    tmp = os.path.join(root, f".LATEST.tmp.{version}")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(root, "LATEST"))  # atomic flip
    return version


def read_snapshot(
    spark: SparkSession,
    lake_dir: str,
    *,
    version: int | None = None,
    meta_dir: str | None = None,
) -> DataFrame:
    """DataFrame over exactly one version's files (default: committed
    latest). Appends after that commit are invisible — the repeatable
    read — and every older version remains readable (time travel)."""
    v = version if version is not None else latest_version(
        lake_dir, meta_dir=meta_dir
    )
    if v is None:
        raise ValueError(f"no committed snapshot for {lake_dir}")
    vdir = os.path.join(_snap_root(lake_dir, meta_dir), f"v{v}")
    files = [
        _local_path(r["file"])
        for r in spark.read.parquet(vdir).select("file").collect()
    ]
    if not files:
        return spark.read.parquet(lake_dir).limit(0)
    return spark.read.parquet(*files)


def snapshot_manifest(
    spark: SparkSession,
    lake_dir: str,
    *,
    version: int | None = None,
    meta_dir: str | None = None,
) -> DataFrame:
    """The version's manifest rows (file, n_rows, optional min/max stats)
    — feed to sources/manifest.py:prune_files for skipping ON a pinned
    snapshot."""
    v = version if version is not None else latest_version(
        lake_dir, meta_dir=meta_dir
    )
    if v is None:
        raise ValueError(f"no committed snapshot for {lake_dir}")
    return spark.read.parquet(
        os.path.join(_snap_root(lake_dir, meta_dir), f"v{v}")
    )


def vacuum(
    spark: SparkSession,
    lake_dir: str,
    *,
    keep_versions: int = 2,
    meta_dir: str | None = None,
) -> dict:
    """GC data files referenced by NO retained version — the companion
    job every versioned table needs or storage grows monotonically.
    Retains the newest ``keep_versions`` snapshots (and their manifests);
    a file is deleted only if absent from EVERY retained manifest, so
    readers pinned within the retention window are never broken. The
    LATEST pointer is untouched. Returns {files_deleted, versions_dropped,
    versions_kept}."""
    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    versions = snapshot_versions(lake_dir, meta_dir=meta_dir)
    if not versions:
        return {"files_deleted": 0, "versions_dropped": 0, "versions_kept": 0}
    kept = versions[-keep_versions:]
    dropped = [v for v in versions if v not in kept]

    def _files_of(v: int) -> set[str]:
        return {
            os.path.abspath(_local_path(r["file"]))
            for r in snapshot_manifest(
                spark, lake_dir, version=v, meta_dir=meta_dir
            ).select("file").collect()
        }

    live: set[str] = set()
    for v in kept:
        live |= _files_of(v)
    dead: set[str] = set()
    for v in dropped:
        dead |= _files_of(v) - live

    n_deleted = 0
    for f in sorted(dead):
        if os.path.exists(f):
            os.remove(f)
            n_deleted += 1
    import shutil

    root = _snap_root(lake_dir, meta_dir)
    for v in dropped:
        shutil.rmtree(os.path.join(root, f"v{v}"), ignore_errors=True)
    return {
        "files_deleted": n_deleted,
        "versions_dropped": len(dropped),
        "versions_kept": len(kept),
    }


def snapshot_diff(
    spark,
    lake_dir: str,
    v_from: int,
    v_to: int,
    key: str,
    value_cols: list[str],
    *,
    meta_dir: str | None = None,
):
    """CDC-style diff between two committed versions: one row per changed
    key with change_type ∈ {inserted, deleted, updated} and the old/new
    values — the change feed a downstream consumer reads instead of
    re-scanning the table (Delta CDF / Iceberg changelog shape).

    Plan: FULL OUTER join of the two pinned file lists on the key —
    both sides come from the same lake layout, so at scale the join is
    co-partitioned by the write-time clustering; unchanged rows drop in
    the same stage. No snapshot is ever mutated; the diff is derived."""
    from pyspark.sql import functions as F

    a = read_snapshot(spark, lake_dir, version=v_from, meta_dir=meta_dir)
    b = read_snapshot(spark, lake_dir, version=v_to, meta_dir=meta_dir)
    av = a.select(
        F.col(key).alias("__k"),
        *[F.col(c).alias(f"old_{c}") for c in value_cols],
    )
    bv = b.select(
        F.col(key).alias("__k2"),
        *[F.col(c).alias(f"new_{c}") for c in value_cols],
    )
    j = av.join(bv, F.col("__k") == F.col("__k2"), "full_outer")
    changed = [
        ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")) for c in value_cols
    ]
    any_change = changed[0]
    for c in changed[1:]:
        any_change = any_change | c
    change_type = (
        F.when(F.col("__k").isNull(), F.lit("inserted"))
        .when(F.col("__k2").isNull(), F.lit("deleted"))
        .when(any_change, F.lit("updated"))
    )
    return (
        j.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            F.coalesce(F.col("__k"), F.col("__k2")).alias(key),
            "change_type",
            *[f"old_{c}" for c in value_cols],
            *[f"new_{c}" for c in value_cols],
        )
    )

"""File-level data skipping for plain parquet: a Delta-style stats
manifest without the table format.

Hive partition pruning skips DIRECTORIES; inside a partition, Spark still
opens every file (row-group stats help only after the footer read — at
100 TB, just listing + footer-reading a million files dominates short
queries). Delta/Iceberg fix this with per-file min/max stats in metadata;
this module is that design for a plain parquet lake:

    build:  one scan → manifest rows (file, n_rows, per-column min/max) —
            written next to the lake, tiny;
    plan:   evaluate the query predicate AGAINST THE MANIFEST (min/max
            interval logic) → the file subset that can possibly match;
    read:   spark.read.parquet(*files) on that subset — Spark never
            touches skipped files.

Conservative by construction: a file is read unless its stats PROVE no row
matches. Stats go stale only additively (new files unknown → read them:
union the manifest-missing files into the plan)."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def build_manifest(
    spark: SparkSession, lake_glob: str, stat_cols: list[str]
) -> DataFrame:
    """One row per parquet file: (file, n_rows, <c>_min, <c>_max ...)."""
    df = spark.read.parquet(lake_glob)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return df.groupBy(
        F.input_file_name().alias("file")
    ).agg(*aggs)


def write_manifest(manifest: DataFrame, base_dir: str) -> str:
    path = os.path.join(base_dir, "_manifest")
    manifest.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def load_manifest(spark: SparkSession, base_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base_dir, "_manifest"))


def prune_files(
    manifest: DataFrame,
    *,
    eq: dict[str, object] | None = None,
    ranges: dict[str, tuple[object, object]] | None = None,
) -> list[str]:
    """Files that can contain a match for the conjunctive predicate:
    ``eq``: col == v  → keep file iff c_min <= v <= c_max;
    ``ranges``: lo <= col <= hi (either bound None) → interval overlap.
    NULL stats (all-null column in a file) keep the file (conservative).
    The manifest is tiny — this collect is a planning step, not a scan."""
    cond = F.lit(True)
    for c, v in (eq or {}).items():
        ok = (F.col(f"{c}_min") <= F.lit(v)) & (F.lit(v) <= F.col(f"{c}_max"))
        cond = cond & F.coalesce(ok, F.lit(True))
    for c, (lo, hi) in (ranges or {}).items():
        ok = F.lit(True)
        if hi is not None:
            ok = ok & (F.col(f"{c}_min") <= F.lit(hi))
        if lo is not None:
            ok = ok & (F.col(f"{c}_max") >= F.lit(lo))
        cond = cond & F.coalesce(ok, F.lit(True))
    return [r["file"] for r in manifest.filter(cond).select("file").collect()]


def skipping_read(
    spark: SparkSession,
    manifest: DataFrame,
    *,
    eq: dict[str, object] | None = None,
    ranges: dict[str, tuple[object, object]] | None = None,
) -> DataFrame:
    """Read only the files the manifest cannot rule out. The caller still
    applies the actual predicate — skipping is a superset guarantee."""
    files = prune_files(manifest, eq=eq, ranges=ranges)
    if not files:
        # empty frame with the lake schema: read zero rows via the manifest
        # file list being empty is not expressible — use limit(0) on any file
        any_file = [r["file"] for r in manifest.select("file").limit(1).collect()]
        return spark.read.parquet(*any_file).limit(0)
    return spark.read.parquet(*files)

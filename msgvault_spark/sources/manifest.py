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
matches. Stats go stale only additively when ``skipping_read`` is given the
lake location (``lake_glob``): files present in the lake but absent from
the manifest have unknown stats, so they are unioned into the read set.
Without ``lake_glob`` the read covers manifest-listed files only — rebuild
the manifest after appends in that mode."""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _local_path(uri: str) -> str:
    """input_file_name() yields file: URIs locally; normalize (scheme strip
    + percent-decode) for set comparison against os-level listings — a path
    with a space arrives as ``file:...%20...`` and must still match the
    filesystem spelling, else merge/skipping misclassify the file."""
    from urllib.parse import unquote, urlparse

    if uri.startswith("file:"):
        return unquote(urlparse(uri).path)
    return uri  # already a filesystem path: decode nothing (literal %)


def _list_lake_files(lake_glob: str) -> list[str]:
    """Data files currently in the lake. Local-FS listing; on an object
    store swap in the FS client's list call — the manifest protocol is
    identical."""
    if any(ch in lake_glob for ch in "*?["):
        paths = _glob.glob(lake_glob)
    elif os.path.isdir(lake_glob):
        paths = []
        for root, dirs, files in os.walk(lake_glob):
            # hidden/metadata dirs (_staging, _batches, _manifest) are not
            # data — prune, matching Spark's own listing rules
            dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
            paths += [os.path.join(root, f) for f in files]
    else:
        paths = [lake_glob] if os.path.exists(lake_glob) else []
    return [
        p
        for p in paths
        if p.endswith(".parquet")
        and not os.path.basename(p).startswith((".", "_"))
    ]


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
    lake_glob: str | None = None,
) -> DataFrame:
    """Read only the files the manifest cannot rule out. The caller still
    applies the actual predicate — skipping is a superset guarantee.

    ``lake_glob`` (the lake dir or glob the manifest was built from) makes
    stale manifests additively safe: files in the lake but missing from the
    manifest have unknown stats and are always read. Omit it only when the
    manifest is known current (rebuilt with every append)."""
    files = prune_files(manifest, eq=eq, ranges=ranges)
    if lake_glob is not None:
        known = {
            _local_path(r["file"])
            for r in manifest.select("file").collect()
        }
        unknown = [
            f for f in _list_lake_files(lake_glob)
            if os.path.abspath(f) not in {os.path.abspath(k) for k in known}
        ]
        files = files + unknown
    if not files:
        # empty pruned set: emit an explicit empty frame with the lake
        # schema (from any known file); a fully empty lake has no schema to
        # offer, so say so instead of letting spark.read.parquet() throw on
        # zero paths
        any_file = [r["file"] for r in manifest.select("file").limit(1).collect()]
        if lake_glob is not None and not any_file:
            any_file = _list_lake_files(lake_glob)[:1]
        if not any_file:
            raise ValueError(
                "skipping_read: manifest and lake are both empty — no "
                "schema source; build the manifest after the first append"
            )
        return spark.read.parquet(*any_file).limit(0)
    return spark.read.parquet(*files)

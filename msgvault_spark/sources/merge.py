"""Copy-on-write MERGE (keyed upsert) over snapshot-managed parquet —
`MERGE INTO t USING u ON t.key = u.key WHEN MATCHED UPDATE WHEN NOT
MATCHED INSERT`, at FILE granularity, the way Delta/Iceberg CoW executes
it:

  1. resolve the current snapshot's file list (sources/snapshots.py);
  2. find the files that actually CONTAIN an updated key — one
     input_file_name() scan semi-joined to the (broadcast) update keys;
     at 100 TB this is the step that makes MERGE affordable: a 1%-of-keys
     update typically touches a few % of files, and the snapshot
     manifest's min/max stats can pre-prune the probe further;
  3. rewrite ONLY those files (their surviving rows ∪ all updates) into a
     fresh generation directory;
  4. commit a new version whose manifest = untouched files (carried
     forward by reference, zero IO) + the new generation's files.

Readers pinned to older versions keep seeing the pre-merge table (the
rewritten files are not deleted — that's what makes time travel work);
a vacuum that drops files unreferenced by any retained version is the
standard companion job.

The merge-on-read alternative lives in dedup/deletion_vectors.py; this
module is the write-amplifying/read-fast half of that trade.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from msgvault_spark.sources.manifest import _local_path
from msgvault_spark.sources.snapshots import (
    commit_snapshot,
    latest_version,
    snapshot_manifest,
)


def merge_upsert(
    spark: SparkSession,
    lake_dir: str,
    updates: DataFrame,
    key: str,
    *,
    meta_dir: str | None = None,
    stat_cols: list[str] | None = None,
) -> int:
    """Upsert ``updates`` by ``key`` into the snapshot-managed table at
    ``lake_dir``; returns the committed version. First call (no snapshot
    yet) initializes the table from ``updates`` alone."""
    v = latest_version(lake_dir, meta_dir=meta_dir)
    gen_dir = os.path.join(lake_dir, f"gen{(v or 0) + 1}")

    if v is None:
        updates.write.mode("overwrite").parquet(gen_dir)
        return commit_snapshot(
            spark, lake_dir, meta_dir=meta_dir, stat_cols=stat_cols,
            files=_gen_files(gen_dir),
        )

    snap = snapshot_manifest(spark, lake_dir, meta_dir=meta_dir)
    base_uris = [r["file"] for r in snap.select("file").collect()]
    base_files = [_local_path(u) for u in base_uris]
    upd_keys = updates.select(key).distinct()
    affected = {
        _local_path(r["f"])
        for r in spark.read.parquet(*base_files)
        .withColumn("f", F.input_file_name())
        .join(F.broadcast(upd_keys), key)
        .select("f").distinct().collect()
    }
    untouched_uris = [
        u for u in base_uris if _local_path(u) not in affected
    ]

    if affected:
        survivors = spark.read.parquet(*sorted(affected)).join(
            F.broadcast(upd_keys), key, "left_anti"
        )
        new_data = survivors.unionByName(updates)
    else:
        new_data = updates
    new_data.write.mode("overwrite").parquet(gen_dir)

    # commit stats over the new generation ONLY; untouched files' manifest
    # rows ride forward verbatim (same stat_cols), so commit IO scales
    # with the touched-file set, not the table
    return commit_snapshot(
        spark, lake_dir, meta_dir=meta_dir, stat_cols=stat_cols,
        files=_gen_files(gen_dir),
        carry_rows=snap.filter(F.col("file").isin(untouched_uris)),
    )


def _gen_files(gen_dir: str) -> list[str]:
    return [
        os.path.join(gen_dir, f)
        for f in os.listdir(gen_dir)
        if f.endswith(".parquet")
    ]

"""Count-min sketch as RELATIONAL state: (depth_row, bucket, count) rows.

Frequency estimation over unbounded key domains (the heavy-hitters
problem) without holding per-key state. Classic CMS is a d×w counter
matrix; here the matrix IS a DataFrame — which buys the properties that
matter at 100 TB:

  - build = one groupBy over (d, bucket): map-side partial aggregation,
    output d×w rows TOTAL regardless of key cardinality;
  - merge = UNION ALL + SUM over the same (d, bucket) grid — the same
    mergeable-state contract as the HLL rollup and incremental-agg state
    (operators/sketch.py, operators/incremental_agg.py); shard/day
    sketches roll up without touching raw data;
  - estimate(key) = MIN over the key's d counters; CMS guarantees
    estimate ≥ true count (one-sided error ≤ 2N/w with prob 1-(1/2)^d).

Hashes are md5-derived (row d of key k buckets at
``conv(md5(d:k)[:8], 16, 10) % w``) — deterministic and engine-portable,
so an oracle can rebuild the IDENTICAL sketch (the minhash md5 trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key_col: F.Column, d: int, width: int) -> F.Column:
    h = F.md5(F.concat(F.lit(f"{d}:"), key_col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).cast("int")


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: d×w rows (d, bucket, count). ``weight_col`` counts
    weighted occurrences (defaults to 1 per row)."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = df.select(F.col(key_col).alias("_k"), w.alias("_w"))
    per_depth = [
        rows.select(
            F.lit(d).alias("d"),
            _bucket(F.col("_k"), d, width).alias("bucket"),
            F.col("_w"),
        )
        for d in range(depth)
    ]
    union = per_depth[0]
    for extra in per_depth[1:]:
        union = union.unionByName(extra)
    return union.groupBy("d", "bucket").agg(F.sum("_w").alias("count"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): SUM per cell."""
    union = sketches[0]
    for s in sketches[1:]:
        union = union.unionByName(s)
    return union.groupBy("d", "bucket").agg(F.sum("count").alias("count"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(key, estimate) for each row of ``keys``: min over the key's d
    counters. The sketch is d×w rows — always the broadcast side."""
    probes_parts = [
        keys.select(
            F.col(key_col).alias("key"),
            F.lit(d).alias("d"),
            _bucket(F.col(key_col), d, width).alias("bucket"),
        )
        for d in range(depth)
    ]
    probes = probes_parts[0]
    for extra in probes_parts[1:]:
        probes = probes.unionByName(extra)
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("key")
        .agg(F.min("count").cast("long").alias("estimate"))
    )


def cms_oracle_sql(
    source_select: str,
    key_expr: str,
    probe_select: str,
    *,
    depth: int = 4,
    width: int = 256,
) -> str:
    """DuckDB replica building the identical sketch (same md5 buckets).
    ``source_select`` yields rows with ``key_expr`` as the counted key;
    ``probe_select`` yields (key) rows to estimate."""
    bucket = (
        "CAST(('0x' || substring(md5(CAST(d AS VARCHAR) || ':' || "
        "CAST({k} AS VARCHAR)), 1, 8))::BIGINT % {w} AS INTEGER)"
    )
    return f"""
WITH src AS ({source_select}),
depths AS (SELECT unnest(generate_series(0, {depth - 1})) AS d),
cells AS (
    SELECT d, {bucket.format(k=key_expr, w=width)} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS count
    FROM src CROSS JOIN depths
    GROUP BY 1, 2
),
probes AS (
    SELECT key, d, {bucket.format(k='key', w=width)} AS bucket
    FROM ({probe_select}) CROSS JOIN depths
)
SELECT p.key, CAST(MIN(c.count) AS BIGINT) AS estimate
FROM probes p JOIN cells c USING (d, bucket)
GROUP BY p.key
"""

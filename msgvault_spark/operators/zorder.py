"""Z-order (Morton) clustering: lay the lake out so MULTI-column range
predicates prune files — the Delta/Iceberg OPTIMIZE ZORDER BY idea for a
plain parquet lake, feeding the min/max manifest (sources/manifest.py).

Why: range-partitioning on one column makes that column's min/max ranges
tight per file but leaves every other column's ranges full-width — a
query on the second column reads the whole lake. Interleaving the bits
of both columns into one sort key makes each file a small HYPERCUBE in
(a, b) space: both columns get tight ranges, so the manifest prunes on
either (or both) at ~√ the single-column selectivity — the standard
space-filling-curve trade.

All JVM expressions; shifts are literal per bit position so this is a
pure map. Columns are first normalized to ``bits``-wide non-negative
ints by a min/max affine scale — computed in-plan from a 1-row broadcast
(the W1 total pattern), no driver collect.

ETL shape at 100 TB: morton key → repartitionByRange (one exchange, the
same one a write-time sort needs anyway) → sortWithinPartitions → write
+ manifest rebuild. Query time pays zero: pruning happens in the
manifest, and the key column itself need not even be written.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_bits(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Affine map [cmin, cmax] → [0, 2^bits - 1] (integer arithmetic on
    the numerator; a degenerate constant column maps to 0)."""
    span = (cmax - cmin).cast("long")
    scaled = F.when(span <= 0, F.lit(0)).otherwise(
        ((col.cast("long") - cmin.cast("long")) * ((1 << bits) - 1) / span)
        .cast("long")
    )
    return F.least(F.greatest(scaled, F.lit(0)), F.lit((1 << bits) - 1))


def _interleave(a: Column, b: Column, bits: int) -> Column:
    """Morton code: bit i of a → position 2i, bit i of b → 2i+1."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def morton_key(
    df: DataFrame, col_a: str, col_b: str, *, bits: int = 16
) -> DataFrame:
    """Add ``__z`` — the Morton interleave of the two columns, normalized
    per the frame's own min/max (broadcast 1-row join, no collect)."""
    rng = df.agg(
        F.min(col_a).alias("__amin"), F.max(col_a).alias("__amax"),
        F.min(col_b).alias("__bmin"), F.max(col_b).alias("__bmax"),
    )
    with_rng = df.join(F.broadcast(rng))
    z = _interleave(
        _scale_to_bits(F.col(col_a), F.col("__amin"), F.col("__amax"), bits),
        _scale_to_bits(F.col(col_b), F.col("__bmin"), F.col("__bmax"), bits),
        bits,
    )
    return with_rng.withColumn("__z", z).drop(
        "__amin", "__amax", "__bmin", "__bmax"
    )


def zorder_by(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    n_files: int = 16,
    bits: int = 16,
) -> DataFrame:
    """Cluster rows for writing: one range exchange on the Morton key +
    in-partition sort, key dropped. Follow with .write.parquet(...) and a
    manifest rebuild; 2-D box predicates then prune to the files whose
    hypercube intersects the box."""
    return (
        morton_key(df, col_a, col_b, bits=bits)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )

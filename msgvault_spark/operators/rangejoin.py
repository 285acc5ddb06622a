"""Range (interval) join: pair rows whose timestamps fall within a window
of each other, without the quadratic blowup.

A naive ``l JOIN r ON l.k = r.k AND r.ts BETWEEN l.ts - w AND l.ts + w``
gives Spark only the equi-key to hash on; every key's full l×r cross
product materializes before the range predicate filters it — quadratic in
per-key row count, fatal on hot keys at 100 TB.

Bucketized shape instead (what Databricks' range-join hints and
KeyedStream interval joins do underneath): bin both sides into
``window``-sized buckets, equi-join on (key, bucket) with each left row
duplicated into its three candidate buckets (b-1, b, b+1 — every right row
within ±window of the left lands in one of them; each right row lives in
exactly ONE bucket, so no pair appears twice), then apply the exact range
predicate. The cross product shrinks from |key| to |key ∩ 3-bucket span|:
linear for time-local data. Cost: 3× left-side duplication, one shuffle,
exact results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_s: int,
    direction: str = "both",
) -> DataFrame:
    """Inner join of left×right on ``on`` where right_ts is within
    ``window_s`` seconds of left_ts (``direction``: 'both' | 'forward' —
    right at-or-after left | 'backward'). Output: all left columns + right
    payload columns (right key/ts renamed ``matched_ts``)."""
    lsec = F.col(left_ts).cast("long")
    rsec = F.col(right_ts).cast("long")

    rpayload = [c for c in right.columns if c not in (on, right_ts)]
    r = right.select(
        F.col(on).alias("__k"),
        F.floor(rsec / window_s).alias("__b"),
        rsec.alias("__rs"),
        F.col(right_ts).alias("matched_ts"),
        *[F.col(c) for c in rpayload],
    )
    # duplicate LEFT into the two buckets any in-window right row can be in
    l = left.withColumn(
        "__b0", F.floor(lsec / window_s)
    ).withColumn(
        "__b",
        F.explode(
            F.array(F.col("__b0") - 1, F.col("__b0"), F.col("__b0") + 1)
        ),
    )

    if direction == "forward":
        pred = (F.col("__rs") >= lsec) & (F.col("__rs") <= lsec + window_s)
    elif direction == "backward":
        pred = (F.col("__rs") <= lsec) & (F.col("__rs") >= lsec - window_s)
    else:
        pred = (F.col("__rs") >= lsec - window_s) & (
            F.col("__rs") <= lsec + window_s
        )

    joined = l.join(
        r, (F.col(on) == F.col("__k")) & (l["__b"] == r["__b"]), "inner"
    ).filter(pred)
    return joined.select(
        *[F.col(c) for c in left.columns],
        *[F.col(c) for c in rpayload],
        F.col("matched_ts"),
    )

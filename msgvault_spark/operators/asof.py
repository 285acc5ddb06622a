"""As-of (point-in-time) join: for each left row, the single most recent
right row at or before its timestamp, per key.

Spark has no ASOF JOIN (DuckDB/Pandas/kdb do). The naive rebuild —
equi-join on key + range filter + row_number — explodes to |left|×|right
per key| intermediate rows before pruning; on power-law keys that is the
join that kills the job at 100 TB.

Scale-safe shape instead (the classic union-and-carry-forward):

    1. tag left/right rows, union them (no join!);
    2. one window over (key) ordered by (ts, side): ``last(right payload,
       ignorenulls)`` carries the latest right row forward;
    3. keep left rows; their carried struct IS the as-of match.

One shuffle on the key, linear row count, sort amortized with the window.
Right rows order BEFORE left rows at equal ts, making the match inclusive
(right.ts <= left.ts), matching DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``.

``tolerance`` (seconds) turns matches older than the horizon into NULLs —
the Pandas ``merge_asof(tolerance=...)`` contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_s: int | None = None,
) -> DataFrame:
    """Backward inclusive as-of join. Output: every ``left`` row plus the
    matched right row's payload columns (NULL when no right row at or
    before it). Right payload = every right column except key + ts, plus
    ``matched_ts`` (the matched right row's timestamp).

    Right-side ties (same key, same ts) resolve deterministically to the
    GREATEST payload struct (lexicographic across payload columns in
    right's column order) — the window orders by the payload struct, so the
    winner is stable across runs and partitionings. Payload columns must be
    orderable for this (no map columns); pre-dedupe the right frame if they
    aren't, or when a different tie policy matters."""
    rpayload = [c for c in right.columns if c not in (on, right_ts)]

    lt = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{c}`:{right.schema[c].dataType.simpleString()}"
                for c in rpayload + [right_ts]
            ) + ">"
        ).alias("__r"),
    )
    rt = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lt.schema["__l"].dataType.simpleString()).alias("__l"),
        F.struct(
            *[F.col(c) for c in rpayload],
            F.col(right_ts).alias(right_ts),
        ).alias("__r"),
    )

    # __r asc_nulls_first: among right rows tied on (key, ts) the greatest
    # payload struct sorts last, so last(ignorenulls) picks it — the
    # deterministic tie-break the docstring promises. Left rows (__r NULL)
    # are unaffected: their relative order within a tie never changes which
    # non-null __r is carried.
    w = (
        Window.partitionBy("__k")
        .orderBy(
            F.col("__ts").asc(),
            F.col("__side").asc(),
            F.col("__r").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        lt.unionByName(rt)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )

    match = F.col("__match")
    if tolerance_s is not None:
        horizon = F.col("__ts").cast("long") - F.lit(int(tolerance_s))
        match = F.when(
            F.col("__match")[right_ts].cast("long") >= horizon, F.col("__match")
        )

    # right payload columns colliding with a left column come out suffixed
    # `_right` (the merge_asof convention) so the result never carries
    # ambiguous duplicate names
    out_cols = [F.col("__l")[c].alias(c) for c in left.columns]
    out_cols += [
        match[c].alias(f"{c}_right" if c in left.columns else c)
        for c in rpayload
    ]
    out_cols.append(match[right_ts].alias("matched_ts"))
    return carried.select(*out_cols)

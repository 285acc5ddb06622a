"""SCD Type-2 merge: versioned dimension maintenance (history-preserving
upsert), the standard lakehouse answer to mutable entities — here,
participants whose display names / phones change across syncs (the
reference UPDATEs participants in place, store/participants.go; at lake
scale in-place update is a rewrite, so version instead).

Table contract: one row per (key, version): attribute columns +
``valid_from`` (timestamp) + ``valid_to`` (NULL = current row).

Merge of an update batch (key, attrs, effective_ts):
    - rows whose attrs CHANGED: current version closed (valid_to =
      effective_ts), new version inserted (valid_from = effective_ts);
    - unchanged updates: no-op (no version churn);
    - brand-new keys: inserted as current;
    - history rows: untouched.

Shape: one equi-join of current-rows ⋈ updates + unions — no window over
history, so cost scales with |updates| + |dim|, not |history| × versions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    *,
    key: str,
    attrs: list[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Next state of the SCD2 ``dim`` after applying ``updates``.
    ``updates`` must carry exactly one row per key (pre-aggregate a batch
    to its latest row first)."""
    history = dim.filter(F.col(valid_to).isNotNull())
    current = dim.filter(F.col(valid_to).isNull())

    u = updates.select(
        F.col(key).alias("__uk"),
        F.col(effective_col).alias("__eff"),
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
    )
    changed_pred = None
    for a in attrs:
        # null-safe inequality: <=> is null-safe equality
        diff = ~F.col(a).eqNullSafe(F.col(f"__u_{a}"))
        changed_pred = diff if changed_pred is None else (changed_pred | diff)

    cur_u = current.join(u, F.col(key) == F.col("__uk"), "left")

    untouched_current = cur_u.filter(F.col("__uk").isNull()).select(dim.columns)
    unchanged_current = cur_u.filter(
        F.col("__uk").isNotNull() & ~F.coalesce(changed_pred, F.lit(False))
    ).select(dim.columns)
    closed = (
        cur_u.filter(F.col("__uk").isNotNull() & changed_pred)
        .withColumn(valid_to, F.col("__eff"))
        .select(dim.columns)
    )

    # new versions: updates whose key is new OR whose attrs changed
    cur_slim = current.select(
        F.col(key).alias("__ck"), *[F.col(a).alias(f"__c_{a}") for a in attrs]
    )
    u_cur = u.join(cur_slim, F.col("__uk") == F.col("__ck"), "left")
    chg_from_cur = None
    for a in attrs:
        d = ~F.col(f"__c_{a}").eqNullSafe(F.col(f"__u_{a}"))
        chg_from_cur = d if chg_from_cur is None else (chg_from_cur | d)
    fresh = u_cur.filter(
        F.col("__ck").isNull() | F.coalesce(chg_from_cur, F.lit(False))
    )
    inserted = fresh.select(
        F.col("__uk").alias(key),
        *[F.col(f"__u_{a}").alias(a) for a in attrs],
        F.col("__eff").alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
    ).select(dim.columns)

    return (
        history.unionByName(untouched_current)
        .unionByName(unchanged_current)
        .unionByName(closed)
        .unionByName(inserted)
    )

"""Exact-key dedup: duplicate grouping, survivor selection, merge plan.

Rebuild of the reference two-pass dedup (internal/dedup/dedup.go):
  D1 pass 1 — group by RFC822 Message-ID within scoped sources
              (dedup.go:260-440);
  D2 pass 2 — group by SHA-256 of normalized content, excluding pass-1 ids
              (dedup.go:501-671);
  D3        — survivor selection: sent-copy candidates first, then source
              preference, has-raw-MIME, label count, earliest archive,
              lowest id (dedup.go:760-828);
  D4        — merge: union labels onto survivor, soft-delete losers with a
              delete_batch_id (dedup.go:834-916).

Spark shape: grouping = groupBy/window (embarrassingly parallel, no
driver-side loops); survivor = ``row_number() = 1`` over the composite
priority ordering; merge = two joins producing a survivors frame (with
unioned labels) and a losers frame (flagged), applied copy-on-write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_dup_groups(
    df: DataFrame,
    key: Column | str,
    *,
    id_col: str = "id",
    scope: Column | str | None = None,
) -> DataFrame:
    """Pass-1 grouping (D1): rows sharing ``key`` (within ``scope`` if
    given). Returns input rows + (group_key, group_size), only groups with
    ≥2 members — the dedup work set."""
    key_col = F.col(key) if isinstance(key, str) else key
    parts = [key_col]
    if scope is not None:
        parts.append(F.col(scope) if isinstance(scope, str) else scope)
    w = Window.partitionBy(*parts)
    return (
        df.withColumn("group_key", key_col)
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .filter(F.col("group_size") >= 2)
    )


def normalize_text(col: Column) -> Column:
    """Content canonicalization for text dedup: casefold, collapse
    whitespace, trim. (For raw MIME the reference instead drops 18 transport
    headers and sorts the rest, dedup.go:673-753 — see normalize_mime_udf.)"""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def content_hash(col: Column) -> Column:
    """SHA-256 hex of normalized content (D2; reference sha256Hex
    dedup.go:755-758)."""
    return F.sha2(normalize_text(col), 256)


def select_survivors(
    groups: DataFrame,
    priority: list[Column],
    *,
    id_col: str = "id",
    group_col: str = "group_key",
    sent_copy: Column | None = None,
) -> DataFrame:
    """D3: add ``is_survivor`` per group via one window pass.

    ``priority``: ordering columns, best first (e.g. source-preference rank
    asc, label_count desc, sent_at asc, id asc). ``sent_copy``: boolean
    column of the reference's sent-copy signal (SENT label ∨ is_from_me ∨
    identity match, dedup.go:196-200) — groups containing any sent copy
    restrict survivor candidates to those rows."""
    order: list[Column] = []
    if sent_copy is not None:
        w_any = Window.partitionBy(group_col)
        groups = groups.withColumn(
            "_has_sent", F.max(sent_copy.cast("int")).over(w_any) == 1
        )
        # sent copies sort first iff the group has any
        order.append(
            F.when(F.col("_has_sent") & sent_copy, 0).otherwise(1).asc()
        )
    order.extend(priority)
    order.append(F.col(id_col).asc())  # final deterministic tie-break
    w = Window.partitionBy(group_col).orderBy(*order)
    out = groups.withColumn("_rn", F.row_number().over(w)).withColumn(
        "is_survivor", F.col("_rn") == 1
    )
    return out.drop("_rn", "_has_sent") if sent_copy is not None else out.drop("_rn")


def select_survivors_agg(
    groups: DataFrame,
    priority: list[Column],
    *,
    id_col: str = "id",
    group_col: str = "group_key",
    sent_copy: Column | None = None,
) -> DataFrame:
    """D3 at scale: survivor per group as ONE hash aggregate.

    Same survivor policy as :func:`select_survivors` (reference
    dedup.go:760-828) but expressed as ``min`` over the priority tuple —
    a partial-agg-absorbed groupBy whose shuffle carries one row per
    (group, partition) instead of every group member through a per-group
    sort window. Returns (group_key, survivor_id, group_size); callers
    filter ``group_size >= 2`` for the dedup work set (the separate
    group-size window of :func:`exact_dup_groups` is not needed on this
    path — the same aggregate counts it).

    Constraints vs the window variant: ``priority`` columns must all be
    ASCENDING (negate numerics for descending) and non-null (struct
    comparison would sort a NULL component first where the window's
    default NULLS FIRST agrees — but don't rely on it across engines).
    Equivalence to the window policy is property-fuzzed in
    tests/test_property_equivalence.py."""
    tup = F.struct(
        *[p.alias(f"_p{i}") for i, p in enumerate(priority)],
        F.col(id_col).alias("_sid"),
    )
    aggs = [
        F.count(F.lit(1)).alias("group_size"),
        F.min(tup).alias("_all"),
    ]
    if sent_copy is not None:
        # best among sent copies, null when the group has none — the
        # "sent copies win iff the group has any" rule as a coalesce
        aggs.append(F.min(F.when(sent_copy, tup)).alias("_sent"))
    out = groups.groupBy(group_col).agg(*aggs)
    best = (
        F.coalesce(F.col("_sent"), F.col("_all"))
        if sent_copy is not None
        else F.col("_all")
    )
    return out.select(
        F.col(group_col),
        best.getField("_sid").alias("survivor_id"),
        F.col("group_size"),
    )


def dedup_merge_plan(
    marked: DataFrame,
    message_labels: DataFrame,
    *,
    id_col: str = "id",
    group_col: str = "group_key",
    batch_id: str = "dedup-batch-1",
) -> tuple[DataFrame, DataFrame]:
    """D4: (survivor_labels, losers).

    survivor_labels — (survivor_id, label_id) = union of every group
    member's labels deduplicated (the reference unions loser labels onto the
    survivor, dedup.go:834-916).
    losers — ids to soft-delete with ``delete_batch_id`` (undo-able by
    batch, reference store/dedup.go:359-376)."""
    members = marked.select(
        F.col(id_col).alias("member_id"),
        F.col(group_col),
        F.col("is_survivor"),
    )
    survivors = members.filter("is_survivor").select(
        F.col(group_col), F.col("member_id").alias("survivor_id")
    )
    group_labels = (
        members.join(
            message_labels,
            members["member_id"] == message_labels["message_id"],
        )
        .select(group_col, "label_id")
        .distinct()
    )
    survivor_labels = survivors.join(group_labels, group_col).select(
        "survivor_id", "label_id"
    )
    losers = members.filter(~F.col("is_survivor")).select(
        F.col("member_id").alias("id"),
        F.lit(batch_id).alias("delete_batch_id"),
    )
    return survivor_labels, losers

"""Incrementally-maintained aggregates: partial-state tables merged at
query time.

The reference rebuilds its cache when the archive changes (build_cache.go
full/incremental staleness decision); its aggregate views then re-scan the
cache. At 100 TB, re-aggregating history every time one day of data lands
is the dominant waste. The lakehouse fix is the same trick streaming
engines use for state stores, materialized here as a table:

    state(grain, key) = re-associable partials (count, sum, min, max)
    ingest day D       -> aggregate ONLY day D's rows, append its state
    query              -> merge states over the grains in scope (tiny scan)

Append-only, idempotent per grain (overwrite a grain's rows to reprocess),
and any grain subset (year, source, partition range) serves filtered
queries from the same table. AVG derives from (sum, count); distincts need
the HLL sketch rollup (operators/sketch.py) — same pattern, mergeable
state. Exactly the two-level design of the wide-message cache and the BM25
index: move scans to ETL, keep queries on pre-digested bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {"cnt": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def build_agg_state(
    df: DataFrame,
    keys: list[str],
    grain: list[str],
    measures: dict[str, str],
) -> DataFrame:
    """Partial aggregate of one ingest slice: per (grain + keys) rows of
    ``{out}_cnt/_sum/_min/_max`` for each measure column in ``measures``
    (out name → input column). Persist/append this per grain."""
    aggs = []
    for out, col in measures.items():
        aggs += [
            F.count(col).alias(f"{out}_cnt"),
            F.sum(col).alias(f"{out}_sum"),
            F.min(col).alias(f"{out}_min"),
            F.max(col).alias(f"{out}_max"),
        ]
    return df.groupBy(*grain, *keys).agg(*aggs)


def merge_agg_state(state: DataFrame, keys: list[str]) -> DataFrame:
    """Fold grain-level partials up to ``keys``: counts/sums add, mins/maxs
    re-min/max. Runs on the state table only."""
    aggs = []
    for c in state.columns:
        if c in keys:
            continue
        kind = c.rsplit("_", 1)[-1]
        if kind in _MERGE:
            aggs.append(_MERGE[kind](c).alias(c))
    return state.groupBy(*keys).agg(*aggs)


def upsert_agg_state(
    state: DataFrame, fresh: DataFrame, grain: list[str]
) -> DataFrame:
    """Reprocess semantics: drop the state rows whose grain appears in
    ``fresh`` (anti-join on grain), then append fresh — idempotent
    re-ingestion of a partition. Both frames must share the state schema."""
    fresh_grains = fresh.select(*grain).distinct()
    kept = state.join(F.broadcast(fresh_grains), grain, "left_anti")
    return kept.unionByName(fresh)

"""Physical-plan quality gates: pushdown, pruning, join strategy, codegen.

Correctness says WHAT came back; these tests pin HOW — the properties that
decide whether a plan survives a 100×-scale-up (SURVEY.md §4). They read
`.explain`-style output (executedPlan strings) and assert:

  - filters reach the parquet scan (PushedFilters), columns are pruned
    (ReadSchema carries only what the query projects);
  - dimension joins broadcast, fact joins never degenerate to
    CartesianProduct / BroadcastNestedLoopJoin (the only nested-loop allowed
    is the deliberate 1-row total_unique cross join);
  - hot aggregate paths run inside WholeStageCodegen.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df, execute: bool = False) -> str:
    if execute:
        # AQE materializes WholeStageCodegen spans only in the final plan
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def catalog():
    from msgvault_spark.catalog import CATALOG

    return CATALOG


def test_filter_and_projection_pushdown(spark):
    """The RAW parquet path (what a 100 TB deployment scans — whole-table
    caching is a small-corpus residency trade) must push filters and prune
    columns into the scan."""
    from pyspark.sql import functions as F

    from msgvault_spark.sources.loader import load_table

    df = (
        load_table(spark, SF_DIR, "part")
        .filter(F.col("p_name").ilike("%green%") & (F.col("p_size") > 20))
        .select("p_partkey", "p_name", "p_brand")
    )
    plan = _plan(df)
    assert "PushedFilters" in plan
    # the numeric predicate is pushable; it must reach the scan
    assert "GreaterThan(p_size,20)" in plan.replace(" ", "")
    # column pruning: the scan must not read the 9-column part table wide
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("p_retailprice", "p_comment", "p_container"):
        assert col not in read_schema


def test_dim_joins_broadcast_no_cartesian(spark, catalog):
    for name in ("agg_senders", "agg_recipients", "list_messages_by_domain"):
        plan = _plan(catalog[name].fn(spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name
        # the only nested-loop join allowed is the broadcast of the 1-row
        # total_unique aggregate
        nlj = plan.count("BroadcastNestedLoopJoin")
        assert nlj <= 1, f"{name}: {nlj} nested-loop joins"


def test_semi_and_anti_joins_stay_hash_joins(spark, catalog):
    plan = _plan(catalog["orders_semi_anti"].fn(spark, SF_DIR))
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_wide_agg_is_scan_plus_agg(spark, catalog):
    """The wide fast path must stay join-free at query time: scan the
    persisted denormalized view, hash-aggregate, sort. Any join besides the
    1-row total broadcast means the denormalization regressed."""
    plan = _plan(catalog["agg_senders_wide"].fn(spark, SF_DIR), execute=True)
    assert "InMemoryTableScan" in plan
    # judge only the query-time plan: InMemoryTableScan's printout embeds
    # the ETL build plan (whose joins are paid once, not per query)
    query_time = plan.split("InMemoryTableScan")[0]
    assert "HashAggregate" in query_time
    assert "SortMergeJoin" not in query_time
    assert "ShuffledHashJoin" not in query_time
    assert "BroadcastHashJoin" not in query_time
    # whole-stage codegen spans print as "*(n) Operator" in plan strings
    assert "*(" in query_time


def test_bm25_candidate_shape(spark, catalog):
    """BM25 must filter postings to the query terms BEFORE joining: the
    plan carries the IN-list filter and no full-corpus sort-merge join."""
    plan = _plan(catalog["bm25_documents"].fn(spark, SF_DIR))
    assert plan.count("InMemoryTableScan") >= 2  # persisted postings + stats
    assert "term#" in plan and " IN (" in plan
    assert "CartesianProduct" not in plan


def test_partition_pruning_on_cache_lake(spark, tmp_path, archive):
    """Year-partitioned lake + year filter ⇒ the scan's partition filter
    prunes; the data filter list stays empty for the partition column."""
    from pyspark.sql import functions as F

    from msgvault_spark.sources.build_cache import build_cache

    base = str(tmp_path / "lake")
    build_cache(spark, archive, base)
    df = (
        spark.read.parquet(f"{base}/messages")
        .filter(F.col("year") == 2024)
        .select("id", "size_estimate")
    )
    plan = _plan(df)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "year" in pf

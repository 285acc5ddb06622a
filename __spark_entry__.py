"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` exposes one
callable per implemented operator from SURVEY.md §2; ``oracle_sql()`` gives
the DuckDB-equivalent SQL per query (driver compares row-count + schema +
order-insensitive value-hash at sf=0.01).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from msgvault_spark.catalog import CATALOG


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the top-senders aggregate —
    the backbone join+agg of every reference view (SURVEY.md §7 phase 1)."""
    return CATALOG["agg_senders"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle_sql
        for name, spec in CATALOG.items()
        if spec.oracle_sql is not None
    }

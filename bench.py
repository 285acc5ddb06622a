"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = sum of per-query wall-clock seconds (post-warmup, best of
BENCH_RUNS=2 runs each).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1

    # single-node small-SF run: AQE's stage-replanning barriers cost
    # ~100ms/stage and optimize nothing here; a cluster-scale deployment
    # keeps the default (AQE on) — see msgvault_spark/session.py
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")

    from msgvault_spark.catalog import CATALOG
    from msgvault_spark.session import get_spark

    spark = get_spark("msgvault_bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = {n: s for n, s in CATALOG.items() if s.headline}

    # warmup: run every headline query once so one-time costs (JVM warmup,
    # parquet footers, the materialize-once archive/wide caches — the
    # reference's build-cache analog) are excluded from steady-state timing,
    # matching how the reference benchmarks a warm cache (benchmark_test.go)
    for spec in headline.values():
        spec.fn(spark, sf_dir).collect()

    times: dict[str, float] = {}
    for name, spec in headline.items():
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    out = {
        "metric": "headline_queries_total_wall_clock",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Round-12 optimization measurement harness (guide §1).

For each named catalog entry: time the computation alone against the
noop sink (warm, best of N — no driver result transfer, no plan-build
cost in the timed region) and dump `.explain("formatted")` to
plans/<tag>/<entry>_<suffix>.txt with a one-line plan-shape summary
(Exchange count, join strategies, Python-boundary nodes).

    python tools/opt_measure.py [--sf DIR] [--suffix before|after]
                                [--runs 3] [--plans-dir plans/r12]
                                entry [entry ...]

Prints one JSON line per entry: {"entry":..., "noop_s":..., "exchanges":
N, "joins": [...], "python_nodes": [...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_shape(plan: str) -> dict:
    ex = len(re.findall(r"\bExchange\b", plan)) - len(
        re.findall(r"ReusedExchange", plan)
    )
    joins = re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        plan,
    )
    py = re.findall(
        r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|"
        r"FlatMapGroupsInPandas)\b",
        plan,
    )
    return {
        "exchanges": ex,
        "reused": len(re.findall(r"ReusedExchange", plan)),
        "joins": sorted(set(joins)),
        "python_nodes": sorted(set(py)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default="plans/r12")
    ap.add_argument("--no-time", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_AQE", "false")
    os.environ.setdefault("SPARK_GRAFT_CONSTRAINTS", "false")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    os.environ.setdefault("SPARK_GRAFT_CONSOLE_PROGRESS", "false")

    from msgvault_spark.catalog import CATALOG
    from msgvault_spark.session import get_spark

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, args.plans_dir)
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("msgvault_opt_measure")
    spark.sparkContext.setLogLevel("ERROR")

    for name in args.entries:
        spec = CATALOG[name]
        spark.sparkContext.setJobDescription(f"opt_measure:{name}")
        df = spec.fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        shape = plan_shape(plan)
        out = {"entry": name, **shape}
        with open(
            os.path.join(plans_dir, f"{name}_{args.suffix}.txt"), "w"
        ) as f:
            f.write(plan)
        if not args.no_time:
            # warm once (artifact builds, codegen), then best-of-runs
            df.write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            out["noop_s"] = round(best, 4)
        print(json.dumps(out), flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()

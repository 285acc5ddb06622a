"""Baseline twin of bench.py: run the SAME headline queries' oracle SQL on
DuckDB over the same parquet — the "within 2x of DuckDB" bar from
BASELINE.md, reproducible locally. Compare its TOTAL against bench.py's
``value`` (same protocol: warmup, then best of 3).

    python tools/duck_bench.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import duckdb

    from msgvault_spark.catalog import CATALOG

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    tot = 0.0
    for name, spec in CATALOG.items():
        if not spec.headline or spec.oracle_sql is None:
            continue
        con.execute(spec.oracle_sql).fetchall()  # warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(spec.oracle_sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        tot += best
        print(f"{name:35s} {best:.3f}s")
    print(f"TOTAL {tot:.3f}s")


if __name__ == "__main__":
    main()

"""Driver-parity check: run EVERY `__spark_entry__.queries()` entry under a
VANILLA SparkSession (exactly what the external driver builds — no tuned
conf from msgvault_spark.session), collecting each result. Catches queries
that silently depend on session tuning (timezone, nanosAsLong, AQE flags).

    python tools/driver_parity.py [sf_dir]
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e

    failures = []
    ent = e.entry(spark)
    print(f"entry: {len(ent.collect())} rows, schema {len(ent.schema)} cols")
    for name, fn in e.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            n = len(df.collect())
            print(f"ok    {name}: {n} rows ({time.time() - t0:.1f}s)")
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: {type(ex).__name__}: {ex}")
            failures.append(name)
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

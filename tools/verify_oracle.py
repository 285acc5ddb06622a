"""Local stand-in for the driver's correctness gate: run every catalog query
on Spark AND its DuckDB oracle at a given sf, compare row count, column names,
and an order-insensitive value hash. Usage:

    python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb


def normalize_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver hashing precision is unknown; we self-impose 1e-9 rel tol by
        # formatting with 12 significant digits
        return f"{v:.12g}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize_cell(x) for x in v) + "]"
    return str(v)


def result_hash(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(normalize_cell(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from msgvault_spark.catalog import CATALOG
    from msgvault_spark.session import get_spark

    spark = get_spark("verify_oracle")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, spec in CATALOG.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_s = time.time() - t0
        if spec.oracle_sql is None:
            print(f"rows-only  {name}: {len(srows)} rows ({spark_s:.1f}s)")
            continue
        try:
            cur = con.execute(spec.oracle_sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_rows = len(srows) == len(orows)
        sh, oh = result_hash(scols, srows), result_hash(ocols, orows)
        ok_hash = sh == oh
        status = "OK  " if (ok_cols and ok_rows and ok_hash) else "FAIL"
        print(
            f"{status}  {name}: spark={len(srows)} oracle={len(orows)} "
            f"cols={'=' if ok_cols else 'DIFF'} hash={'=' if ok_hash else 'DIFF'} "
            f"({spark_s:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"    spark cols:  {scols}\n    oracle cols: {ocols}")
            if ok_cols and not ok_hash:
                sset = {
                    tuple(normalize_cell(v) for v in r) for r in srows
                }
                oset = {
                    tuple(normalize_cell(v) for v in r) for r in orows
                }
                # reorder oracle rows to spark column order for comparison
                omap = {c: i for i, c in enumerate(ocols)}
                oset = {
                    tuple(normalize_cell(r[omap[c]]) for c in scols) for r in orows
                }
                print(f"    spark-only:  {list(sset - oset)[:3]}")
                print(f"    oracle-only: {list(oset - sset)[:3]}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

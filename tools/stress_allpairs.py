"""Scale-stress evidence for the blocked-GEMM all-pairs path.

Synthesizes an N-vector corpus (deterministic, planted near-dup pairs),
runs ``allpairs_near_dups`` at increasing N, and prints wall-clock plus
pair counts — the O(N²) growth curve with the BLAS constant, versus the
interpreted-fold constant it replaced (67.5s at N=2000). Run standalone:

    python tools/stress_allpairs.py [N ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [2000, 8000, 20000]
    from pyspark.sql import functions as F

    from msgvault_spark.dedup.embedding import allpairs_near_dups
    from msgvault_spark.session import get_spark

    spark = get_spark("stress_allpairs")
    spark.sparkContext.setLogLevel("ERROR")
    d = 64
    for n in ns:
        # deterministic pseudo-random corpus (hash-uniform components):
        # near-dup pairs are RARE, as in a real corpus, so the wall clock
        # measures the GEMM candidate phase, not the survivor rescore.
        # ~1% planted dups: ids >= n share their base vector with id-n
        # plus a tiny deterministic perturbation.
        n_dups = n // 100
        base = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(d - 1)),
                lambda i: (
                    F.pmod(F.xxhash64(F.col("id"), i), F.lit(2001)) / 1000.0
                    - 1.0
                ).cast("float"),
            ).alias("embedding"),
        )
        dups = spark.range(n_dups).select(
            (F.col("id") + n).alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(d - 1)),
                lambda i: (
                    F.pmod(F.xxhash64(F.col("id"), i), F.lit(2001)) / 1000.0
                    - 1.0
                    + 0.001
                ).cast("float"),
            ).alias("embedding"),
        )
        base = base.unionByName(dups).persist()
        total = base.count()
        t0 = time.perf_counter()
        out = allpairs_near_dups(base, 0.6)
        pairs = out.count()
        dt = time.perf_counter() - t0
        print(
            f"N={total:>6}  pairs={pairs:>8}  wall={dt:6.2f}s  "
            f"({total * (total - 1) / 2 / 1e6:.1f}M candidate pairs)"
        )
        base.unpersist()


if __name__ == "__main__":
    main()

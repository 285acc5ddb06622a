"""Growth-curve evidence for the hot-bucket cap: capped LSH propose is
LINEAR in corpus size where the uncapped propose is QUADRATIC in the hot
cluster.

Synthesizes corpora of increasing N with a constant boilerplate share
(default 50%; every hot doc shares ONE text — the worst-case skew a
license header produces), builds the MinHash band index, and times
pairs_from_index capped vs uncapped at each N. Prints wall-clock, pair
counts, and the capped leg's dropped-pair accounting (hot_bucket_stats);
the uncapped leg is skipped past UNCAPPED_MAX_HOT docs (its pair count
grows as (hot)² and would dominate the run).

    python tools/stress_hotbuckets.py [--hot-frac 0.2] [N ...]

The r8 verdict's past-toy-scale ask: a single 10M-doc run at 20%
boilerplate —

    python tools/stress_hotbuckets.py --hot-frac 0.2 10000000

Round-10 addition: ``--planes-curve`` switches to the hyperplane-LSH
plane-count policy curve (dedup/embedding.planes_for_corpus) — for each
N it synthesizes N deterministic pseudo-random vectors, buckets them
with BOTH a fixed 8-plane signature and the policy's count, and prints
the within-bucket rescore pair totals. The policy column must stay
~flat per doc while the fixed column grows linearly per doc:

    python tools/stress_hotbuckets.py --planes-curve 1000000 3000000 10000000
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UNCAPPED_MAX_HOT = 4000  # ~8M quadratic pairs; beyond this only capped runs


def planes_curve(ns: list[int]) -> None:
    """Rescore-pair growth with a FIXED plane count vs the corpus-sized
    policy. Vectors are JVM-synthesized (hash-derived coordinates), and
    the pair totals are Σ pop_b·(pop_b−1)/2 from a bucket-count groupBy —
    the propose-stage cost, measured without running the propose."""
    from pyspark.sql import functions as F

    from msgvault_spark.dedup.embedding import (
        DEFAULT_TARGET_BUCKET_POP,
        hyperplane_signature,
        planes_for_corpus,
    )
    from msgvault_spark.session import get_spark

    spark = get_spark("stress_planes")
    spark.sparkContext.setLogLevel("ERROR")
    dim = 16
    print(
        f"target bucket pop {DEFAULT_TARGET_BUCKET_POP}; pairs = "
        f"Σ pop·(pop−1)/2 over buckets (the GEMM-propose workload)"
    )
    print(f"{'N':>9} {'p_fix':>6} {'pairs_fixed8':>14} {'per_doc':>9} "
          f"{'p_auto':>6} {'pairs_policy':>14} {'per_doc':>9} {'sec':>6}")
    for n in ns:
        vec = F.array(
            *[
                (
                    (F.pmod(F.xxhash64(F.col("id") * F.lit(k + 1)), F.lit(2001))
                     - F.lit(1000)) / F.lit(1000.0)
                )
                for k in range(dim)
            ]
        )
        docs = spark.range(n).select(F.col("id"), vec.alias("v"))
        t0 = time.perf_counter()
        out = {}
        for tag, p in (("fixed", 8), ("auto", planes_for_corpus(n))):
            pairs = (
                docs.groupBy(
                    hyperplane_signature(F.col("v"), dim, p).alias("b")
                )
                .agg(F.count(F.lit(1)).alias("pop"))
                .agg(
                    F.sum(
                        F.col("pop") * (F.col("pop") - F.lit(1)) / F.lit(2)
                    ).alias("pairs")
                )
                .collect()[0]["pairs"]
            )
            out[tag] = (p, int(pairs))
        dt = time.perf_counter() - t0
        (pf, nf), (pa, na) = out["fixed"], out["auto"]
        print(
            f"{n:9d} {pf:6d} {nf:14d} {nf / n:9.1f} "
            f"{pa:6d} {na:14d} {na / n:9.1f} {dt:6.1f}"
        )


def main() -> None:
    args = sys.argv[1:]
    if "--planes-curve" in args:
        args.remove("--planes-curve")
        planes_curve([int(a) for a in args] or [1_000_000, 3_000_000, 10_000_000])
        return
    hot_frac = 0.5
    if "--hot-frac" in args:
        i = args.index("--hot-frac")
        hot_frac = float(args[i + 1])
        del args[i:i + 2]
    ns = [int(a) for a in args] or [8_000, 16_000, 32_000, 64_000]
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    from pyspark.sql import functions as F

    from msgvault_spark.dedup.hotbuckets import hot_bucket_stats
    from msgvault_spark.dedup.minhash import (
        build_minhash_index,
        pairs_from_index,
    )
    from msgvault_spark.session import get_spark

    spark = get_spark("stress_hotbuckets")
    spark.sparkContext.setLogLevel("ERROR")

    boiler = (
        "permission is hereby granted free of charge to any person "
        "obtaining a copy of this software and associated documentation"
    )
    print(f"{'N':>9} {'hot':>8} {'capped_s':>9} {'capped_pairs':>13} "
          f"{'uncapped_s':>11} {'uncapped_pairs':>15}")
    for n in ns:
        hot = int(n * hot_frac)
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < hot, F.lit(boiler))
            .otherwise(
                F.concat(
                    F.lit("unique document number "),
                    F.col("id").cast("string"),
                    F.lit(" with words "),
                    (F.col("id") * 31).cast("string"),
                    F.lit(" "),
                    (F.col("id") * 17).cast("string"),
                )
            )
            .alias("text"),
        )
        idx = build_minhash_index(docs, "doc_id", "text").persist()
        idx.count()
        t0 = time.perf_counter()
        nc = pairs_from_index(idx, bucket_cap=256).count()
        capped_t = time.perf_counter() - t0
        if hot <= UNCAPPED_MAX_HOT:
            t0 = time.perf_counter()
            nu = pairs_from_index(idx).count()
            un_t, un_n = f"{time.perf_counter() - t0:11.2f}", f"{nu:15d}"
        else:
            un_t, un_n = f"{'skipped':>11}", f"{'~' + str(hot * (hot - 1) // 2):>15}"
        stats = hot_bucket_stats(
            idx.select("bucket", "doc_id"), 256
        ).collect()[0].asDict()
        idx.unpersist()
        print(f"{n:9d} {hot:8d} {capped_t:9.2f} {nc:13d} {un_t} {un_n}")
        print(f"          drop accounting @cap=256: {stats}")


if __name__ == "__main__":
    main()

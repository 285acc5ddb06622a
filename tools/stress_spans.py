"""Scale-stress evidence for the substring-span dedup pipeline.

Synthesizes an N-document corpus (deterministic token soup with a planted
boilerplate header in ~20% of docs, the shape real span dedup targets),
then times the two halves of the Lee-et-al pipeline at increasing N:

  - the corpus-scale ARTIFACT BUILD (tokenize → shingle → duplicate-hash
    groupBy → mark join), the part a 100 TB deployment pays at ETL; and
  - the SERVED QUERY (per-doc LAG telescope + top-N) over the persisted
    artifact, the part paid per invocation.

Prints wall-clock, total tokens, duplicated-start counts. Run standalone:

    python tools/stress_spans.py [N ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [20_000, 100_000, 400_000]
    # stress scale wants a bigger heap than the test default (the box has
    # 128 GiB; 8g is the unit-test ceiling, not a cluster statement)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    from pyspark.sql import functions as F

    from msgvault_spark.dedup.substrings import (
        duplicated_span_coverage,
        duplicated_starts,
    )
    from msgvault_spark.session import get_spark

    spark = get_spark("stress_spans")
    spark.sparkContext.setLogLevel("ERROR")
    w = 8
    header = " ".join(f"hdr{i}" for i in range(24))  # 24-token boilerplate
    for n in ns:
        # deterministic corpus: ~60 unique-ish tokens per doc from a
        # hash-derived vocab (dup shingles rare outside the header), and
        # every 5th doc carries the shared 24-token header — the
        # prefix-boilerplate shape span dedup exists to cut.
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.when(F.col("id") % 5 == 0, F.lit(header + " ")).otherwise(
                    F.lit("")
                ),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(0), F.lit(59)),
                        lambda i: F.concat(
                            F.lit("t"),
                            F.pmod(
                                F.xxhash64(F.col("id"), i), F.lit(1_000_000)
                            ).cast("string"),
                        ),
                    ),
                ),
            ).alias("text"),
        )
        t0 = time.perf_counter()
        marked = duplicated_starts(docs, "doc_id", "text", w=w)
        from pyspark import StorageLevel

        marked = marked.persist(StorageLevel.MEMORY_AND_DISK)
        n_starts = marked.count()  # materialize the ETL artifact
        t1 = time.perf_counter()
        top = duplicated_span_coverage(
            docs, "doc_id", "text", w=w, top_n=100, marked=marked
        ).collect()
        t2 = time.perf_counter()
        tokens = n * 60 + (n // 5 + (1 if n % 5 else 0)) * 24
        print(
            f"N={n:>7} tokens~{tokens:>9} dup_starts={n_starts:>8} "
            f"build={t1 - t0:6.2f}s query={t2 - t1:6.2f}s "
            f"top_covered_ppm={top[0]['covered_ppm'] if top else 0}"
        )
        marked.unpersist()


if __name__ == "__main__":
    main()

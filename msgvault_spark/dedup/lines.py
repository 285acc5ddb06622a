"""Exact segment-level dedup across the corpus — the C4 recipe (Raffel et
al. 2020, §2.2: "we discarded all but one of any three-sentence span
occurring more than once") re-expressed over token segments: every
duplicate occurrence of a segment ANYWHERE in the corpus is dropped
except the globally-first one, and documents are rewritten from their
surviving segments.

The unit is a non-overlapping ``size``-token window (the corpus is
single-line text, so sentence/newline splitting would make every document
one unit; reusing the chunker with overlap=0 gives the same family of
spans C4 uses). First occurrence = lowest (doc_id, seg_no), the stable
corpus order any engine reproduces.

Shuffle shape at 100 TB (two exchanges, both necessary):
  1. hash-partition by segment md5 for the first-occurrence window —
     segments are high-cardinality and well distributed; the known hazard
     is a boilerplate segment duplicated millions of times putting one
     key on one reducer. Mitigation when that bites: pre-aggregate
     (segment → min occurrence) with partial map-side combine instead of
     the row_number window — same result, combiner absorbs the skew. We
     use min_by aggregation for exactly this reason.
  2. re-shuffle survivors by doc_id to reassemble documents (sort_array
     over collected (seg_no, text) structs — per-doc arrays are bounded
     by document length).

Reference parity: extends dedup family D1-D6 (dedup/exact.py operates at
message granularity; this operates within-document at span granularity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from msgvault_spark.operators.chunking import chunk_documents


def dedup_exact_segments(
    docs: DataFrame,
    *,
    size: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_kept, n_dropped, dedup_text): documents rewritten with
    every non-first duplicate segment removed.

    First-occurrence selection is a groupBy(segment) min_by aggregation
    (partial aggregation absorbs duplicate-heavy segments map-side),
    joined back to occurrences — NOT a row_number window, which would
    move every occurrence of a hot segment to one reducer."""
    segs = chunk_documents(
        docs, size=size, overlap=0, id_col=id_col, text_col=text_col
    ).select(
        "doc_id",
        F.col("chunk_id").alias("seg_no"),
        F.col("chunk_text").alias("seg"),
    )
    # globally-first occurrence per segment: min (doc_id, seg_no) pair,
    # encoded as one sortable long pair via struct min
    firsts = segs.groupBy("seg").agg(
        F.min(F.struct("doc_id", "seg_no")).alias("first_occ")
    )
    kept_flag = (
        (F.col("doc_id") == F.col("first_occ.doc_id"))
        & (F.col("seg_no") == F.col("first_occ.seg_no"))
    )
    marked = segs.join(firsts, "seg").withColumn("kept", kept_flag)
    return (
        marked.groupBy("doc_id")
        .agg(
            F.sum(F.col("kept").cast("int")).cast("int").alias("n_kept"),
            F.sum((~F.col("kept")).cast("int")).cast("int").alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept"), F.struct("seg_no", "seg")
                            )
                        )
                    ),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("dedup_text"),
        )
    )


def dedup_segments_oracle_sql(*, size: int = 8, table: str = "documents") -> str:
    """DuckDB replica: same segmentation (chunk oracle with overlap=0),
    min-(doc_id, seg_no) first-occurrence, ordered string_agg rebuild."""
    from msgvault_spark.operators.chunking import chunk_oracle_sql

    segs = chunk_oracle_sql(size=size, overlap=0, table=table).strip()
    return f"""
WITH segs AS (
    SELECT doc_id, chunk_id AS seg_no, chunk_text AS seg
    FROM ({segs})
),
firsts AS (
    -- lexicographic (doc_id, seg_no) first occurrence — a combined
    -- integer key (doc_id*C + seg_no) flips order once seg_no crosses C
    SELECT seg, doc_id AS f_doc, seg_no AS f_seg FROM (
        SELECT seg, doc_id, seg_no,
               ROW_NUMBER() OVER (
                   PARTITION BY seg ORDER BY doc_id, seg_no
               ) AS rn
        FROM segs
    ) WHERE rn = 1
),
marked AS (
    SELECT s.doc_id, s.seg_no, s.seg,
           (s.doc_id = f.f_doc AND s.seg_no = f.f_seg) AS kept
    FROM segs s JOIN firsts f ON f.seg = s.seg
)
SELECT doc_id,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS INT) AS n_kept,
       CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS INT) AS n_dropped,
       COALESCE(string_agg(CASE WHEN kept THEN seg END, ' '
                           ORDER BY seg_no), '') AS dedup_text
FROM marked
GROUP BY doc_id
"""

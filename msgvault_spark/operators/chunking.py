"""Fixed-window document chunking with overlap — the standard prep step
that turns variable-length documents into training-window-sized pieces
(the sibling of operators/packing.py, which packs the OTHER direction:
short docs into full bins).

Semantics: whitespace-tokenize, emit windows of ``size`` tokens starting
every ``stride = size - overlap`` tokens; the final window is allowed to
be short so every token lands in at least one chunk (and at most
⌈size/stride⌉ chunks). Documents with no tokens emit nothing.

Number of chunks for n tokens: 1 + ⌈max(n - size, 0) / stride⌉, computed
with integer arithmetic (no float ceil) so Spark and DuckDB agree exactly.

Spark shape: tokenize → bind the token array to a column (never close a
higher-order lambda over the split expression — it re-evaluates per
element) → explode a 0..n_chunks-1 sequence → slice. Pure map + explode:
no shuffle, no UDF; Catalyst pushes any downstream chunk filter into the
scan. At 100 TB this is the one operator you want exactly this shape —
the row multiplication happens after column pruning (only doc_id + text
are read) and fans out in place on each executor.

Reference parity: the reference has no chunker (its unit is the message);
this is part of the LLM-pipeline extension surface, like packing/dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokenize_ws(text: Column) -> Column:
    """Whitespace tokens with empties dropped — identical in DuckDB as
    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def chunk_documents(
    docs: DataFrame,
    *,
    size: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text) — one row per window."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap}/{size}")
    stride = size - overlap
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize_ws(F.col(text_col)).alias("toks")
    )
    sized = toks.select(
        "doc_id",
        "toks",
        F.size("toks").alias("n"),
    ).filter(F.col("n") > 0)
    # integer ceil: 1 + (max(n - size, 0) + stride - 1) DIV stride
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(F.col("n") - size, F.lit(0)) + (stride - 1)) / stride
    ).cast("int")
    exploded = sized.select(
        "doc_id",
        "toks",
        "n",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(F.col("toks"), F.col("chunk_id") * stride + 1, F.lit(size))
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def chunk_oracle_sql(
    *, size: int = 64, overlap: int = 16, table: str = "documents"
) -> str:
    """DuckDB replica: same tokenizer, same integer chunk-count formula,
    list_slice with inclusive end."""
    stride = size - overlap
    return f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(trim(text), '\\s+'),
                       x -> x <> '') AS t
    FROM {table}
),
sized AS (
    SELECT doc_id, t, len(t) AS n,
           1 + (greatest(n - {size}, 0) + {stride - 1}) // {stride} AS n_chunks
    FROM toks WHERE len(t) > 0
),
exploded AS (
    SELECT doc_id, t, n,
           unnest(range(0, n_chunks)) AS chunk_id
    FROM sized
)
SELECT doc_id,
       CAST(chunk_id AS INT) AS chunk_id,
       CAST(len(list_slice(t, chunk_id * {stride} + 1,
                           chunk_id * {stride} + {size})) AS INT) AS n_tokens,
       array_to_string(list_slice(t, chunk_id * {stride} + 1,
                                  chunk_id * {stride} + {size}), ' ')
           AS chunk_text
FROM exploded
"""

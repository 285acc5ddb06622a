"""Per-group score calibration: z-normalize quality scores within each
language (or source) group so thresholds are comparable across groups —
the standard fix for language-biased quality filters (a 0.7 in German prose
is not a 0.7 in English).

Two implementations, equivalence-tested against each other:

  - ``calibrate_expr``: JVM window functions (avg/stddev over the group) —
    the production path; one shuffle on the group key, whole-stage codegen.
  - ``calibrate_pandas``: grouped ``applyInPandas`` — the §2.12 surface
    member for group→frame Python logic. Same math via pandas; exists for
    the cases where calibration is genuinely imperative (sklearn scalers,
    isotonic regression, per-group model inference). Arrow-batched, one
    group per call — groups must fit in worker memory (languages do;
    user-level groups at 100 TB may not: pre-aggregate or window instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def calibrate_expr(
    df: DataFrame, group_col: str, score_col: str, *, out_col: str = "z"
) -> DataFrame:
    """JVM path: (score - group mean) / group stddev_samp; singleton or
    zero-variance groups get z = 0.0."""
    w = Window.partitionBy(group_col)
    mu = F.avg(score_col).over(w)
    sd = F.stddev_samp(score_col).over(w)
    return df.withColumn(
        out_col,
        F.when(
            sd.isNull() | (sd == 0), F.lit(0.0)
        ).otherwise((F.col(score_col) - mu) / sd),
    )


def calibrate_pandas(
    df: DataFrame, group_col: str, score_col: str, *, out_col: str = "z"
) -> DataFrame:
    """applyInPandas path: identical semantics, pandas per group."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    # NOT df.schema.add(...): StructType.add mutates in place, and df.schema
    # hands back the frame's live schema object — mutating it corrupts df
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def zscore(pdf):
        s = pdf[score_col]
        sd = s.std(ddof=1)
        if sd and sd == sd and sd > 0:  # not None/NaN/0
            pdf[out_col] = (s - s.mean()) / sd
        else:
            pdf[out_col] = 0.0
        return pdf

    return df.groupBy(group_col).applyInPandas(zscore, schema=schema)

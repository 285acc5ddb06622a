"""DSIR-style data selection via hashed n-gram importance resampling.

Published method (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling"): hash n-gram features into K buckets, fit bag-of-
words distributions for a small TARGET corpus (the domain you want more
of) and the RAW corpus, weight every raw document by its log-likelihood
ratio under the two models, and resample by weight. The reference engine
(wesm/msgvault) has no counterpart — this is part of the LLM-training-
data extension surface, like dedup/ and textstats/.

Spark-first shape (designed for 100 TB):
  1. features: the ETL-time inverted-index postings (doc_id, term, tf)
     from sources/cache.get_text_index — no raw-text re-tokenization per
     run (the paper hashes uni+bigrams; unigram features here reuse the
     postings artifact, and a bigram extension is the same map over
     2-shingles);
  2. bucket: term → md5-hex6 → integer mod K. md5 is the repo's portable
     hash (dedup/minhash.py) so the DuckDB oracle reproduces buckets
     bit-for-bit;
  3. distributions: ONE groupBy(bucket) pass each for raw and target
     counts — K-row results with map-side partial aggregation absorbing
     all skew; at 100 TB the (bucket, llr) table is an ETL artifact
     rebuilt only when the target corpus changes;
  4. per-bucket log-likelihood ratio with add-one smoothing as a
     FIXED-POINT integer (floor(x·1e6 + 0.5), the unigram_quality_docs
     precedent): the ln() argument is a ratio of exactly-representable
     integer products, so both engines feed ln the identical double and
     the per-doc SUM of integer contributions is order-free;
  5. document weight: postings join the broadcast K-row llr table, one
     groupBy(doc_id) — a single shuffle over the corpus keyed by doc_id;
  6. selection: top-N by (weight desc, doc_id asc) — deterministic rank
     selection (the paper adds Gumbel noise for sampling-without-
     replacement; omitted here so reruns and the oracle agree, and noted
     because the ranking pass is the distributed work either way).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: Column, n_buckets: int) -> Column:
    """Portable feature hash: md5-hex6 integer (functions/portable.py —
    the one shared to-long form) mod K; plain % suffices because the hash
    is non-negative by construction."""
    from msgvault_spark.functions.portable import md5_hex6_long

    return (md5_hex6_long(col) % F.lit(n_buckets)).alias("b")


def bucket_llr(
    feat: DataFrame,
    target_ids: DataFrame,
    *,
    n_buckets: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """(b, llr_micro): per-bucket fixed-point log-likelihood ratio
    ln(p_target(b) / p_raw(b)) with add-one smoothing.

    ``feat`` is (doc_id, b, tf); ``target_ids`` is the (small) set of
    target document ids. Counts are exact BIGINTs; the ratio is formed as
    (nt+1)(R+K) / (nr+1)(T+K) — two exact integer products divided once
    in double (IEEE division is exactly rounded, so both engines see the
    identical argument) — then ln, scaled to micro, floor(x+0.5)."""
    tgt_feat = feat.join(target_ids, id_col, "left_semi")
    raw = feat.groupBy("b").agg(F.sum("tf").cast("long").alias("nr"))
    tgt = tgt_feat.groupBy("b").agg(F.sum("tf").cast("long").alias("nt"))
    # an empty (or token-less) target set must yield t=0, not NULL — the
    # oracle's COALESCE(SUM(nt), 0); without it every LLR and every
    # importance weight silently degrades to NULL
    tot = raw.agg(F.sum("nr").cast("long").alias("r")).crossJoin(
        tgt.agg(
            F.coalesce(F.sum("nt").cast("long"), F.lit(0).cast("long")).alias(
                "t"
            )
        )
    )
    k = F.lit(n_buckets).cast("long")
    return (
        raw.join(tgt, "b", "left")
        .join(F.broadcast(tot))
        .select(
            "b",
            F.floor(
                F.log(
                    (
                        (F.coalesce(F.col("nt"), F.lit(0)) + 1) * (F.col("r") + k)
                    ).cast("double")
                    / ((F.col("nr") + 1) * (F.col("t") + k)).cast("double")
                )
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("llr_micro"),
        )
    )


def importance_weights(
    feat: DataFrame, llr: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_grams, weight_micro): per-document importance weight —
    the tf-weighted sum of its buckets' fixed-point LLRs. The llr side is
    K rows → broadcast; the only corpus-scale shuffle is the final
    groupBy(doc_id), and integer summands keep it order-free."""
    return (
        feat.join(F.broadcast(llr), "b")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_grams"),
            F.sum(F.col("tf") * F.col("llr_micro")).cast("long").alias(
                "weight_micro"
            ),
        )
    )


def dsir_select(
    postings: DataFrame,
    target_ids: DataFrame,
    *,
    n_buckets: int = 256,
    top_n: int = 100,
    id_col: str = "doc_id",
    term_col: str = "term",
) -> DataFrame:
    """End-to-end DSIR selection over an inverted-index postings table:
    returns the top-N (doc_id, n_grams, weight_micro) by importance
    weight, ties broken by doc_id — the documents most target-like under
    the hashed bag-of-words models."""
    feat = postings.select(
        F.col(id_col),
        hash_bucket(F.col(term_col), n_buckets),
        F.col("tf"),
    )
    llr = bucket_llr(feat, target_ids, n_buckets=n_buckets, id_col=id_col)
    w = importance_weights(feat, llr, id_col=id_col)
    return w.orderBy(
        F.col("weight_micro").desc(), F.col(id_col).asc()
    ).limit(top_n)


def dsir_oracle_sql(
    *,
    docs_sql: str = "SELECT doc_id, text FROM documents",
    target_pred: str = "source = 'src0'",
    n_buckets: int = 256,
    top_n: int = 100,
    token_re: str = "[^a-z0-9]+",
) -> str:
    """DuckDB twin: identical tokenization (the inverted index's regex),
    identical md5-hex6 bucketing, identical exact-integer-ratio →
    double-division → ln → fixed-point arithmetic."""
    from msgvault_spark.functions.portable import MD5_HEX6_SQL

    h = MD5_HEX6_SQL.format(x="term")
    return f"""
WITH tokens AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(COALESCE(text, '')),
                  '{token_re}')) AS term
    FROM ({docs_sql})
),
postings AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM tokens
    WHERE term != '' GROUP BY 1, 2
),
feat AS (
    SELECT doc_id,
           {h} % {n_buckets} AS b,
           tf
    FROM postings
),
raw AS (SELECT b, CAST(SUM(tf) AS BIGINT) AS nr FROM feat GROUP BY 1),
tgt AS (
    SELECT f.b, CAST(SUM(f.tf) AS BIGINT) AS nt
    FROM feat f
    WHERE f.doc_id IN (SELECT doc_id FROM documents WHERE {target_pred})
    GROUP BY 1
),
tot AS (
    SELECT (SELECT CAST(SUM(nr) AS BIGINT) FROM raw) AS r,
           (SELECT CAST(COALESCE(SUM(nt), 0) AS BIGINT) FROM tgt) AS t
),
llr AS (
    SELECT raw.b,
           CAST(floor(ln(
               CAST((COALESCE(tgt.nt, 0) + 1) * (tot.r + {n_buckets})
                    AS DOUBLE)
               / CAST((raw.nr + 1) * (tot.t + {n_buckets}) AS DOUBLE)
           ) * 1000000 + 0.5) AS BIGINT) AS llr_micro
    FROM raw LEFT JOIN tgt ON tgt.b = raw.b CROSS JOIN tot
),
w AS (
    SELECT f.doc_id,
           CAST(SUM(f.tf) AS BIGINT) AS n_grams,
           CAST(SUM(f.tf * l.llr_micro) AS BIGINT) AS weight_micro
    FROM feat f JOIN llr l ON l.b = f.b
    GROUP BY 1
)
SELECT doc_id, n_grams, weight_micro
FROM w
ORDER BY weight_micro DESC, doc_id ASC
LIMIT {top_n}
"""


def source_divergence_matrix(
    postings: DataFrame,
    doc_sources: DataFrame,
    *,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    term_col: str = "term",
) -> DataFrame:
    """(source_a, source_b, jsd_nano): Jensen–Shannon divergence between
    every source pair's hashed unigram distribution — the mixture-design
    diagnostic next to DSIR (how far apart are my sources? which are
    near-duplicates of each other distribution-wise? which add diversity
    to the mix?). Same hashed-feature machinery as dsir_select, with
    add-one smoothing over a DENSE source × bucket grid (unobserved
    buckets still carry probability mass, and two sources of different
    size disagree there).

    Engine-exact numerics: probabilities are single exactly-rounded
    divisions of exact integers; each bucket's JSD contribution is
    fixed-point nano (floor(x·1e9 + 0.5)) so the per-pair sum is
    order-free. ln() follows the unigram_quality_docs precedent.

    Scale shape: ONE corpus-scale groupBy((source, bucket)) with map-side
    combine; everything after runs on the S·K-row distribution table
    (S sources × K buckets — sketch-sized however big the corpus), and
    the pair join is bucket-keyed over that tiny table. At 100 TB the
    distribution table is an ETL artifact refreshed with the corpus."""
    spark = postings.sparkSession
    feat = postings.select(
        F.col(id_col),
        hash_bucket(F.col(term_col), n_buckets),
        F.col("tf"),
    )
    cnt = (
        feat.join(doc_sources, id_col)
        .groupBy("source", "b")
        .agg(F.sum("tf").cast("long").alias("n"))
    )
    tot = cnt.groupBy("source").agg(F.sum("n").cast("long").alias("t"))
    buckets = spark.range(n_buckets).select(F.col("id").alias("b"))
    k = F.lit(n_buckets).cast("long")
    # everything below cnt runs on S·K-row tables (bounded by sources ×
    # buckets regardless of corpus size), so the dense-grid decoration and
    # the pair join broadcast legitimately — no shuffle after the corpus agg
    p = (
        tot.crossJoin(F.broadcast(buckets))
        .join(F.broadcast(cnt), ["source", "b"], "left")
        .select(
            "source",
            "b",
            (
                (F.coalesce(F.col("n"), F.lit(0)) + 1).cast("double")
                / (F.col("t") + k)
            ).alias("p"),
        )
    )
    a = p.select(
        F.col("source").alias("source_a"), "b", F.col("p").alias("pa")
    )
    bb = F.broadcast(
        p.select(
            F.col("source").alias("source_b"),
            F.col("b").alias("b2"),
            F.col("p").alias("pb"),
        )
    )
    pa, pb = F.col("pa"), F.col("pb")
    m = (pa + pb) / F.lit(2)
    contrib = F.floor(
        (
            F.lit(0.5) * pa * F.log(pa / m)
            + F.lit(0.5) * pb * F.log(pb / m)
        )
        * F.lit(1000000000)
        + F.lit(0.5)
    ).cast("long")
    return (
        a.join(
            bb,
            (F.col("b") == F.col("b2"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .select("source_a", "source_b", contrib.alias("c"))
        .groupBy("source_a", "source_b")
        .agg(F.sum("c").cast("long").alias("jsd_nano"))
    )


def source_divergence_oracle_sql(
    *,
    n_buckets: int = 256,
    token_re: str = "[^a-z0-9]+",
) -> str:
    """DuckDB twin of source_divergence_matrix: identical tokenization,
    md5-hex6 bucketing, dense grid, smoothing, and fixed-point JSD."""
    from msgvault_spark.functions.portable import MD5_HEX6_SQL

    h = MD5_HEX6_SQL.format(x="term")
    return f"""
WITH tokens AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(COALESCE(text, '')),
                  '{token_re}')) AS term
    FROM documents
),
postings AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM tokens
    WHERE term != '' GROUP BY 1, 2
),
feat AS (
    SELECT doc_id,
           {h} % {n_buckets} AS b,
           tf
    FROM postings
),
cnt AS (
    SELECT d.source, f.b, CAST(SUM(f.tf) AS BIGINT) AS n
    FROM feat f JOIN documents d USING (doc_id)
    GROUP BY 1, 2
),
tot AS (SELECT source, CAST(SUM(n) AS BIGINT) AS t FROM cnt GROUP BY 1),
p AS (
    SELECT s.source, g.b,
           CAST(COALESCE(c.n, 0) + 1 AS DOUBLE) / (s.t + {n_buckets}) AS p
    FROM tot s
    CROSS JOIN range({n_buckets}) g(b)
    LEFT JOIN cnt c ON c.source = s.source AND c.b = g.b
),
pairs AS (
    SELECT a.source AS source_a, b2.source AS source_b,
           CAST(floor((0.5 * a.p * ln(a.p / ((a.p + b2.p) / 2))
                       + 0.5 * b2.p * ln(b2.p / ((a.p + b2.p) / 2)))
                      * 1000000000 + 0.5) AS BIGINT) AS c
    FROM p a JOIN p b2 ON a.b = b2.b AND a.source < b2.source
)
SELECT source_a, source_b, CAST(SUM(c) AS BIGINT) AS jsd_nano
FROM pairs
GROUP BY 1, 2
ORDER BY source_a, source_b
"""

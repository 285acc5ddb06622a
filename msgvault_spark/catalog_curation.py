"""Catalog entries: round-6 training-data curation additions — DSIR-style
importance resampling, padded-batch length bucketing, and corpus n-gram
diversity. Registered on import by catalog.py.

These extend the LLM-data-pipeline surface (catalog_llmops.py,
catalog_dedup.py): selection by target-domain likelihood ratio, batch-
shape economics, and per-source repetitiveness — the curation questions a
100 TB pretraining corpus asks after dedup and quality filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from msgvault_spark.catalog import register
from msgvault_spark.sources.cache import get_table as load_table

_DSIR_BUCKETS = 256
_DSIR_TOP_N = 100
_DSIR_TARGET_PRED = "source = 'src0'"


def _dsir_oracle() -> str:
    from msgvault_spark.operators.dsir import dsir_oracle_sql

    return dsir_oracle_sql(
        target_pred=_DSIR_TARGET_PRED,
        n_buckets=_DSIR_BUCKETS,
        top_n=_DSIR_TOP_N,
    )


@register("dsir_importance_select", _dsir_oracle())
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): weight every document by
    its log-likelihood ratio between hashed bag-of-words models of a
    TARGET domain (source 'src0' standing in for the wanted domain) and
    the RAW corpus; keep the top-N most target-like. Features come from
    the ETL-time inverted-index postings (no re-tokenization); buckets
    use the portable md5-hex6 hash; per-bucket LLRs are fixed-point
    integers so the per-doc sum is order-free and engine-exact
    (operators/dsir.py has the 100 TB shape: K-row distributions with
    map-side combine, broadcast LLR table, one doc-keyed shuffle)."""
    from msgvault_spark.operators.dsir import dsir_select
    from msgvault_spark.sources.cache import get_text_index

    postings, _stats = get_text_index(
        spark, sf_dir, "documents", "doc_id", "text"
    )
    target_ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.expr(_DSIR_TARGET_PRED))
        .select("doc_id")
    )
    return dsir_select(
        postings,
        target_ids,
        n_buckets=_DSIR_BUCKETS,
        top_n=_DSIR_TOP_N,
    )


_TOKENS_SQL = (
    "SELECT doc_id, len(list_filter(string_split_regex(lower(COALESCE("
    "text, '')), '[^a-z0-9]+'), w -> w != '')) AS n_tokens FROM documents"
)


def _length_bucket_oracle() -> str:
    from msgvault_spark.operators.packing import length_bucket_oracle_sql

    return length_bucket_oracle_sql(_TOKENS_SQL)


@register("length_bucket_report", _length_bucket_oracle())
def length_bucket_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padded-batch economics: bucket documents by token length, assign
    hash-derived batches of ≤16, and report per bucket how many tokens a
    pad-to-batch-max serving stack would burn (waste_ppm). The packing
    complement of pack_training_sequences — answers "is length bucketing
    tight enough before paying for a sort?" with no per-bucket sort or
    window anywhere (operators/packing.py:length_bucket_report)."""
    from msgvault_spark.operators.packing import (
        length_bucket_report as _report,
    )
    from msgvault_spark.sources.cache import get_text_index

    from msgvault_spark.operators.present import present_sorted

    _postings, stats = get_text_index(
        spark, sf_dir, "documents", "doc_id", "text"
    )
    # the stats artifact only has rows for docs with ≥1 token; the report
    # (like its oracle) must count token-less docs in bucket 0, so anchor
    # on the documents table and coalesce the artifact's dl to 0
    lengths = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .join(stats, "doc_id", "left")
        .select("doc_id", F.coalesce(F.col("dl"), F.lit(0)).alias("dl"))
    )
    return _report(lengths, "doc_id", "dl").transform(
        present_sorted, "bucket"
    )


@register(
    "ngram_diversity_by_source",
    """
WITH m AS (
    SELECT source,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x != '') AS w
    FROM documents
),
g AS (
    SELECT source,
           CASE WHEN len(w) >= 3
                THEN list_transform(
                     generate_series(1, len(w) - 2),
                     i -> list_aggregate(w[i:i+2], 'string_agg', ' '))
                WHEN len(w) >= 1
                THEN [list_aggregate(w, 'string_agg', ' ')]
                ELSE []
           END AS grams
    FROM m
),
e AS (SELECT source, unnest(grams) AS gram FROM g)
SELECT source AS grp,
       CAST(COUNT(*) AS BIGINT) AS total_ngrams,
       CAST(COUNT(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
       (CAST(COUNT(DISTINCT gram) AS BIGINT) * 1000000)
           // CAST(COUNT(*) AS BIGINT) AS diversity_ppm
FROM e
GROUP BY 1
ORDER BY grp
""",
)
def ngram_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram type-token ratio per source: the corpus-level
    diversity diagnostic (low = templated/self-repetitive source; the
    per-corpus complement of the per-document Gopher repetition
    filters). Exact COUNT(DISTINCT) here as the oracle-checkable
    baseline; the 100 TB note in textstats/analysis.py swaps it for the
    per-source KMV sketch artifact."""
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.textstats.analysis import ngram_diversity_by_group

    docs = load_table(spark, sf_dir, "documents")
    return ngram_diversity_by_group(docs, "source", "text", n=3).transform(
        present_sorted, "grp"
    )


# ---------------------------------------------------------------------------
# batch 2: hard negatives, relative quality threshold, cluster-balanced
# sampling
# ---------------------------------------------------------------------------

_HN_NQ = 20  # query set: vec_id < 20 (the batch-KNN eval-seed convention)
_HN_K = 5


def _hard_negative_oracle() -> str:
    from msgvault_spark.similarity.ivf import _cos_sql

    cos = _cos_sql("e.embedding", "q.qv")
    return f"""
WITH q AS (
    SELECT vec_id AS qid, embedding AS qv, label AS ql
    FROM embeddings WHERE vec_id < {_HN_NQ}
)
SELECT qid, id, score FROM (
    SELECT q.qid, e.vec_id AS id, {cos} AS score,
           ROW_NUMBER() OVER (
               PARTITION BY q.qid ORDER BY {cos} DESC, e.vec_id ASC
           ) AS rn
    FROM embeddings e JOIN q ON e.vec_id != q.qid AND e.label != q.ql
) WHERE rn <= {_HN_K}
"""


@register("hard_negative_mining", _hard_negative_oracle())
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive embedding training: for each
    of the 20 lowest-id vectors, the 5 nearest neighbors with a DIFFERENT
    label — the confusable wrong-class examples a triplet/InfoNCE loss
    wants. Broadcast query set, label mismatch inside the join condition,
    two-level top-k (no corpus-sized window partition;
    similarity/knnjoin.py:hard_negative_join)."""
    from msgvault_spark.similarity.knnjoin import hard_negative_join

    emb = load_table(spark, sf_dir, "embeddings")
    return hard_negative_join(
        emb, emb.filter(F.col("vec_id") < _HN_NQ), k=_HN_K
    )


_UNIGRAM_SCORES_SQL = """
tokens AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(COALESCE(text, '')),
                  '[^a-z0-9]+')) AS term
    FROM documents
),
tc AS (SELECT doc_id, term FROM tokens WHERE term != ''),
postings AS (SELECT doc_id, term, COUNT(*) AS tf FROM tc GROUP BY 1, 2),
ctf AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS ctf FROM postings GROUP BY 1),
tot AS (SELECT CAST(SUM(ctf) AS BIGINT) AS t FROM ctf),
contrib AS (
    SELECT p.doc_id, p.tf,
           CAST(floor(p.tf * ln(CAST(tot.t AS DOUBLE) / c.ctf) * 1000000
                      + 0.5) AS BIGINT) AS cs
    FROM postings p JOIN ctf c ON c.term = p.term CROSS JOIN tot
),
scores AS (
    SELECT doc_id,
           CAST(SUM(cs) AS BIGINT) // CAST(SUM(tf) AS BIGINT) AS nll_micro
    FROM contrib GROUP BY doc_id
)"""


@register(
    "quality_median_filter",
    f"""
WITH {_UNIGRAM_SCORES_SQL},
sc AS (
    SELECT s.doc_id, d.source, s.nll_micro
    FROM scores s JOIN documents d USING (doc_id)
),
med AS (
    SELECT source,
           CAST(2 * quantile_cont(nll_micro, 0.5) AS BIGINT) AS median_x2
    FROM sc GROUP BY 1
)
SELECT sc.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (2 * sc.nll_micro < m.median_x2) AS BIGINT)
           AS n_kept,
       m.median_x2
FROM sc JOIN med m USING (source)
GROUP BY sc.source, m.median_x2
ORDER BY sc.source
""",
)
def quality_median_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative quality thresholding: keep each source's below-median half
    by unigram-LM negative log-likelihood (low = typical text; the weird
    tail is dropped PER SOURCE, so a noisy source cannot starve a clean
    one — the relative-filter rule real curation pipelines use instead of
    one global cutoff). Exact per-source median via percentile (doubled
    into an exact integer — the median of BIGINTs is integral or .5 — so
    the keep test is pure integer comparison). At 100 TB exact per-group
    percentile buffers each group's values; swap for the mergeable
    histogram-quantile sketch artifact (operators/histsketch.py) — the
    report shape and the broadcast-threshold join are unchanged."""
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.textstats.analysis import nll_scores_artifact

    sc = nll_scores_artifact(spark, sf_dir).join(
        load_table(spark, sf_dir, "documents").select("doc_id", "source"),
        "doc_id",
    )
    med = sc.groupBy("source").agg(
        (F.percentile("nll_micro", F.lit(0.5)) * 2)
        .cast("long")
        .alias("median_x2")
    )
    return (
        sc.join(F.broadcast(med), "source")
        .groupBy("source", "median_x2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(
                    F.col("nll_micro") * 2 < F.col("median_x2"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_kept"),
        )
        .select("source", "n_docs", "n_kept", "median_x2")
        .transform(present_sorted, "source")
    )


_CBS_QUOTA = 40
_CBS_CELLS = 8
_CBS_HASH = "((vec_id % 2147483647) * 1327217885) % 2147483647"


def _cluster_sample_oracle() -> str:
    from msgvault_spark.similarity.ivf import _cos_sql

    return f"""
WITH cents AS (
    SELECT vec_id AS cid, embedding AS cvec FROM embeddings
    WHERE vec_id < {_CBS_CELLS}
),
assigned AS (
    SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_cos_sql('e.embedding', 'c.cvec')} DESC,
                            c.cid ASC
               ) AS rn
        FROM embeddings e CROSS JOIN cents c
    ) WHERE rn = 1
),
ranked AS (
    SELECT cid, vec_id,
           ROW_NUMBER() OVER (
               PARTITION BY cid
               ORDER BY {_CBS_HASH} ASC, vec_id ASC
           ) AS rn
    FROM assigned
)
SELECT cid AS cell, vec_id FROM ranked WHERE rn <= {_CBS_QUOTA}
ORDER BY cell, vec_id
"""


@register("cluster_balanced_sample", _cluster_sample_oracle())
def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced subset selection: at most 40 vectors per IVF cell,
    chosen by deterministic hash order — the embedding-space analog of
    per-language quotas (over-represented clusters are capped, small ones
    kept whole; the diversity-preserving downsample a pretraining corpus
    wants after dedup). Rides the persisted IVF assignment artifact and
    the BOUNDED two-level bottom-k sampler
    (operators/sampling.py:bounded_stratified_sample) — a hot cell fans
    across 32 salt buckets; no per-cell sort window exists."""
    from msgvault_spark.catalog_search import get_ivf_index
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.operators.sampling import bounded_stratified_sample

    index = get_ivf_index(spark, sf_dir, _CBS_CELLS).select(
        F.col("cell"), F.col("id").alias("vec_id")
    )
    return bounded_stratified_sample(
        index, ["cell"], "vec_id", _CBS_QUOTA
    ).transform(present_sorted, "cell", "vec_id")


def _source_divergence_oracle() -> str:
    from msgvault_spark.operators.dsir import source_divergence_oracle_sql

    return source_divergence_oracle_sql(n_buckets=_DSIR_BUCKETS)


@register("source_divergence_matrix", _source_divergence_oracle())
def source_divergence_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen–Shannon divergence between sources' hashed unigram
    distributions — the mixture-design companion to weighted/temperature
    mixing and the KMV overlap sketch: overlap says how much two sources
    SHARE, divergence says how differently they SPEAK. One corpus-scale
    (source, bucket) aggregate; all pair math runs on the S·K-row
    distribution table (operators/dsir.py:source_divergence_matrix)."""
    from msgvault_spark.operators.dsir import (
        source_divergence_matrix as _jsd,
    )
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.sources.cache import get_text_index

    postings, _stats = get_text_index(
        spark, sf_dir, "documents", "doc_id", "text"
    )
    sources = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    return _jsd(postings, sources, n_buckets=_DSIR_BUCKETS).transform(
        present_sorted, "source_a", "source_b"
    )


_BPE_RE = r"[a-z]{1,6}|[0-9]|[^a-z0-9\s]"


@register(
    "token_fertility_report",
    rf"""
WITH f AS (
    SELECT lang, source,
           length(text) AS n_chars,
           len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x != '')) AS n_words,
           len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS n_bpe
    FROM documents
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars,
       CAST(SUM(n_words) AS BIGINT) AS words,
       CAST(SUM(n_bpe) AS BIGINT) AS bpe_tokens,
       CAST(SUM(n_chars) * 1000 AS BIGINT) // CAST(SUM(n_bpe) AS BIGINT)
           AS chars_per_bpe_milli,
       CAST(SUM(n_bpe) * 1000 AS BIGINT) // CAST(SUM(n_words) AS BIGINT)
           AS bpe_per_word_milli
FROM f
GROUP BY 1, 2
ORDER BY lang, source
""",
)
def token_fertility_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility report per (lang, source): chars per BPE-ish
    token and BPE tokens per word — the budgeting numbers a multilingual
    token-budget plan needs (languages tokenize at very different rates;
    charging sources by document count silently over-weights verbose
    scripts). Pure map + one grouped aggregate, integer milli ratios.
    The BPE-ish proxy is textstats.token_count_bpe_ish's portable
    Java∩RE2 pattern."""
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.textstats.analysis import (
        token_count_bpe_ish,
        words,
    )

    docs = load_table(spark, sf_dir, "documents")
    f = docs.select(
        "lang",
        "source",
        F.length("text").cast("long").alias("n_chars"),
        F.size(words(F.col("text"))).cast("long").alias("n_words"),
        token_count_bpe_ish(F.col("text")).cast("long").alias("n_bpe"),
    )
    return (
        f.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars"),
            F.sum("n_words").cast("long").alias("words"),
            F.sum("n_bpe").cast("long").alias("bpe_tokens"),
        )
        .withColumn(
            "chars_per_bpe_milli",
            F.expr("CAST(chars * 1000 AS BIGINT) div bpe_tokens"),
        )
        .withColumn(
            "bpe_per_word_milli",
            F.expr("CAST(bpe_tokens * 1000 AS BIGINT) div words"),
        )
        .transform(present_sorted, "lang", "source")
    )


_DECILES = [i / 10.0 for i in range(1, 10)]


@register(
    "curriculum_decile_plan",
    f"""
WITH {_UNIGRAM_SCORES_SQL},
cuts AS (
    SELECT quantile_cont(nll_micro, {_DECILES}) AS cs FROM scores
),
phased AS (
    SELECT s.doc_id, s.nll_micro,
           len(list_filter(cuts.cs, c -> s.nll_micro > c)) AS phase
    FROM scores s CROSS JOIN cuts
)
SELECT CAST(phase AS BIGINT) AS phase,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(nll_micro) AS BIGINT) AS min_nll,
       CAST(MAX(nll_micro) AS BIGINT) AS max_nll
FROM phased
GROUP BY 1
ORDER BY phase
""",
)
def curriculum_decile_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering plan: decile-bucket every document by its
    unigram-LM NLL (low = typical prose first, rare-token soup last) —
    the easy→hard schedule a curriculum dataloader consumes, with decile
    population and score ranges per phase. Cutpoints are ONE exact
    9-quantile aggregate broadcast as a literal array; phase assignment
    is a pure map (count of cutpoints below the integer score — both
    engines compare the identical doubles). At 100 TB the cutpoints come
    from the mergeable histogram sketch artifact instead of an exact
    percentile; the plan shape is unchanged."""
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.textstats.analysis import nll_scores_artifact

    scores = nll_scores_artifact(spark, sf_dir)
    cuts = scores.agg(
        F.percentile(
            "nll_micro", F.array(*[F.lit(p) for p in _DECILES])
        ).alias("cs")
    )
    phased = scores.join(F.broadcast(cuts)).select(
        "nll_micro",
        F.size(
            F.filter(F.col("cs"), lambda c: F.col("nll_micro") > c)
        ).cast("long").alias("phase"),
    )
    return (
        phased.groupBy("phase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("nll_micro").cast("long").alias("min_nll"),
            F.max("nll_micro").cast("long").alias("max_nll"),
        )
        .transform(present_sorted, "phase")
    )


@register(
    "bpe_merge_candidates",
    """
WITH tokens AS (
    SELECT unnest(string_split_regex(lower(COALESCE(text, '')),
                  '[^a-z0-9]+')) AS term
    FROM documents
),
ctf AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS freq FROM tokens
    WHERE term != '' GROUP BY 1
),
pairs AS (
    SELECT unnest(list_transform(
               generate_series(1, length(term) - 1),
               i -> substr(term, i, 2))) AS pair,
           freq
    FROM ctf WHERE length(term) >= 2
)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS freq
FROM pairs
GROUP BY 1
ORDER BY freq DESC, pair ASC
LIMIT 25
""",
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-iteration BPE merge scoring (Sennrich et al. 2016): the most
    frequent adjacent character pairs across the corpus, weighted by word
    frequency — the argmax of this table IS the first merge a BPE
    tokenizer trained on this corpus would learn. The corpus-scale work
    collapses to the VOCABULARY (term, freq) table first (term stats, an
    ETL artifact shape), so pair explosion is vocab-sized, not
    corpus-sized; subsequent merge iterations re-segment that same
    vocab table driver-side."""
    from msgvault_spark.sources.cache import get_text_index

    postings, _stats = get_text_index(
        spark, sf_dir, "documents", "doc_id", "text"
    )
    ctf = postings.groupBy("term").agg(
        F.sum("tf").cast("long").alias("freq")
    )
    pairs = (
        ctf.filter(F.length("term") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("term") - 1),
                    lambda i: F.col("term").substr(i, F.lit(2)),
                )
            ).alias("pair"),
            "freq",
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("pair").asc())
        .limit(25)
    )


# ---------------------------------------------------------------------------
# batch 4: substring-evidence dedup, graph centrality, ranking eval,
# bigram LM scoring
# ---------------------------------------------------------------------------

_SPAN_W = 8
_SPAN_TOP = 100


def _span_oracle() -> str:
    from msgvault_spark.dedup.substrings import span_coverage_oracle_sql

    return span_coverage_oracle_sql(w=_SPAN_W, top_n=_SPAN_TOP)


@register("repeated_span_coverage", _span_oracle())
def repeated_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee et al. 2022 substring dedup, Spark-shaped: fraction of each
    document's tokens inside 8-token shingles that occur >= 2 times
    corpus-wide (any duplicated >= 15-token run necessarily contains
    one).  Exact interval union via the per-doc LAG telescope — no range
    join, no corpus-sized window (dedup/substrings.py for the 100 TB
    shuffle inventory)."""
    from msgvault_spark.dedup.substrings import (
        duplicated_span_coverage,
        duplicated_starts,
    )
    from msgvault_spark.sources.cache import get_artifact

    docs = load_table(spark, sf_dir, "documents")
    # the corpus-scale work (shingle groupBy + mark join) is the memoized
    # ETL artifact; the query is the per-doc LAG telescope + top-N
    marked = get_artifact(
        spark,
        (sf_dir, "dup_spans", _SPAN_W),
        lambda: duplicated_starts(docs, "doc_id", "text", w=_SPAN_W),
    )
    return duplicated_span_coverage(
        docs, "doc_id", "text", w=_SPAN_W, top_n=_SPAN_TOP, marked=marked
    )


def _pagerank_oracle() -> str:
    from msgvault_spark.dedup.minhash import minhash_oracle_sql
    from msgvault_spark.operators.pagerank import pagerank_oracle_sql

    pairs_sql = minhash_oracle_sql("SELECT doc_id, text FROM documents").strip()
    return pagerank_oracle_sql(pairs_sql)


@register("pagerank_dup_graph", _pagerank_oracle())
def pagerank_dup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centrality triage of the near-duplicate graph: 5 rounds of
    all-integer damped PageRank (operators/pagerank.py) over the
    MinHash-LSH pair graph — hubs are template/boilerplate attractors,
    the docs a "delete the hub, audit the fringe" policy removes first.
    The iterative sibling of the pointer-jumping components entry:
    per-round one edge join + one map-side-combining aggregate, rank
    state localCheckpoint'ed (constant plan size)."""
    from msgvault_spark.dedup.minhash import pairs_from_index
    from msgvault_spark.operators.pagerank import pagerank
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.sources.cache import get_minhash_index

    docs = load_table(spark, sf_dir, "documents")
    # the band index is the shared ETL artifact (same key as
    # cross_source_dup_report) — the query pays pair verify + 5 rank
    # rounds only
    idx = get_minhash_index(
        spark,
        (sf_dir, "documents_raw"),
        lambda: docs.select("doc_id", "text"),
        "doc_id",
        "text",
    )
    pairs = pairs_from_index(idx)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    return pagerank(edges).transform(present_sorted, "node")


_NDCG_NQ = 20
_NDCG_K = 10


def _ndcg_oracle() -> str:
    from msgvault_spark.similarity.ndcg import ndcg_oracle_sql

    return ndcg_oracle_sql(nq=_NDCG_NQ, k=_NDCG_K)


@register("ndcg_eval_knn", _ndcg_oracle())
def ndcg_eval_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of exact cosine retrieval with label-match relevance —
    the ORDER-sensitive eval the recall@k reports can't see (TREC/BEIR
    protocol).  Discount constants are Python-precomputed fixed-point
    literals inlined into BOTH engines, so DCG is an order-free integer
    sum and no libm call enters the comparison
    (similarity/ndcg.py)."""
    from msgvault_spark.catalog_multimodal import _exact_gt
    from msgvault_spark.similarity.ndcg import ndcg_report

    emb = load_table(spark, sf_dir, "embeddings")
    # rank the recall harness' shared persisted ground truth — one
    # brute-force scan serves all five eval reports
    return ndcg_report(
        emb,
        emb.filter(F.col("vec_id") < _NDCG_NQ),
        k=_NDCG_K,
        topk=_exact_gt(spark, sf_dir),
    )


_BACKOFF_REF_PRED = "source IN ('src0', 'src1', 'src2')"


def _backoff_oracle() -> str:
    from msgvault_spark.textstats.backoff import backoff_oracle_sql

    return backoff_oracle_sql(_BACKOFF_REF_PRED)


@register("bigram_backoff_quality", _backoff_oracle())
def bigram_backoff_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-Backoff bigram LM scoring (Brants et al. 2007 — the
    MapReduce-native LM): every document's mean negative log score under
    a bigram model counted over the trusted src0-src2 slice, alpha=0.4
    backoff to add-one-smoothed unigrams.  Word ORDER now matters —
    shuffled boilerplate separates from fluent text the unigram scorer
    can't tell apart.  All log arguments are single divisions of exact
    integers; contributions are non-negative fixed-point longs
    (textstats/backoff.py)."""
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.textstats.backoff import bigram_backoff_scores

    docs = load_table(spark, sf_dir, "documents")
    return bigram_backoff_scores(docs, _BACKOFF_REF_PRED).transform(
        present_sorted, "doc_id"
    )


_BPE_ROUNDS = 4


def _bpe_oracle() -> str:
    from msgvault_spark.textstats.bpe import bpe_oracle_sql

    return bpe_oracle_sql(
        "SELECT doc_id, text FROM documents", k=_BPE_ROUNDS
    )


@register("bpe_train_merges", _bpe_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE merge TRAINING (Sennrich et al. 2016) — the first
    four merges a tokenizer learns on this corpus, with each pair's
    count at selection time. Extends bpe_merge_candidates (round-1
    scoring) to the actual training loop: per round, vocab-sized
    adjacent-pair aggregate → deterministic argmax → greedy merge
    applied to every term via one double-separator string replace
    (single-pass replace ≡ BPE's left-to-right non-overlapping merge in
    BOTH engines — textstats/bpe.py). All rounds run on the (term, freq)
    artifact, never the corpus; per-round argmaxes are bounded 1-row
    collects (the k-means pattern), replayed by the oracle as unrolled
    CTEs."""
    from msgvault_spark.textstats.bpe import bpe_train_merges as _train
    from msgvault_spark.sources.cache import get_text_index

    docs = load_table(spark, sf_dir, "documents")
    postings, _stats = get_text_index(
        spark, sf_dir, "documents", "doc_id", "text"
    )
    ctf = postings.groupBy("term").agg(
        F.sum("tf").cast("long").alias("freq")
    )
    return _train(docs, k=_BPE_ROUNDS, ctf=ctf)


def _bpe_fert_oracle() -> str:
    from msgvault_spark.textstats.bpe import bpe_encode_oracle_sql

    return bpe_encode_oracle_sql(
        "SELECT doc_id, source, text FROM documents", k=_BPE_ROUNDS
    )


@register("bpe_trained_fertility", _bpe_fert_oracle())
def bpe_trained_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-encode: per-source tokens-per-word fertility under the
    ACTUAL learned merges (bpe_train_merges' first four), not the regex
    proxy of token_fertility_report — the number a budgeting pass uses
    once the tokenizer is real. Encoding is the same double-separator
    replace chain applied corpus-side as a pure map (whole-stage
    codegen), one group aggregate after (textstats/bpe.py)."""
    from msgvault_spark.textstats.bpe import (
        bpe_encode_counts,
        bpe_train_merges as _train,
    )
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.sources.cache import get_text_index

    docs = load_table(spark, sf_dir, "documents")
    postings, _stats = get_text_index(
        spark, sf_dir, "documents", "doc_id", "text"
    )
    ctf = postings.groupBy("term").agg(
        F.sum("tf").cast("long").alias("freq")
    )
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in _train(docs, k=_BPE_ROUNDS, ctf=ctf).collect()
    ]
    return bpe_encode_counts(docs, merges).transform(
        present_sorted, "source"
    )


def _doremi_oracle() -> str:
    from msgvault_spark.textstats.backoff import backoff_oracle_sql

    perdoc = backoff_oracle_sql(_BACKOFF_REF_PRED).strip()
    return f"""
WITH perdoc AS ({perdoc}),
src AS (SELECT doc_id, source FROM documents),
per_src AS (
    SELECT s.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.n_bigrams * p.nll_micro) AS BIGINT)
               // CAST(SUM(p.n_bigrams) AS BIGINT) AS mean_nll_micro
    FROM perdoc p JOIN src s USING (doc_id) GROUP BY 1
),
base AS (SELECT MIN(mean_nll_micro) AS base FROM per_src),
staged AS (
    SELECT source, n_docs, mean_nll_micro,
           CAST(mean_nll_micro - base AS BIGINT) AS excess_micro,
           CAST(floor(exp(0.1 * CAST(mean_nll_micro - base AS DOUBLE)
                          / 1000000.0) * 1000000000 + 0.5)
                AS BIGINT) AS unnorm_nano
    FROM per_src CROSS JOIN base
),
tot AS (SELECT CAST(SUM(unnorm_nano) AS BIGINT) AS tot FROM staged)
SELECT source, n_docs, mean_nll_micro, excess_micro,
       CAST((unnorm_nano * 1000000) // tot AS BIGINT) AS weight_ppm
FROM staged CROSS JOIN tot
ORDER BY source
"""


@register("doremi_weight_update", _doremi_oracle())
def doremi_weight_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style mixture reweighting (Xie et al. 2023): one
    multiplicative-weights update of per-source sampling weights from
    per-domain excess loss — domains the proxy LM finds HARD (high mean
    Stupid-Backoff NLL over the trusted reference slice) are upweighted
    by exp(eta * excess), eta=0.1, then normalized to ppm.  Completes the
    mixing family: temperature/UniMax/epoch-factor set weights from
    token COUNTS; DoReMi sets them from model LOSS.

    Engine-exact up to libm: token-weighted per-source mean NLL is an
    integer division of long sums; the single exp evaluates one double
    quotient in each engine and is floored to a nano long, so the
    normalizing sum is order-free integer arithmetic. Java Math.exp and
    DuckDB's std::exp are each allowed 1 ulp, so a value landing within
    1 ulp of a .5 floor boundary could in principle flip — the same
    accepted, documented risk as every ln() in the BM25/backoff family
    (textstats/backoff.py supplies the per-doc scores)."""
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.textstats.backoff import bigram_backoff_scores

    docs = load_table(spark, sf_dir, "documents")
    per_doc = bigram_backoff_scores(docs, _BACKOFF_REF_PRED)
    src = docs.select("doc_id", "source")
    per_src = (
        per_doc.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bigrams").cast("long").alias("_toks"),
            F.sum(F.col("n_bigrams") * F.col("nll_micro"))
            .cast("long")
            .alias("_wsum"),
        )
        .select(
            "source",
            "n_docs",
            F.expr("_wsum div _toks").cast("long").alias("mean_nll_micro"),
        )
    )
    # baseline and normalizer as windows over the S-row per-source frame
    # (the unimax waterfill shape): ONE single-partition hop on S rows,
    # never a scalar crossJoin — agg-scalar crossJoins re-execute the
    # whole upstream corpus pipeline once per scalar
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(0))
    staged = per_src.withColumn(
        "excess_micro",
        (F.col("mean_nll_micro") - F.min("mean_nll_micro").over(w))
        .cast("long"),
    ).withColumn(
        "unnorm_nano",
        F.floor(
            F.exp(
                F.lit(0.1)
                * F.col("excess_micro").cast("double")
                / F.lit(1e6)
            )
            * F.lit(1e9)
            + F.lit(0.5)
        ).cast("long"),
    )
    return (
        staged.withColumn(
            "_tot", F.sum("unnorm_nano").over(w).cast("long")
        )
        .select(
            "source",
            "n_docs",
            "mean_nll_micro",
            "excess_micro",
            F.expr("(unnorm_nano * 1000000) div _tot")
            .cast("long")
            .alias("weight_ppm"),
        )
        .transform(present_sorted, "source")
    )


# ---------------------------------------------------------------------------
# batch 5: span deletion, incremental span dedup, triplet-margin eval,
# Zipf profiling
# ---------------------------------------------------------------------------


def _clean_oracle() -> str:
    from msgvault_spark.dedup.substrings import clean_spans_oracle_sql

    return clean_spans_oracle_sql(w=_SPAN_W)


@register("span_clean_docs", _clean_oracle())
def span_clean_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DELETION half of Lee et al. 2022: every token covered by a
    corpus-duplicated 8-shingle is cut; emits per-doc kept-token counts
    and the md5 of the cleaned text (scalar-small driver payload, full
    content check).  Shares the dup-start ETL artifact with
    repeated_span_coverage — the query is a per-doc position filter
    against each doc's own start array (dedup/substrings.py:clean_spans)."""
    from msgvault_spark.dedup.substrings import clean_spans, duplicated_starts
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.sources.cache import get_artifact

    docs = load_table(spark, sf_dir, "documents")
    marked = get_artifact(
        spark,
        (sf_dir, "dup_spans", _SPAN_W),
        lambda: duplicated_starts(docs, "doc_id", "text", w=_SPAN_W),
    )
    return clean_spans(docs, "doc_id", "text", w=_SPAN_W, marked=marked).transform(
        present_sorted, "doc_id"
    )


_SPAN_BATCH_PRED = "doc_id % 10 = 7"


def _inc_span_oracle() -> str:
    from msgvault_spark.dedup.substrings import incremental_coverage_oracle_sql

    return incremental_coverage_oracle_sql(_SPAN_BATCH_PRED, w=_SPAN_W)


@register("incremental_span_coverage", _inc_span_oracle())
def incremental_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental substring dedup: docs with doc_id % 10 = 7 stand in
    for today's ingest batch; their span coverage is probed against the
    FROZEN shingle-hash index of the other 90% — each ingest pays
    O(batch shingles), never re-scanning the old corpus (the
    minhash_incremental_pairs shape, carried down to substring
    evidence)."""
    from msgvault_spark.dedup.substrings import (
        coverage_against_index,
        shingle_starts,
    )
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.sources.cache import get_artifact

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.expr(_SPAN_BATCH_PRED))
    idx = get_artifact(
        spark,
        (sf_dir, "span_index_old", _SPAN_W),
        lambda: shingle_starts(
            docs.filter(~F.expr(_SPAN_BATCH_PRED)), "doc_id", "text", w=_SPAN_W
        ).select("h").distinct(),
    )
    return coverage_against_index(
        batch, idx, "doc_id", "text", w=_SPAN_W
    ).transform(present_sorted, "doc_id")


def _triplet_oracle() -> str:
    from msgvault_spark.similarity.triplet import triplet_oracle_sql

    return triplet_oracle_sql(nq=_NDCG_NQ)


@register("triplet_margin_eval", _triplet_oracle())
def triplet_margin_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-learning QA on the embedding space: per probe query, how
    many WRONG-label vectors outscore the best same-label vector — the
    outright top-of-ranking inversions nDCG averages away, and the
    failure cases hard_negative_mining feeds back into training.  Two
    map-side-combined aggregates over the scored join; the Q-row
    best-positive table broadcasts back
    (similarity/triplet.py)."""
    from msgvault_spark.similarity.triplet import triplet_margin_report

    emb = load_table(spark, sf_dir, "embeddings")
    return triplet_margin_report(emb, emb.filter(F.col("vec_id") < _NDCG_NQ))


def _zipf_oracle() -> str:
    from msgvault_spark.textstats.zipf import zipf_oracle_sql

    return zipf_oracle_sql(top_k=100)


@register("zipf_slope_by_source", _zipf_oracle())
def zipf_slope_by_source_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-slope screen per source: OLS slope of (ln rank, ln freq)
    over each source's top-100 terms — natural text sits near -1,
    templated sources flatten, token soup breaks the line.  The ln-rank
    coordinates are Python-precomputed literals in BOTH engines and the
    OLS sums are exact integer arithmetic, so the slope is one double
    division of identical longs (textstats/zipf.py)."""
    from msgvault_spark.sources.cache import get_text_index
    from msgvault_spark.textstats.zipf import zipf_slope_by_source

    postings, _stats = get_text_index(
        spark, sf_dir, "documents", "doc_id", "text"
    )
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        postings.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source", "term")
        .agg(F.sum("tf").cast("long").alias("freq"))
    )
    return zipf_slope_by_source(tf, top_k=100)


# ---------------------------------------------------------------------------
# batch 6: MRR eval, Gopher quality rules
# ---------------------------------------------------------------------------


def _mrr_oracle() -> str:
    from msgvault_spark.similarity.mrr import mrr_oracle_sql

    return mrr_oracle_sql(nq=_NDCG_NQ, k=_NDCG_K)


@register("mrr_eval_knn", _mrr_oracle())
def mrr_eval_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 of exact cosine retrieval with label-match relevance — the
    where-does-the-FIRST-hit-land metric (recall grades the set, nDCG
    the whole order; MRR is what search QA pages on).  Reciprocal-rank
    constants are Python-precomputed fixed-point literals inlined into
    BOTH engines; the per-query reduction is a MIN over integer ranks,
    so no float enters the comparison (similarity/mrr.py).  Ranks the
    recall harness' shared persisted ground truth — one brute-force scan
    serves all six eval reports."""
    from msgvault_spark.catalog_multimodal import _exact_gt
    from msgvault_spark.similarity.mrr import mrr_report

    emb = load_table(spark, sf_dir, "embeddings")
    return mrr_report(
        emb,
        emb.filter(F.col("vec_id") < _NDCG_NQ),
        k=_NDCG_K,
        topk=_exact_gt(spark, sf_dir),
    )


def _gopher_oracle() -> str:
    from msgvault_spark.textstats.analysis import gopher_oracle_sql

    return gopher_oracle_sql()


@register("gopher_rules_docs", _gopher_oracle())
def gopher_rules_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021) as a per-document rule
    table with a final keep bit — the named heuristic filter suite next
    to c4_pipeline_stats and repetition_filter_docs.  Every threshold is
    integer cross-multiplied (no float ratio exists in either engine);
    the whole entry is a pure map over one scan
    (textstats/analysis.py:gopher_rules)."""
    from msgvault_spark.textstats.analysis import gopher_rules

    docs = load_table(spark, sf_dir, "documents")
    return gopher_rules(docs, "doc_id", "text").sortWithinPartitions(
        "doc_id"
    )


_KM_CELLS = 8
_KM_ITER = 2


def _kmeans_oracle() -> str:
    from msgvault_spark.similarity.ivf import kmeans_cells_oracle_sql

    return kmeans_cells_oracle_sql(n_cells=_KM_CELLS, n_iter=_KM_ITER)


@register("kmeans_cells_report", _kmeans_oracle())
def kmeans_cells_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means as a first-class entry: 2 training rounds over the
    embedding corpus (broadcast centroids → argmax assignment → per-cell
    elementwise mean, the production coarse-quantizer build IVF seeds
    stand in for), then a final assignment pass reduced to per-cell
    integer stats.  The iterative-algorithm showcase next to PageRank:
    per-round state is K tiny centroids (collected and re-literaled —
    lineage stays constant-size), every discrete choice shared with the
    oracle via the rounded-cosine argmax rule
    (similarity/ivf.py:train_centroids_kmeans)."""
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.similarity.ivf import assign_cells, train_centroids_kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_centroids_kmeans(
        emb, n_cells=_KM_CELLS, n_iter=_KM_ITER
    )
    return (
        assign_cells(emb, cents)
        .groupBy(F.col("cell").alias("cid"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min("id").cast("long").alias("min_id"),
            F.max("id").cast("long").alias("max_id"),
        )
        .transform(present_sorted, "cid")
    )


def _edit_pairs_oracle() -> str:
    from msgvault_spark.dedup.minhash import minhash_oracle_sql

    pairs = minhash_oracle_sql(
        "SELECT doc_id, text FROM documents", jaccard_threshold=0.5
    ).strip()
    return f"""
WITH pairs AS ({pairs})
SELECT p.id_a, p.id_b,
       CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
       CAST(greatest(length(da.text), length(db.text)) AS BIGINT)
           AS max_len,
       (CAST(greatest(length(da.text), length(db.text))
             - levenshtein(da.text, db.text) AS BIGINT) * 1000000)
           // CAST(greatest(length(da.text), length(db.text)) AS BIGINT)
           AS sim_ppm
FROM pairs p
JOIN documents da ON da.doc_id = p.id_a
JOIN documents db ON db.doc_id = p.id_b
ORDER BY p.id_a, p.id_b
"""


@register("edit_distance_pairs", _edit_pairs_oracle())
def edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact character-level verification of the MinHash candidate set:
    Levenshtein distance + integer similarity (ppm of the longer text)
    per surviving pair — the edit-distance complement to shingle
    Jaccard, and the metric template-detection rules key on (two docs
    can share every 3-shingle yet differ by a critical negation).  The
    propose/verify discipline is what makes this scale: the O(len²) DP
    runs ONLY on LSH-surviving pairs, never all-pairs, and per-pair cost
    is bounded by document length.  Decoration joins broadcast the PAIR
    side (the cross_source_dup_report rule — the doc→text corpus map
    streams)."""
    from msgvault_spark.dedup.minhash import pairs_from_index
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.sources.cache import get_minhash_index

    docs = load_table(spark, sf_dir, "documents")
    idx = get_minhash_index(
        spark,
        (sf_dir, "documents_raw"),
        lambda: docs.select("doc_id", "text"),
        "doc_id",
        "text",
    )
    pairs = pairs_from_index(idx, jaccard_threshold=0.5).select(
        "id_a", "id_b"
    )
    a = docs.select(
        F.col("doc_id").alias("id_a"), F.col("text").alias("text_a")
    )
    b = docs.select(
        F.col("doc_id").alias("id_b"), F.col("text").alias("text_b")
    )
    dist = F.levenshtein("text_a", "text_b").cast("long")
    max_len = F.greatest(F.length("text_a"), F.length("text_b")).cast("long")
    return (
        b.join(F.broadcast(a.join(F.broadcast(pairs), "id_a")), "id_b")
        .select(
            "id_a",
            "id_b",
            dist.alias("edit_dist"),
            max_len.alias("max_len"),
        )
        .withColumn(
            "sim_ppm",
            F.expr(
                "CAST((max_len - edit_dist) * 1000000 AS BIGINT)"
                " div max_len"
            ),
        )
        .transform(present_sorted, "id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# batch 7: span-corruption planning, PSI drift monitor
# ---------------------------------------------------------------------------

_MASK_W = 3
_MASK_RATE = 20


def _spanmask_oracle() -> str:
    from msgvault_spark.operators.spanmask import span_corruption_oracle_sql

    return span_corruption_oracle_sql(w=_MASK_W, rate=_MASK_RATE)


@register("span_corruption_plan", _spanmask_oracle())
def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 span-corruption planning (Raffel et al. 2020): per document,
    the hash-selected mask spans a denoising objective would cut — span
    starts, merged spans (= sentinel count), exact masked-token union
    (the dedup interval telescope reused as a training-objective
    planner), and the masked fraction that decides sequence budgets.
    Deterministic via the portable hash; ~15% mask at w=3, rate=1/20
    (operators/spanmask.py)."""
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.operators.spanmask import span_corruption_plan as _plan

    docs = load_table(spark, sf_dir, "documents")
    return _plan(docs, "doc_id", "text", w=_MASK_W, rate=_MASK_RATE).transform(
        present_sorted, "doc_id"
    )


def _psi_oracle() -> str:
    from msgvault_spark.operators.psi import psi_oracle_sql

    return psi_oracle_sql()


@register("length_psi_drift", _psi_oracle())
def length_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index over token-length buckets between the
    even-doc_id half (frozen baseline) and the odd half (incoming batch)
    — the standard dataops drift gate (PSI ≥ 0.1 investigate, ≥ 0.25
    act) a 100 TB pipeline runs per ingest before any expensive stage.
    Per-bucket contributions are fixed-point nano with every log
    argument a single division of exact integers, so the report is
    engine-exact (operators/psi.py)."""
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.operators.psi import psi_report
    from msgvault_spark.textstats.analysis import words

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.size(words(F.coalesce(F.col("text"), F.lit("")))).alias("v"),
    )
    return psi_report(
        scored, F.col("doc_id") % 2 == 0, F.col("v")
    ).transform(present_sorted, "bucket")


# ---------------------------------------------------------------------------
# batch 8: PMI collocations, weighted sampling without replacement
# ---------------------------------------------------------------------------

_PMI_MIN = 5
_PMI_TOP = 25


def _pmi_oracle() -> str:
    from msgvault_spark.textstats.pmi import pmi_oracle_sql

    return pmi_oracle_sql(min_count=_PMI_MIN, top_n=_PMI_TOP)


@register("pmi_collocations", _pmi_oracle())
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation mining (Church & Hanks 1990): adjacent word pairs
    ranked by pointwise mutual information with a min-count floor — the
    association-strength complement to top_bigrams_corpus' raw
    frequency (frequency surfaces "of the"; PMI surfaces multi-word
    expressions).  Counts collapse to vocab-sized type tables before any
    join; the log argument is the identical double expression tree in
    both engines, floored to fixed-point nano
    (textstats/pmi.py)."""
    from msgvault_spark.textstats.pmi import pmi_collocations as _pmi

    docs = load_table(spark, sf_dir, "documents")
    return _pmi(docs, "doc_id", "text", min_count=_PMI_MIN, top_n=_PMI_TOP)


_WSAMPLE_QUOTA = 20


def _wsample_oracle() -> str:
    from msgvault_spark.functions.portable import MD5_HEX6_SQL

    h = MD5_HEX6_SQL.format(x="CAST(doc_id AS VARCHAR)")
    return f"""
WITH t AS (
    SELECT doc_id, source,
           len(list_filter(string_split_regex(lower(COALESCE(text, '')),
               '[^a-z0-9]+'), x -> x != '')) AS n_tokens
    FROM documents
),
k AS (
    SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(floor(-ln(({h} + 1) / 16777217.0)
                      / CAST(n_tokens AS DOUBLE) * 1000000000 + 0.5)
                AS BIGINT) AS key_nano
    FROM t WHERE n_tokens > 0
)
SELECT source, doc_id, n_tokens, key_nano FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY key_nano, doc_id) AS rn
    FROM k
) WHERE rn <= {_WSAMPLE_QUOTA}
ORDER BY source, key_nano, doc_id
"""


@register("weighted_sample_sources", _wsample_oracle())
def weighted_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, 20 docs per source with
    inclusion probability proportional to token count — the
    Efraimidis–Spirakis exponential-key scheme, deterministic via the
    portable hash so reruns and engines agree bit-for-bit.  The
    token-mass-aware cousin of cluster_balanced_sample (long docs carry
    more training signal; uniform row sampling under-weights them).
    Salted two-level bottom-k, no per-source sort window
    (operators/sampling.py:weighted_sample_wor)."""
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.operators.sampling import weighted_sample_wor
    from msgvault_spark.textstats.analysis import words

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        # long to match the oracle's CAST(n_tokens AS BIGINT); the
        # operator now preserves caller types instead of casting
        F.size(words(F.coalesce(F.col("text"), F.lit(""))))
        .cast("long")
        .alias("n_tokens"),
    )
    return weighted_sample_wor(
        scored, "source", "doc_id", "n_tokens", _WSAMPLE_QUOTA
    ).transform(present_sorted, "source", "key_nano", "doc_id")


# ---------------------------------------------------------------------------
# batch 9: tokenizer OOV-rate gate, boilerplate prefix detection
# ---------------------------------------------------------------------------

_OOV_VOCAB = 500


def _oov_oracle() -> str:
    return f"""
WITH tokens AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(COALESCE(text, '')),
                  '[^a-z0-9]+')) AS term
    FROM documents
),
tc AS (SELECT doc_id, term FROM tokens WHERE term != ''),
postings AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
             FROM tc GROUP BY 1, 2),
ctf AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS ctf
        FROM postings GROUP BY 1),
vocab AS (SELECT term FROM ctf ORDER BY ctf DESC, term ASC
          LIMIT {_OOV_VOCAB}),
j AS (
    SELECT d.source, p.tf,
           CASE WHEN v.term IS NULL THEN p.tf ELSE 0 END AS oov
    FROM postings p
    JOIN documents d USING (doc_id)
    LEFT JOIN vocab v ON v.term = p.term
)
SELECT source,
       CAST(SUM(tf) AS BIGINT) AS total_tokens,
       CAST(SUM(oov) AS BIGINT) AS oov_tokens,
       (CAST(SUM(oov) AS BIGINT) * 1000000) // CAST(SUM(tf) AS BIGINT)
           AS oov_ppm
FROM j GROUP BY source ORDER BY source
"""


@register("oov_rate_by_source", _oov_oracle())
def oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage gate: the fraction of each source's token
    instances falling outside a frozen top-500 vocabulary — the "will
    this source UNK-flood my tokenizer" screen run before any training
    budget is spent (the instance-rate complement to
    token_fertility_report's per-token cost).  Served from the postings
    artifact; the vocab is a V-row TakeOrdered result broadcast into the
    flag join; the only corpus-scale shuffle is the per-source rollup
    with map-side combine."""
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.sources.cache import get_text_index

    postings, _stats = get_text_index(
        spark, sf_dir, "documents", "doc_id", "text"
    )
    ctf = postings.groupBy("term").agg(
        F.sum("tf").cast("long").alias("ctf")
    )
    vocab = (
        ctf.orderBy(F.col("ctf").desc(), F.col("term").asc())
        .limit(_OOV_VOCAB)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        postings.join(F.broadcast(vocab), "term", "left")
        .join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.sum("tf").cast("long").alias("total_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), F.col("tf")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("oov_tokens"),
        )
        .withColumn(
            "oov_ppm", F.expr("(oov_tokens * 1000000) div total_tokens")
        )
        .transform(present_sorted, "source")
    )


_PREFIX_K = 8
_PREFIX_TOP = 25


def _prefix_oracle() -> str:
    return f"""
WITH ws AS (
    SELECT doc_id, source,
           list_filter(string_split_regex(lower(COALESCE(text, '')),
                       '[^a-z0-9]+'), x -> x != '') AS w
    FROM documents
),
p AS (
    SELECT doc_id, source,
           list_aggregate(w[1:{_PREFIX_K}], 'string_agg', ' ') AS prefix
    FROM ws WHERE len(w) >= 1
)
SELECT prefix,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(MIN(doc_id) AS BIGINT) AS example_doc_id
FROM p GROUP BY prefix
ORDER BY n_docs DESC, prefix ASC
LIMIT {_PREFIX_TOP}
"""


@register("boilerplate_prefixes", _prefix_oracle())
def boilerplate_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate header detection: the most repeated first-8-token
    prefixes across the corpus, with how many sources share each and an
    example doc — the template-removal recon step (C4 strips repeated
    headers/footers; this finds them BEFORE writing removal rules).
    Prefix build is a pure map; one groupBy with map-side combine
    (COUNT(DISTINCT source) is a small per-group domain); top-25 via
    TakeOrdered."""
    from msgvault_spark.textstats.analysis import words

    docs = load_table(spark, sf_dir, "documents")
    ws = docs.select(
        "doc_id",
        "source",
        words(F.coalesce(F.col("text"), F.lit(""))).alias("w"),
    ).filter(F.size("w") >= 1)
    return (
        ws.select(
            "doc_id",
            "source",
            F.concat_ws(" ", F.slice("w", 1, _PREFIX_K)).alias("prefix"),
        )
        .groupBy("prefix")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct("source").cast("long").alias("n_sources"),
            F.min("doc_id").cast("long").alias("example_doc_id"),
        )
        .orderBy(F.col("n_docs").desc(), F.col("prefix").asc())
        .limit(_PREFIX_TOP)
    )


# ---------------------------------------------------------------------------
# batch 10: per-doc token entropy, MAD length-outlier screen
# ---------------------------------------------------------------------------


def _entropy_oracle() -> str:
    return """
WITH tokens AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(COALESCE(text, '')),
                  '[^a-z0-9]+')) AS term
    FROM documents
),
tc AS (SELECT doc_id, term FROM tokens WHERE term != ''),
postings AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
             FROM tc GROUP BY 1, 2),
dls AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl,
               CAST(COUNT(*) AS BIGINT) AS distinct_terms
        FROM postings GROUP BY 1),
contrib AS (
    SELECT p.doc_id,
           CAST(floor(p.tf * ln(CAST(d.dl AS DOUBLE) / p.tf) * 1000000
                      + 0.5) AS BIGINT) AS cs
    FROM postings p JOIN dls d USING (doc_id)
),
agg AS (SELECT doc_id, CAST(SUM(cs) AS BIGINT) AS s
        FROM contrib GROUP BY 1)
SELECT d.doc_id, d.dl AS n_tokens, d.distinct_terms,
       a.s // d.dl AS entropy_micro,
       CASE WHEN d.dl >= 2
            THEN ((a.s // d.dl) * 1000000)
                 // CAST(floor(ln(CAST(d.dl AS DOUBLE)) * 1000000
                               + 0.5) AS BIGINT)
            ELSE 0 END AS uniformity_ppm
FROM dls d JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


@register("token_entropy_docs", _entropy_oracle())
def token_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram Shannon entropy + length-normalized
    uniformity: the self-referential repetitiveness feature (a doc of
    one looping token scores 0; all-distinct scores 1e6) next to the
    corpus-LM NLL and backoff scores.  Served from the postings
    artifact; engine-exact fixed point throughout
    (textstats/analysis.py:token_entropy_scores)."""
    from msgvault_spark.sources.cache import get_text_index
    from msgvault_spark.textstats.analysis import token_entropy_scores

    postings, _stats = get_text_index(
        spark, sf_dir, "documents", "doc_id", "text"
    )
    return token_entropy_scores(postings).sortWithinPartitions("doc_id")


_MAD_K = 3


def _mad_oracle() -> str:
    return f"""
WITH t AS (
    SELECT doc_id, source,
           CAST(len(list_filter(string_split_regex(lower(COALESCE(text,
                '')), '[^a-z0-9]+'), x -> x != '')) AS BIGINT) AS v
    FROM documents
),
med AS (
    SELECT source,
           CAST(2 * quantile_cont(v, 0.5) AS BIGINT) AS med_x2
    FROM t GROUP BY source
),
dev AS (
    SELECT t.source, t.doc_id, t.v, m.med_x2,
           abs(2 * t.v - m.med_x2) AS d2
    FROM t JOIN med m USING (source)
),
mad AS (
    SELECT source,
           CAST(2 * quantile_cont(d2, 0.5) AS BIGINT) AS mad_x4
    FROM dev GROUP BY source
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(d.med_x2) AS BIGINT) AS median_x2,
       CAST(MIN(m.mad_x4) AS BIGINT) AS mad_x4,
       CAST(SUM(CASE WHEN 2 * d.d2 > {_MAD_K} * m.mad_x4
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       (CAST(SUM(CASE WHEN 2 * d.d2 > {_MAD_K} * m.mad_x4
                 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
           // CAST(COUNT(*) AS BIGINT) AS outlier_ppm
FROM dev d JOIN mad m USING (source)
GROUP BY d.source ORDER BY d.source
"""


@register("length_mad_outliers", _mad_oracle())
def length_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-source outlier screen: documents whose token length
    sits more than 3 median-absolute-deviations from their source's
    median — the screen that survives the heavy tails that break
    mean/stddev z-scores (truncation artifacts and concatenation blobs
    are exactly the tails).  Exact medians doubled into integers (the
    exact-quantile parity recipe), so the whole report is engine-exact
    integer arithmetic.  Two source-keyed aggs + two ≤S-row broadcast
    joins; at 100 TB the medians come from the mergeable
    histogram-quantile sketch artifact, same shape."""
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.textstats.analysis import words

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.size(words(F.coalesce(F.col("text"), F.lit("")))).cast(
            "long"
        ).alias("v"),
    )
    med = t.groupBy("source").agg(
        (2 * F.percentile("v", F.lit(0.5))).cast("long").alias("med_x2")
    )
    dev = t.join(F.broadcast(med), "source").withColumn(
        "d2", F.abs(2 * F.col("v") - F.col("med_x2"))
    )
    mad = dev.groupBy("source").agg(
        (2 * F.percentile("d2", F.lit(0.5))).cast("long").alias("mad_x4")
    )
    flagged = dev.join(F.broadcast(mad), "source")
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("med_x2").cast("long").alias("median_x2"),
            F.min("mad_x4").cast("long").alias("mad_x4"),
            F.sum(
                F.when(
                    2 * F.col("d2") > _MAD_K * F.col("mad_x4"), F.lit(1)
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .withColumn(
            "outlier_ppm", F.expr("(n_outliers * 1000000) div n_docs")
        )
        .transform(present_sorted, "source")
    )


# ---------------------------------------------------------------------------
# batch 11: LSH embedding near-dup scale path, per-language quality z-score
# ---------------------------------------------------------------------------

_EMB_DIM = 64  # testdata embedding width (the ann_lsh _DIM convention)
_LSH_ND_THRESHOLD = 0.45  # same bar as the exact all-pairs entry
_LSH_ND_PLANES = 8


def _lsh_nd_oracle() -> str:
    from msgvault_spark.dedup.embedding import lsh_near_dups_oracle_sql

    return lsh_near_dups_oracle_sql(
        _LSH_ND_THRESHOLD, dim=_EMB_DIM, n_planes=_LSH_ND_PLANES
    )


@register("embedding_near_dups_lsh", _lsh_nd_oracle())
def embedding_near_dups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE PATH of embedding_near_dups, now under the gate: random-
    hyperplane signatures bucket the corpus, only same-bucket pairs pay
    the exact cosine rescore — O(N²) becomes O(Σ bucket²), recall traded
    via n_planes. The exact all-pairs twin (blocked GEMM) remains the
    parity baseline; at 100 TB THIS is the operator that runs. Rescore
    engine: the GEMM-margin two-phase (dedup/embedding_gemm.py —
    per-bucket sub-blocked float64 GEMM proposes at threshold − margin,
    the shared JVM fold re-verifies survivors), pinned bit-identical to
    the interpreted-fold twin by tests/test_embedding_gemm.py and 4.6×
    faster at sf1; plane coefficients are shared Python literals so both
    engines bucket identically (ref: fused rescore semantics of
    sqlitevec/fused.go:162-196)."""
    from msgvault_spark.dedup.embedding_gemm import lsh_near_dups_gemm

    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_near_dups_gemm(
        emb, _LSH_ND_THRESHOLD, dim=_EMB_DIM, n_planes=_LSH_ND_PLANES
    )


def _zscore_oracle() -> str:
    return f"""
WITH {_UNIGRAM_SCORES_SQL},
sc AS (
    SELECT s.doc_id, d.lang, s.nll_micro
    FROM scores s JOIN documents d USING (doc_id)
),
st AS (
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(nll_micro) AS BIGINT) AS a,
           CAST(SUM(nll_micro * nll_micro) AS BIGINT) AS b
    FROM sc GROUP BY lang
)
SELECT sc.doc_id, sc.lang, sc.nll_micro,
       CASE WHEN st.n >= 2
                 AND (st.n * CAST(st.b AS DOUBLE) - CAST(st.a AS DOUBLE)
                      * CAST(st.a AS DOUBLE)) > 0
            THEN CAST(floor(
                 (CAST(sc.nll_micro AS DOUBLE) * st.n - CAST(st.a AS DOUBLE))
                 / (st.n * sqrt((st.n * CAST(st.b AS DOUBLE)
                                 - CAST(st.a AS DOUBLE)
                                   * CAST(st.a AS DOUBLE))
                                / (CAST(st.n AS DOUBLE) * (st.n - 1))))
                 * 1000 + 0.5) AS BIGINT)
            ELSE 0 END AS z_milli
FROM sc JOIN st USING (lang)
ORDER BY sc.doc_id
"""


@register("quality_zscore_by_lang", _zscore_oracle())
def quality_zscore_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language calibration of the unigram quality score: a raw NLL
    threshold over-filters whichever language the reference corpus
    under-represents, so cross-lingual pipelines compare z-scores within
    language instead (textstats/calibrate.py holds the float serving
    paths, JVM and Pandas, pinned equivalent by test).  Engine-exact
    here: group stats are exact integer sums (n, Σx, Σx²), the sample
    variance and sqrt build from identical double trees, z is floored to
    fixed-point milli.  Singleton or zero-variance groups emit 0.  One
    doc-keyed decoration join + one ≤L-row stats broadcast."""
    from msgvault_spark.textstats.analysis import nll_scores_artifact

    sc = (
        nll_scores_artifact(spark, sf_dir)
        .select("doc_id", "nll_micro")
        .join(
            load_table(spark, sf_dir, "documents").select("doc_id", "lang"),
            "doc_id",
        )
    )
    st = sc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("nll_micro").cast("long").alias("a"),
        F.sum(F.col("nll_micro") * F.col("nll_micro"))
        .cast("long")
        .alias("b"),
    )
    n, a, b = F.col("n"), F.col("a").cast("double"), F.col("b").cast("double")
    var_num = n * b - a * a
    sd = F.sqrt(var_num / (n.cast("double") * (n - 1)))
    z = F.floor(
        (F.col("nll_micro").cast("double") * n - a) / (n * sd) * 1000 + 0.5
    ).cast("long")
    return (
        sc.join(F.broadcast(st), "lang")
        .select(
            "doc_id",
            "lang",
            "nll_micro",
            F.when((n >= 2) & (var_num > 0), z)
            .otherwise(F.lit(0))
            .cast("long")
            .alias("z_milli"),
        )
        .sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# batch 13: word2vec-style sampling plan
# ---------------------------------------------------------------------------

_WSP_T_INV = 10000  # subsample threshold t = 1/10000 (the published 1e-4)
_WSP_TOP = 100


def _word_sampling_oracle() -> str:
    return f"""
WITH tokens AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(COALESCE(text, '')),
                  '[^a-z0-9]+')) AS term
    FROM documents
),
tc AS (SELECT term FROM tokens WHERE term != ''),
ctf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS ctf FROM tc GROUP BY 1),
tot AS (SELECT CAST(SUM(ctf) AS BIGINT) AS t FROM ctf),
w AS (
    SELECT term, ctf,
           CAST(floor(pow(CAST(ctf AS DOUBLE), 0.75) * 1000 + 0.5)
                AS BIGINT) AS wfp
    FROM ctf
),
sw AS (SELECT CAST(SUM(wfp) AS BIGINT) AS s FROM w)
SELECT w.term, w.ctf,
       CAST(least(1000000, floor(
           sqrt(CAST(tot.t AS DOUBLE) / ({_WSP_T_INV} * w.ctf))
           * 1000000 + 0.5)) AS BIGINT) AS keep_ppm,
       (w.wfp * 1000000) // sw.s AS neg_ppm
FROM w CROSS JOIN tot CROSS JOIN sw
ORDER BY w.ctf DESC, w.term ASC
LIMIT {_WSP_TOP}
"""


@register("word_sampling_plan", _word_sampling_oracle())
def word_sampling_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec-style sampling plan (Mikolov et al. 2013) for the top
    vocabulary: frequent-word subsampling keep probability
    (keep = min(1, sqrt(t/f)), t = 1e-4) and the unigram^0.75
    negative-sampling share — the two distributions every embedding
    trainer derives from corpus counts before training starts.
    Engine-exact: t/f reduces to ONE division of exact integer products,
    the ^0.75 weights are floored to fixed point BEFORE summation (so
    the normalizer is an exact integer, immune to float sum order).
    Vocab-sized everything, served from the postings artifact; top-100
    via TakeOrdered."""
    from msgvault_spark.sources.cache import get_text_index

    postings, _stats = get_text_index(
        spark, sf_dir, "documents", "doc_id", "text"
    )
    ctf = postings.groupBy("term").agg(
        F.sum("tf").cast("long").alias("ctf")
    )
    tot = ctf.agg(F.sum("ctf").cast("long").alias("t"))
    w = ctf.select(
        "term",
        "ctf",
        F.floor(F.pow(F.col("ctf").cast("double"), 0.75) * 1000 + 0.5)
        .cast("long")
        .alias("wfp"),
    )
    sw = w.agg(F.sum("wfp").cast("long").alias("s"))
    keep = F.least(
        F.lit(1000000).cast("long"),
        F.floor(
            F.sqrt(
                F.col("t").cast("double") / (_WSP_T_INV * F.col("ctf"))
            )
            * 1000000
            + 0.5
        ).cast("long"),
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(sw))
        .select(
            "term",
            "ctf",
            keep.alias("keep_ppm"),
            F.expr("(wfp * 1000000) div s").alias("neg_ppm"),
        )
        .orderBy(F.col("ctf").desc(), F.col("term").asc())
        .limit(_WSP_TOP)
    )


# ---------------------------------------------------------------------------
# batch 14: dedup tuning curves
# ---------------------------------------------------------------------------

_SWEEP_FLOOR = 0.3


def _jsweep_oracle() -> str:
    from msgvault_spark.dedup.minhash import minhash_oracle_sql

    pairs = minhash_oracle_sql(
        "SELECT doc_id, text FROM documents",
        jaccard_threshold=_SWEEP_FLOOR,
    ).strip()
    return f"""
WITH pairs AS ({pairs})
SELECT CAST(floor(jaccard * 10) AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CAST(floor(jaccard * 1000000) AS BIGINT)) AS BIGINT)
           AS sum_jaccard_fp
FROM pairs GROUP BY 1 ORDER BY 1
"""


@register("dedup_threshold_sweep", _jsweep_oracle())
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup tuning curve: near-dup pair counts per Jaccard decile above
    a 0.3 floor — the one-pass answer to "how many pairs does each
    candidate threshold commit me to", run BEFORE picking the production
    threshold (moving it from 0.8 to 0.7 on a 100 TB corpus can mean
    10× the merge volume).  One pass over the shared MinHash band index;
    the decile rollup is a ≤7-row aggregate."""
    from msgvault_spark.dedup.minhash import pairs_from_index
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.sources.cache import get_minhash_index

    docs = load_table(spark, sf_dir, "documents")
    idx = get_minhash_index(
        spark,
        (sf_dir, "documents_raw"),
        lambda: docs.select("doc_id", "text"),
        "doc_id",
        "text",
    )
    pairs = pairs_from_index(idx, jaccard_threshold=_SWEEP_FLOOR)
    return (
        pairs.select(
            F.floor(F.col("jaccard") * 10).cast("long").alias("decile"),
            F.floor(F.col("jaccard") * 1000000).cast("long").alias("jfp"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("jfp").cast("long").alias("sum_jaccard_fp"),
        )
        .transform(present_sorted, "decile")
    )


def _dup_pos_oracle() -> str:
    from msgvault_spark.dedup.substrings import dup_position_oracle_sql

    return dup_position_oracle_sql(w=_SPAN_W)


@register("dup_position_profile", _dup_pos_oracle())
def dup_position_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE duplication lives inside documents: duplicated 8-shingle
    starts bucketed into each doc's lead/body/tail third — lead- or
    tail-heavy mass says "strip headers/footers", uniform mass says
    "span-delete".  Shares the dup-start ETL artifact with the span
    coverage/deletion entries; the profile is one map + a 3-row rollup
    (dedup/substrings.py:dup_position_profile)."""
    from msgvault_spark.dedup.substrings import (
        dup_position_profile as _profile,
        duplicated_starts,
    )
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.sources.cache import get_artifact

    docs = load_table(spark, sf_dir, "documents")
    marked = get_artifact(
        spark,
        (sf_dir, "dup_spans", _SPAN_W),
        lambda: duplicated_starts(docs, "doc_id", "text", w=_SPAN_W),
    )
    return _profile(marked, w=_SPAN_W).transform(present_sorted, "third")


# ---------------------------------------------------------------------------
# batch 16: UniMax budget allocation
# ---------------------------------------------------------------------------

_UNIMAX_CAP_PPM = 700000   # cap each source at 0.7 epochs of its own data
_UNIMAX_BUDGET_PPM = 800000  # spend 80% of the corpus token mass


def _unimax_oracle() -> str:
    from msgvault_spark.operators.unimax import unimax_oracle_sql

    tokens_sql = """
SELECT source, CAST(SUM(n) AS BIGINT) AS tokens FROM (
    SELECT source,
           len(list_filter(string_split_regex(lower(COALESCE(text, '')),
               '[^a-z0-9]+'), x -> x != '')) AS n
    FROM documents
) GROUP BY source"""
    return unimax_oracle_sql(
        tokens_sql,
        budget_expr=f"(tot.t * {_UNIMAX_BUDGET_PPM}) // 1000000",
        cap_ppm=_UNIMAX_CAP_PPM,
    )


@register("unimax_budget_plan", _unimax_oracle())
def unimax_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax sampling (Chung et al. 2023): spread 80% of the corpus
    token budget UNIFORMLY across sources with a 0.7-epoch per-source
    cap — the fairer alternative to temperature mixing (which this
    catalog also carries) for multilingual/multi-source pretraining.
    The waterfill is exact integer algebra via ONE prefix-sum window
    over the S-row source table (capped set is a prefix of the
    cap-ascending order); the only corpus-scale work is the per-source
    token count, served from the postings artifact
    (operators/unimax.py)."""
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.operators.unimax import unimax_plan
    from msgvault_spark.sources.cache import get_scalar, get_text_index

    postings, _stats = get_text_index(
        spark, sf_dir, "documents", "doc_id", "text"
    )
    docs = load_table(spark, sf_dir, "documents")
    counted = (
        postings.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.sum("tf").cast("long").alias("tokens"))
    )
    # anchor on the full source domain: a source whose documents all
    # tokenize to zero tokens has no postings rows but must still appear
    # (tokens 0, cap 0, alloc 0) — the oracle scans documents and emits
    # it, so dropping it here would be a row-count parity failure (the
    # degenerate-document rule)
    st = (
        docs.select("source")
        .distinct()
        .join(counted, "source", "left")
        .select(
            "source", F.coalesce(F.col("tokens"), F.lit(0)).alias("tokens")
        )
    )
    total = get_scalar(
        spark,
        (sf_dir, "corpus_token_total"),
        lambda: st.agg(F.sum("tokens")).head()[0],
    )
    budget = int(total) * _UNIMAX_BUDGET_PPM // 1000000
    return unimax_plan(
        st, budget=budget, cap_ppm=_UNIMAX_CAP_PPM
    ).transform(present_sorted, "source")


# ---------------------------------------------------------------------------
# batch 18: LSH banding recall sweep
# ---------------------------------------------------------------------------

_BAND_CONFIGS = (3, 4, 6)  # bands over the 12-hash signature (rows 4/3/2)
_BAND_TRUTH = 12           # rows=1: any shared minhash proposes — the
                           # highest-recall banding of this signature;
                           # verified pairs under it are the truth set


def _band_sweep_oracle() -> str:
    from msgvault_spark.dedup.minhash import minhash_oracle_sql

    def cnt(bands: int) -> str:
        inner = minhash_oracle_sql(
            "SELECT doc_id, text FROM documents",
            bands=bands,
            jaccard_threshold=0.5,
        ).strip()
        return f"(SELECT CAST(COUNT(*) AS BIGINT) FROM ({inner}))"

    truth = cnt(_BAND_TRUTH)
    legs = " UNION ALL ".join(
        f"""(SELECT {b} AS bands, {12 // b} AS rows_per_band,
        {truth} AS n_true, {cnt(b)} AS n_found)"""
        for b in _BAND_CONFIGS
    )
    return f"""
SELECT CAST(bands AS BIGINT) AS bands,
       CAST(rows_per_band AS BIGINT) AS rows_per_band,
       n_true, n_found,
       (n_found * 1000000) // n_true AS recall_ppm
FROM ({legs}) ORDER BY bands
"""


@register("lsh_band_recall_sweep", _band_sweep_oracle())
def lsh_band_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash banding tuning curve: verified near-dup pairs
    (jaccard ≥ 0.5) recovered at 3/4/6 bands of the 12-hash signature,
    against the rows=1 truth set (any shared minhash proposes — the
    highest-recall banding this signature affords; every coarser
    banding's verified pairs are a subset, so the ratio IS the banding
    recall).  More bands = higher recall = more candidate volume: this
    is the number that sets the production (bands, rows) before a 100 TB
    dedup commits to it — the propose-side twin of
    dedup_threshold_sweep's verify-side curve.  At scale each config's
    band index is an ETL artifact; here each leg is one index + one
    bucket self-join at eval cost."""
    from msgvault_spark.dedup.minhash import (
        build_minhash_index,
        pairs_from_index,
    )
    from msgvault_spark.operators.present import present_sorted

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def verified_count(bands: int):
        idx = build_minhash_index(docs, "doc_id", "text", bands=bands)
        return pairs_from_index(idx, jaccard_threshold=0.5).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )

    truth = verified_count(_BAND_TRUTH).select(F.col("c").alias("n_true"))
    legs = []
    for b in _BAND_CONFIGS:
        legs.append(
            verified_count(b).select(
                F.lit(b).cast("long").alias("bands"),
                F.lit(12 // b).cast("long").alias("rows_per_band"),
                F.col("c").alias("n_found"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    # ONE 1-row truth broadcast against the unioned 3-row leg table (the
    # W1 total pattern) — not one cross join per leg
    return (
        out.crossJoin(F.broadcast(truth))
        .withColumn("recall_ppm", F.expr("(n_found * 1000000) div n_true"))
        .select(
            "bands", "rows_per_band", "n_true", "n_found", "recall_ppm"
        )
        .transform(present_sorted, "bands")
    )


# ---------------------------------------------------------------------------
# batch 19: ingest-volume anomaly screen
# ---------------------------------------------------------------------------


def _volume_anomaly_oracle() -> str:
    return """
WITH daily AS (
    SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
),
st AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS d,
           CAST(SUM(n) AS BIGINT) AS a,
           CAST(SUM(n * n) AS BIGINT) AS b
    FROM daily GROUP BY 1
)
SELECT dy.event_type, dy.day, dy.n,
       CASE WHEN st.d >= 2
                 AND (st.d * CAST(st.b AS DOUBLE)
                      - CAST(st.a AS DOUBLE) * CAST(st.a AS DOUBLE)) > 0
            THEN CAST(floor(
                 (CAST(dy.n AS DOUBLE) * st.d - CAST(st.a AS DOUBLE))
                 / (st.d * sqrt((st.d * CAST(st.b AS DOUBLE)
                                 - CAST(st.a AS DOUBLE)
                                   * CAST(st.a AS DOUBLE))
                                / (CAST(st.d AS DOUBLE) * (st.d - 1))))
                 * 1000 + 0.5) AS BIGINT)
            ELSE 0 END AS z_milli
FROM daily dy JOIN st USING (event_type)
ORDER BY dy.event_type, dy.day
"""


@register("volume_anomaly_days", _volume_anomaly_oracle())
def volume_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-volume anomaly screen: per (event_type, day), the z-score
    of that day's event count against the type's own daily distribution
    — the "did a connector break or double-fire" monitor a pipeline
    checks before trusting an ingest batch (the volume twin of the PSI
    content-drift gate).  Same engine-exact integer-stats z as
    quality_zscore_by_lang: n/Σx/Σx² exact longs, identical double
    trees, fixed-point milli floor.  One corpus (type, day) aggregate
    with map-side combine; the ≤T-row stats table broadcasts back."""
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.sources.cache import get_table as _load

    ev = _load(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
            .alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("d"),
        F.sum("n").cast("long").alias("a"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("b"),
    )
    d, a, b = F.col("d"), F.col("a").cast("double"), F.col("b").cast("double")
    var_num = d * b - a * a
    sd = F.sqrt(var_num / (d.cast("double") * (d - 1)))
    z = F.floor(
        (F.col("n").cast("double") * d - a) / (d * sd) * 1000 + 0.5
    ).cast("long")
    return (
        daily.join(F.broadcast(st), "event_type")
        .select(
            "event_type",
            "day",
            "n",
            F.when((d >= 2) & (var_num > 0), z)
            .otherwise(F.lit(0))
            .cast("long")
            .alias("z_milli"),
        )
        .transform(present_sorted, "event_type", "day")
    )


# ---------------------------------------------------------------------------
# batch 20: RFM customer segmentation
# ---------------------------------------------------------------------------

_T1 = 1 / 3
_T2 = 2 / 3


def _rfm_oracle() -> str:
    return f"""
WITH cust AS (
    SELECT o_custkey,
           CAST(date_diff('day', max(o_orderdate),
                (SELECT max(o_orderdate) FROM orders)) AS BIGINT) AS r_days,
           CAST(COUNT(*) AS BIGINT) AS f_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS m_cents
    FROM orders GROUP BY o_custkey
),
cuts AS (
    SELECT quantile_cont(r_days, {_T1!r}) AS r1,
           quantile_cont(r_days, {_T2!r}) AS r2,
           quantile_cont(f_orders, {_T1!r}) AS f1,
           quantile_cont(f_orders, {_T2!r}) AS f2,
           quantile_cont(m_cents, {_T1!r}) AS m1,
           quantile_cont(m_cents, {_T2!r}) AS m2
    FROM cust
),
scored AS (
    SELECT (CASE WHEN r_days <= r1 THEN 3 WHEN r_days <= r2 THEN 2
                 ELSE 1 END) * 100
         + (CASE WHEN f_orders <= f1 THEN 1 WHEN f_orders <= f2 THEN 2
                 ELSE 3 END) * 10
         + (CASE WHEN m_cents <= m1 THEN 1 WHEN m_cents <= m2 THEN 2
                 ELSE 3 END) AS segment,
           m_cents
    FROM cust CROSS JOIN cuts
)
SELECT CAST(segment AS BIGINT) AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(m_cents) AS BIGINT) AS sum_monetary_cents
FROM scored GROUP BY segment ORDER BY segment
"""


@register("rfm_segments", _rfm_oracle())
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (the classic recency/frequency/monetary
    BI operator): per-customer days-since-last-order, order count, and
    fixed-point monetary mass, each cut at exact terciles into a 1–3
    score, composed into the 27-cell segment code (333 = best).  Exact
    quantiles are the engine-parity recipe (F.percentile ==
    quantile_cont bit-for-bit); monetary sums are floor-cents longs.
    One customer-keyed aggregate; the tercile cutpoints are a 1-row
    broadcast."""
    from msgvault_spark.operators.present import present_sorted
    from msgvault_spark.sources.cache import get_scalar
    from msgvault_spark.sources.cache import get_table as _load

    orders = _load(spark, sf_dir, "orders")
    # the corpus max date is a catalog statistic captured once (the
    # corpus_stats pattern) and folded in as a literal — not a per-query
    # 1-row cross join
    mx = get_scalar(
        spark,
        (sf_dir, "orders_max_date"),
        lambda: orders.agg(F.max("o_orderdate")).head()[0],
    )
    cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.datediff(F.lit(mx), F.max("o_orderdate"))
            .cast("long")
            .alias("r_days"),
            F.count(F.lit(1)).cast("long").alias("f_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("m_cents"),
        )
    )
    cuts = cust.agg(
        F.percentile("r_days", F.lit(_T1)).alias("r1"),
        F.percentile("r_days", F.lit(_T2)).alias("r2"),
        F.percentile("f_orders", F.lit(_T1)).alias("f1"),
        F.percentile("f_orders", F.lit(_T2)).alias("f2"),
        F.percentile("m_cents", F.lit(_T1)).alias("m1"),
        F.percentile("m_cents", F.lit(_T2)).alias("m2"),
    )
    r = (
        F.when(F.col("r_days") <= F.col("r1"), 3)
        .when(F.col("r_days") <= F.col("r2"), 2)
        .otherwise(1)
    )
    f_ = (
        F.when(F.col("f_orders") <= F.col("f1"), 1)
        .when(F.col("f_orders") <= F.col("f2"), 2)
        .otherwise(3)
    )
    m = (
        F.when(F.col("m_cents") <= F.col("m1"), 1)
        .when(F.col("m_cents") <= F.col("m2"), 2)
        .otherwise(3)
    )
    return (
        cust.crossJoin(F.broadcast(cuts))
        .select(
            (r * 100 + f_ * 10 + m).cast("long").alias("segment"),
            "m_cents",
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("m_cents").cast("long").alias("sum_monetary_cents"),
        )
        .transform(present_sorted, "segment")
    )

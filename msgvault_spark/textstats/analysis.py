"""Text-analysis operators for LLM-data pipelines, all JVM-side.

Quality scoring, token counting, language-ID heuristics, and document
fingerprinting over a (id, text) corpus — the per-document feature pass a
training-data pipeline runs before filtering. Each is a narrow projection
or one aggregation: scales linearly, no shuffle except the stated groupBys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword-ratio
# language heuristic (expandable; ASCII-only on purpose so the same
# LIKE-matching runs anywhere)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
}


def words(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda w: w != "")


def token_count_whitespace(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.filter(F.split(text, r"\s+"), lambda w: w != ""))


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish proxy: count word-pieces + digits + punctuation runs the way
    a byte-pair tokenizer fragments text (regexp-extract-all, JVM-side)."""
    return F.size(
        F.regexp_extract_all(
            F.lower(text), F.lit(r"[a-z]{1,6}|[0-9]|[^a-z0-9\s]"), F.lit(0)
        )
    )


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword / uppercase ratios (reference-style
    quality gates for corpus filtering)."""
    n_chars = F.length(text)
    ws = words(text)
    n_words = F.size(ws)
    en_markers = list(LANG_MARKERS["en"])
    n_stop = F.size(F.filter(ws, lambda w: w.isin(en_markers)))
    n_punct = F.size(
        F.regexp_extract_all(text, F.lit(r"[!-/:-@\[-`{-~]"), F.lit(0))
    )
    n_upper = F.size(F.regexp_extract_all(text, F.lit("[A-Z]"), F.lit(0)))
    nc = n_chars.cast("double")
    return {
        "n_chars": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "mean_word_len": F.round(
            F.when(
                n_words > 0,
                F.aggregate(
                    ws, F.lit(0.0), lambda acc, w: acc + F.length(w)
                )
                / n_words,
            ).otherwise(F.lit(0.0)),
            6,
        ),
        "stopword_ratio": F.round(
            F.when(n_words > 0, n_stop / n_words.cast("double")).otherwise(0.0), 6
        ),
        "punct_ratio": F.round(
            F.when(n_chars > 0, n_punct / nc).otherwise(0.0), 6
        ),
        "upper_ratio": F.round(
            F.when(n_chars > 0, n_upper / nc).otherwise(0.0), 6
        ),
    }


def quality_score(text: Column) -> Column:
    """Composite 0..1 quality score: words present, sane word length,
    punctuation not dominating. Deterministic integer/ratio math."""
    f = quality_features(text)
    word_ok = F.when(
        (f["mean_word_len"] >= 2) & (f["mean_word_len"] <= 12), 1.0
    ).otherwise(0.0)
    punct_ok = F.when(f["punct_ratio"] <= 0.2, 1.0).otherwise(0.0)
    length_ok = F.when(f["n_chars"] >= 100, 1.0).otherwise(0.0)
    return F.round((word_ok + punct_ok + length_ok) / 3.0, 6)


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratio."""
    ws = words(text)
    n = F.size(ws)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        out[lang] = _marker_ratio(ws, n, list(markers))
    return out


def _marker_ratio(ws: Column, n: Column, markers: list[str]) -> Column:
    # single-arg lambda on purpose: a second (even defaulted) parameter makes
    # PySpark pass the array index as an argument
    hits = F.size(F.filter(ws, lambda w: w.isin(markers)))
    return F.when(n > 0, hits / n.cast("double")).otherwise(0.0)


def detect_language(text: Column) -> Column:
    """argmax over lang_scores, 'und' when nothing scores > 0. Fold keeps
    the FIRST language on ties (strict >), so iteration order — sorted
    language codes — is the deterministic tie-break."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(score.alias("score"), F.lit(lang).alias("lang"))
            for lang, score in sorted(scores.items())
        ]
    )
    folded = F.aggregate(
        pairs,
        F.struct(F.lit(-1.0).alias("score"), F.lit("und").alias("lang")),
        lambda acc, s: F.when(s["score"] > acc["score"], s).otherwise(acc),
    )
    return F.when(folded["score"] > 0, folded["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint: md5 of casefolded,
    whitespace-collapsed text (rolling-hash analog, engine-portable)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def _stop_hits(ws: Column, markers: list[str]) -> Column:
    # closure keeps the filter lambda single-arg (see _marker_ratio note)
    return F.size(F.filter(ws, lambda w: w.isin(markers)))


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Full per-document profile: features + language + fingerprint.

    Staged selects so every shared subexpression — the lowered word array,
    the per-language stopword hit counts, the rounded ratios — is computed
    ONCE and referenced by name downstream. The naive composition
    (quality_score re-deriving quality_features, four lang filters each
    re-splitting the text) evaluates the split ~10× per row; Catalyst's
    CollapseProject keeps non-cheap multi-referenced projections staged, so
    this shape really does the work once. Values are bit-identical to the
    single-select composition (same expressions, same fold order)."""
    t = F.col(text_col)
    s1 = df.select(
        F.col(id_col).alias("doc_id"),
        t.alias("_t"),
        words(t).alias("_ws"),
    )
    tt, ws = F.col("_t"), F.col("_ws")
    markers = {k: list(v) for k, v in LANG_MARKERS.items()}
    s2 = s1.select(
        "doc_id",
        F.length(tt).alias("_n_chars"),
        F.size(ws).alias("_n_words"),
        *[
            _stop_hits(ws, m).alias(f"_stop_{k}")
            for k, m in markers.items()
        ],
        F.size(
            F.regexp_extract_all(tt, F.lit(r"[!-/:-@\[-`{-~]"), F.lit(0))
        ).alias("_n_punct"),
        F.size(F.regexp_extract_all(tt, F.lit("[A-Z]"), F.lit(0))).alias(
            "_n_upper"
        ),
        F.aggregate(ws, F.lit(0.0), lambda acc, w: acc + F.length(w)).alias(
            "_word_chars"
        ),
        token_count_whitespace(tt).alias("ws_tokens"),
        token_count_bpe_ish(tt).alias("bpe_tokens"),
        fingerprint(tt).alias("fingerprint"),
    )
    n_chars, n_words = F.col("_n_chars"), F.col("_n_words")
    nw_d, nc_d = n_words.cast("double"), n_chars.cast("double")
    s3 = s2.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.round(
            F.when(n_words > 0, F.col("_word_chars") / n_words).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("mean_word_len"),
        F.round(
            F.when(n_words > 0, F.col("_stop_en") / nw_d).otherwise(0.0), 6
        ).alias("stopword_ratio"),
        F.round(
            F.when(n_chars > 0, F.col("_n_punct") / nc_d).otherwise(0.0), 6
        ).alias("punct_ratio"),
        F.round(
            F.when(n_chars > 0, F.col("_n_upper") / nc_d).otherwise(0.0), 6
        ).alias("upper_ratio"),
        "ws_tokens",
        "bpe_tokens",
        *[
            F.when(n_words > 0, F.col(f"_stop_{k}") / nw_d)
            .otherwise(0.0)
            .alias(f"_s_{k}")
            for k in markers
        ],
        "fingerprint",
    )
    # language argmax, first-max-wins in sorted code order (de,en,es,fr) —
    # the same tie-break as detect_language's fold
    s_de, s_en = F.col("_s_de"), F.col("_s_en")
    s_es, s_fr = F.col("_s_es"), F.col("_s_fr")
    lang = (
        F.when(
            (s_de >= s_en) & (s_de >= s_es) & (s_de >= s_fr) & (s_de > 0),
            F.lit("de"),
        )
        .when((s_en >= s_es) & (s_en >= s_fr) & (s_en > 0), F.lit("en"))
        .when((s_es >= s_fr) & (s_es > 0), F.lit("es"))
        .when(s_fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )
    quality = F.round(
        (
            F.when(
                (F.col("mean_word_len") >= 2) & (F.col("mean_word_len") <= 12),
                1.0,
            ).otherwise(0.0)
            + F.when(F.col("punct_ratio") <= 0.2, 1.0).otherwise(0.0)
            + F.when(F.col("n_chars") >= 100, 1.0).otherwise(0.0)
        )
        / 3.0,
        6,
    )
    return s3.select(
        "doc_id",
        "n_chars",
        "n_words",
        "mean_word_len",
        "stopword_ratio",
        "punct_ratio",
        "upper_ratio",
        "ws_tokens",
        "bpe_tokens",
        quality.alias("quality"),
        lang.alias("lang_guess"),
        "fingerprint",
    )


# ---------------------------------------------------------------------------
# repetition / boilerplate filters (Gopher-rule family, Rae et al. 2021)
# ---------------------------------------------------------------------------


def duplicate_line_fraction(text: Column) -> Column:
    """Fraction of lines that are repeats of an earlier line — the
    boilerplate signal (nav bars, cookie banners repeat; prose doesn't).
    JVM-side: split → dedup → size arithmetic, no shuffle."""
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    n = F.size(lines)
    return F.when(n > 0, (n - F.size(F.array_distinct(lines))) / n).otherwise(0.0)


def duplicate_word_fraction(text: Column) -> Column:
    """Fraction of word occurrences beyond each word's first — high for
    keyword-stuffed / template text."""
    ws = words(text)
    n = F.size(ws)
    return F.when(n > 0, (n - F.size(F.array_distinct(ws))) / n).otherwise(0.0)


def top_bigram_fraction(text: Column) -> Column:
    """Share of the text's word-bigram occurrences taken by its single most
    frequent bigram (Gopher caps this at 0.18 for 2-grams). Built from
    array ops + one aggregate expression — no explode, no shuffle."""
    ws = words(text)
    n = F.size(ws)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.element_at(ws, i + 1), F.element_at(ws, i + 2)),
        ),
    )
    top_count = F.aggregate(
        F.array_distinct(bigrams),
        F.lit(0),
        lambda acc, bg: F.greatest(
            acc, F.size(F.filter(bigrams, lambda x: x == bg))
        ),
    )
    return F.when(n >= 2, top_count / (n - 1)).otherwise(0.0)


def repetition_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document repetition features + a Gopher-style keep flag
    (dup-line < 0.30, dup-word < 0.40, top-bigram < 0.40 — permissive
    variants of the paper's thresholds)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.round(duplicate_line_fraction(t), 6).alias("dup_line_frac"),
        F.round(duplicate_word_fraction(t), 6).alias("dup_word_frac"),
        F.round(top_bigram_fraction(t), 6).alias("top_bigram_frac"),
    ).withColumn(
        "keep",
        (F.col("dup_line_frac") < 0.30)
        & (F.col("dup_word_frac") < 0.40)
        & (F.col("top_bigram_frac") < 0.40),
    )


def ngram_instances(text: Column, n: int = 3) -> Column:
    """ALL n-gram instances (with multiplicity — unlike
    dedup/minhash.word_shingles, which deduplicates per doc): the unit of
    the corpus-diversity measures below. Docs with 1..n-1 words yield
    their single whole-text gram (word_shingles' short-doc rule); docs
    with NO words (NULL text, no alphanumerics) yield an EMPTY array —
    explode drops them, and the oracle's three-way CASE matches. (The
    two-way form emitted a '' gram here, which DuckDB's list_aggregate
    turns into NULL — counted by COUNT(*) but not COUNT(DISTINCT), an
    engine-parity split on degenerate docs.)"""
    # let-bind the word array (single-element transform) so the
    # per-position lambda references a bound variable: interpreted HOF
    # lambdas re-evaluate captured subtrees per element, and the naive
    # F.slice(words(text), i, n) form re-ran the regex split at every
    # gram position — O(words²)/doc (same fix as minhash.word_shingles)
    def _grams(ws: Column) -> Column:
        return F.when(
            F.size(ws) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
            ),
        ).when(
            F.size(ws) >= 1, F.array(F.concat_ws(" ", ws))
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(words(text)), _grams), 1)


def ngram_diversity_by_group(
    df: DataFrame, group_col: str, text_col: str, *, n: int = 3
) -> DataFrame:
    """Type-token ratio of word n-grams per group — the standard corpus
    diversity diagnostic (low ratio = templated/self-repetitive source;
    the per-corpus complement of the per-document Gopher repetition
    filters above). Returns
    (group, total_ngrams, distinct_ngrams, diversity_ppm) with
    diversity_ppm = distinct·1e6 div total (integer, engine-exact).

    Scale shape: explode is a map; COUNT(DISTINCT gram) per group expands
    to a two-phase aggregate keyed by (group, gram) — the wide first
    phase absorbs gram skew map-side, and no per-group sort or window
    exists. At 100 TB swap the exact distinct for the per-source KMV
    sketch artifact (operators/kmv.py) — the ratio only needs ~1%
    accuracy to rank sources."""
    grams = df.select(
        F.col(group_col).alias("grp"),
        F.explode(ngram_instances(F.col(text_col), n)).alias("gram"),
    )
    return (
        grams.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_ngrams"),
            F.countDistinct("gram").cast("long").alias("distinct_ngrams"),
        )
        .withColumn(
            "diversity_ppm",
            F.expr("(distinct_ngrams * 1000000) div total_ngrams"),
        )
        # presentation order is the caller's (the catalog entry applies
        # present_sorted, which repartitions and re-sorts)
    )


def nll_scores_artifact(spark, sf_dir: str) -> DataFrame:
    """Persisted (doc_id, n_tokens, nll_micro) quality-score table over
    the documents FTS postings — the per-corpus-snapshot ETL artifact
    (sources/cache.get_artifact → the artifact_store lake). Four catalog
    entries consume NLL scores; before round 10 each re-derived the
    corpus aggregate inside its own plan (curriculum_decile_plan even
    twice: once for the cutpoints, once for the phase map). One
    materialized pass now serves them all — the shape a 100 TB curation
    pipeline runs, scoring once per snapshot."""
    from msgvault_spark.sources.cache import get_artifact, get_text_index

    def build() -> DataFrame:
        postings, _stats = get_text_index(
            spark, sf_dir, "documents", "doc_id", "text"
        )
        return unigram_nll_scores(postings)

    return get_artifact(spark, (sf_dir, "unigram_nll_scores"), build)


def unigram_nll_scores(postings: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, nll_micro) from an inverted-index postings table
    (doc_id, term, tf): mean negative log-likelihood under the corpus
    unigram distribution, as engine-exact fixed-point integers — the
    scoring core of catalog_dedup.unigram_quality_docs, factored out so
    relative-threshold filters can reuse it. Per-term contributions are
    floor(tf·ln(T/ctf)·1e6 + 0.5) (identical in both engines), the
    per-doc sum is order-free, the mean an integer division."""
    ctf = postings.groupBy("term").agg(F.sum("tf").cast("long").alias("ctf"))
    tot = ctf.agg(F.sum("ctf").cast("long").alias("t"))
    contrib = (
        postings.join(ctf, "term")
        .join(F.broadcast(tot))
        .select(
            "doc_id",
            "tf",
            F.floor(
                F.col("tf")
                * F.log(F.col("t").cast("double") / F.col("ctf"))
                * 1000000
                + 0.5
            ).cast("long").alias("cs"),
        )
    )
    return contrib.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.expr("CAST(sum(cs) AS BIGINT) div CAST(sum(tf) AS BIGINT)").alias(
            "nll_micro"
        ),
    )


_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]
_GOPHER_MIN_WORDS = 50
_GOPHER_MAX_WORDS = 100000
_GOPHER_SYMBOL_RE = r"#|\.\.\."


def gopher_rules(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, Table A1) as a per-document
    rule table: word count in [50, 100k]; mean word length in [3, 10];
    symbol-to-word ratio (# and ...) <= 0.1; >= 80% of words contain an
    alphabetic character; >= 2 distinct Gopher stop words present.  The
    published heuristic pretraining filter, next to the C4 and
    repetition entries.

    Engine-exact: every threshold is evaluated in integer cross-
    multiplied form (word_chars >= 3*n_words, 5*n_alpha >= 4*n_words,
    10*n_sym <= n_words) — no ratio is ever materialized as a float, so
    the rule flags and the keep bit hash identically in both engines.

    Scale shape: a pure map over one scan (stage-local, no shuffle); the
    word array and its counts are staged selects so the split runs once
    per row.
    """
    # NULL text must behave like empty text in BOTH engines (the
    # degenerate-document parity rule): without the guard Spark emits
    # NULL counts where the oracle's COALESCE emits 0
    t = F.coalesce(F.col(text_col), F.lit(""))
    s1 = df.select(
        F.col(id_col).alias("doc_id"), t.alias("_t"), words(t).alias("_ws")
    )
    ws = F.col("_ws")
    s2 = s1.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_words"),
        F.aggregate(
            ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).alias("word_chars"),
        F.size(
            F.regexp_extract_all(F.col("_t"), F.lit(_GOPHER_SYMBOL_RE), F.lit(0))
        ).cast("long").alias("n_sym"),
        F.size(F.filter(ws, lambda w: w.rlike("[a-z]")))
        .cast("long")
        .alias("n_alpha_words"),
        F.size(
            F.array_intersect(ws, F.array(*[F.lit(s) for s in _GOPHER_STOPS]))
        ).cast("long").alias("n_stop_distinct"),
    )
    nw = F.col("n_words")
    rules = {
        "r_wordcount": (nw >= _GOPHER_MIN_WORDS) & (nw <= _GOPHER_MAX_WORDS),
        "r_mean_word_len": (nw > 0)
        & (F.col("word_chars") >= 3 * nw)
        & (F.col("word_chars") <= 10 * nw),
        "r_symbol": (nw > 0) & (10 * F.col("n_sym") <= nw),
        "r_alpha": (nw > 0) & (5 * F.col("n_alpha_words") >= 4 * nw),
        "r_stopwords": F.col("n_stop_distinct") >= 2,
    }
    flags = [
        F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("int").alias(name)
        for name, cond in rules.items()
    ]
    s3 = s2.select(
        "doc_id", "n_words", "word_chars", "n_sym", "n_alpha_words",
        "n_stop_distinct", *flags,
    )
    keep = F.when(
        sum(F.col(n) for n in rules) == len(rules), F.lit(1)
    ).otherwise(F.lit(0))
    return s3.withColumn("keep", keep.cast("int"))


def gopher_oracle_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`gopher_rules` — same tokenizer as the
    text_profile oracle, same integer cross-multiplied thresholds."""
    stops = ", ".join(f"'{s}'" for s in _GOPHER_STOPS)
    return f"""
WITH w AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(COALESCE(text, '')),
                       '[^a-z0-9]+'), x -> x != '') AS ws,
           COALESCE(text, '') AS text
    FROM {table}
),
c AS (
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_words,
           CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))), 0)
                AS BIGINT) AS word_chars,
           CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS BIGINT)
               AS n_sym,
           CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
                AS BIGINT) AS n_alpha_words,
           CAST(len(list_intersect(ws, [{stops}])) AS BIGINT)
               AS n_stop_distinct
    FROM w
)
SELECT doc_id, n_words, word_chars, n_sym, n_alpha_words, n_stop_distinct,
       CAST(CASE WHEN n_words >= {_GOPHER_MIN_WORDS}
                  AND n_words <= {_GOPHER_MAX_WORDS}
                 THEN 1 ELSE 0 END AS INT) AS r_wordcount,
       CAST(CASE WHEN n_words > 0 AND word_chars >= 3 * n_words
                  AND word_chars <= 10 * n_words
                 THEN 1 ELSE 0 END AS INT) AS r_mean_word_len,
       CAST(CASE WHEN n_words > 0 AND 10 * n_sym <= n_words
                 THEN 1 ELSE 0 END AS INT) AS r_symbol,
       CAST(CASE WHEN n_words > 0 AND 5 * n_alpha_words >= 4 * n_words
                 THEN 1 ELSE 0 END AS INT) AS r_alpha,
       CAST(CASE WHEN n_stop_distinct >= 2 THEN 1 ELSE 0 END AS INT)
           AS r_stopwords,
       CAST(CASE WHEN n_words >= {_GOPHER_MIN_WORDS}
                  AND n_words <= {_GOPHER_MAX_WORDS}
                  AND n_words > 0 AND word_chars >= 3 * n_words
                  AND word_chars <= 10 * n_words
                  AND 10 * n_sym <= n_words
                  AND 5 * n_alpha_words >= 4 * n_words
                  AND n_stop_distinct >= 2
                 THEN 1 ELSE 0 END AS INT) AS keep
FROM c
ORDER BY doc_id
"""


def token_entropy_scores(postings: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, distinct_terms, entropy_micro, uniformity_ppm)
    from an inverted-index postings table (doc_id, term, tf): the doc's
    own unigram Shannon entropy H = Σ (tf/dl)·ln(dl/tf) — the
    SELF-referential quality feature next to unigram_nll_scores' corpus
    NLL (low entropy = token loops the corpus LM can still find fluent;
    uniformity = H / ln(dl) normalizes length away, 1e6 = all-distinct).

    Engine-exact: per-term contributions are floor(tf·ln(dl/tf)·1e6+0.5)
    (every ln argument one division of exact integers), the per-doc sum
    is order-free, entropy the integer division by dl, uniformity an
    all-integer ratio of two floored fixed points.  Zero-token docs have
    no postings row and are absent by construction on both engines.

    Scale shape: one doc-keyed self-rollup of the postings artifact plus
    the contribution map — no corpus table touched."""
    dls = postings.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("dl"),
        F.count(F.lit(1)).cast("long").alias("distinct_terms"),
    )
    contrib = postings.join(dls, "doc_id").select(
        "doc_id",
        F.floor(
            F.col("tf")
            * F.log(F.col("dl").cast("double") / F.col("tf"))
            * 1000000
            + 0.5
        )
        .cast("long")
        .alias("cs"),
    )
    s = contrib.groupBy("doc_id").agg(F.sum("cs").cast("long").alias("s"))
    ln_dl_micro = F.floor(
        F.log(F.col("dl").cast("double")) * 1000000 + 0.5
    ).cast("long")
    # uniformity scales entropy_micro (<= ln(dl)*1e6, ~2e7 for any real
    # document) rather than the raw sum s — (s * 1e6) overflows BIGINT
    # around 700k-token concatenation blobs, and the two engines fail
    # DIFFERENTLY there (Spark wraps, DuckDB raises); flooring to
    # entropy_micro first keeps every intermediate < 2e13
    return (
        dls.join(s, "doc_id")
        .select(
            "doc_id",
            F.col("dl").alias("n_tokens"),
            "distinct_terms",
            F.expr("s div dl").alias("entropy_micro"),
            ln_dl_micro.alias("_lnd"),
        )
        .withColumn(
            "uniformity_ppm",
            F.when(
                F.col("n_tokens") >= 2,
                F.expr("(entropy_micro * 1000000) div _lnd"),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .drop("_lnd")
    )

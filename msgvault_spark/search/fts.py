"""Full-text search: tokenized inverted index + explicit BM25 scoring.

The reference uses SQLite FTS5 (BM25 rank, AND-of-terms, prefix match;
internal/store/dialect_sqlite.go:31-57, internal/query/sqlite.go:1319-1346).
Spark has no FTS builtin, so this is a from-scratch design (SURVEY.md §7
phase 3): an inverted-index table built at ETL time —

    postings(doc_id, term, tf)        one row per distinct (doc, term)
    doc_stats(doc_id, dl)             tokens per doc
    corpus: N (docs), avgdl, df(term)

— and BM25 computed as a join + JVM-side score expression. At 100 TB the
postings table is partitioned by term-hash; a query touches only its terms'
postings (shuffle on doc_id of the candidate subset, never the corpus).

Scoring: Okapi BM25 with the Lucene idf variant
    idf  = ln(1 + (N - df + 0.5)/(df + 0.5))
    tfc  = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    score = Σ_terms idf*tfc          (k1=1.2, b=0.75)
AND-of-terms semantics: docs must match every query term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75

# lowercase alphanumeric tokens; mirrors a simple unicode61-ish tokenizer
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokenize_column(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) rows — lowercased, split on non-alphanumeric, empties
    dropped. JVM-side only (split/explode), no Python UDF."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                        TOKEN_SPLIT_RE)
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )


def build_inverted_index(
    df: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """ETL: postings(doc_id, term, tf) + doc_stats(doc_id, dl)."""
    tokens = tokenize_column(df, id_col, text_col)
    postings = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    doc_stats = tokens.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    return postings, doc_stats


def _contrib_sql(
    n_expr: str, avg_expr: str, variant: str = "lucene"
) -> str:
    """BM25 per-term contribution as SQL text, association IDENTICAL to
    the historical Column formulation (idf · tfc with Python-prefolded
    constants: K1+1, 1−B), so scores are bit-equal:

        ln(1 + ((N − df + .5) / (df + .5)))
          · ((tf · (K1+1)) / (tf + (K1 · ((1−B) + ((B · dl) / avgdl)))))

    ``variant='fts5'`` swaps the idf for SQLite FTS5's bm25() form
    (fts5_aux.c): plain Robertson idf WITHOUT the Lucene +1 inside the
    log, clamped to 1e-6 when ≤ 0 (terms present in over half the corpus
    would otherwise score negative) — a user migrating from the
    reference gets the reference's rank order under this variant. The
    tfc factor and k1=1.2 / b=0.75 are identical in both."""
    if variant == "fts5":
        raw = f"ln((({n_expr} - df + 0.5D) / (df + 0.5D)))"
        idf = f"(CASE WHEN {raw} <= 0.0D THEN 0.000001D ELSE {raw} END)"
    elif variant == "lucene":
        idf = f"ln(1.0D + (({n_expr} - df + 0.5D) / (df + 0.5D)))"
    else:
        raise ValueError(f"unknown bm25 variant: {variant}")
    return (
        f"{idf} * "
        f"((tf * {K1 + 1.0!r}D) / "
        f"(tf + ({K1!r}D * ({1.0 - B!r}D + (({B!r}D * dl) / {avg_expr})))))"
    )


def bm25_scores(
    postings: DataFrame,
    doc_stats: DataFrame,
    terms: list[str],
    *,
    round_to: int | None = None,
    corpus_stats: tuple[int, float] | None = None,
    candidate_filter=None,
    term_stats: DataFrame | None = None,
    variant: str = "lucene",
) -> DataFrame:
    """Score docs matching ALL ``terms``; returns (doc_id, score) unbounded —
    callers order/limit. Query terms are lowercased to match the index.
    ``variant='fts5'`` reproduces SQLite FTS5's bm25() weighting (see
    _contrib_sql) — reference-fidelity rank order; default stays Lucene.

    ``corpus_stats=(n_docs, avgdl)`` lets callers pass the constants an
    index build already knows (sources/cache.get_text_index memoizes them)
    so they fold into the score expression as literals instead of costing a
    per-query aggregate subplan.

    ``term_stats`` — the ETL-time (term, df) table (an FTS index stores
    document frequencies; sources/cache.get_term_stats memoizes it) —
    replaces the per-query df aggregation over candidate postings with a
    filtered broadcast of precomputed rows: one less shuffle per query,
    same numbers.

    ``candidate_filter`` (a Column predicate on doc_id) restricts WHICH docs
    may score while idf/df/avgdl stay GLOBAL — FTS5's behavior when the
    reference's `filtered` CTE constrains MATCH results (Q10,
    sqlitevec/fused.go:128-147)."""
    terms = sorted({t.lower() for t in terms})
    if not terms:
        raise ValueError("bm25_scores needs at least one term")

    if term_stats is not None:
        term_df = term_stats.filter(F.col("term").isin(*terms)).select(
            "term", "df"
        )
    else:
        term_df = (
            postings.filter(F.col("term").isin(*terms))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
        )

    matched = (
        postings.filter(F.col("term").isin(*terms))
        .join(F.broadcast(term_df), "term")
        # no broadcast hint on doc_stats: Catalyst auto-broadcasts it while
        # it is small; at corpus scale this stays a shuffle join of the
        # (tiny) candidate postings against doc_id-partitioned stats
        .join(doc_stats, "doc_id")
    )
    if candidate_filter is not None:
        matched = matched.filter(candidate_filter)
    # The score rides as ONE parsed SQL expression (same tree, explicit
    # parens mirror the Column-operator association exactly — equality is
    # test-pinned bitwise) instead of ~30 Py4J column-op round-trips per
    # plan build; corpus constants splice in as literals.
    if corpus_stats is not None:
        contrib = _contrib_sql(
            str(int(corpus_stats[0])), f"{float(corpus_stats[1])!r}D",
            variant,
        )
    else:
        n_docs_avgdl = doc_stats.agg(
            F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
        )
        matched = matched.crossJoin(F.broadcast(n_docs_avgdl))
        contrib = _contrib_sql("n_docs", "avgdl", variant)
    per_term = matched.select(
        "doc_id", "term", F.expr(contrib).alias("contribution")
    )
    scored = per_term.groupBy("doc_id").agg(
        F.sum("contribution").alias("score"),
        F.count(F.lit(1)).alias("terms_matched"),
    )
    # AND-of-terms: every query term present
    scored = scored.filter(F.col("terms_matched") == len(terms)).drop(
        "terms_matched"
    )
    if round_to is not None:
        scored = scored.withColumn("score", F.round(F.col("score"), round_to))
    return scored


def bm25_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query: str,
    k: int = 20,
    *,
    round_to: int | None = None,
) -> DataFrame:
    """One-shot convenience: build index + score + top-k with deterministic
    tie-break. For repeated queries, build the index once at ETL time."""
    postings, doc_stats = build_inverted_index(df, id_col, text_col)
    terms = [t for t in query.lower().split() if t]
    scored = bm25_scores(postings, doc_stats, terms, round_to=round_to)
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def bm25_oracle_sql(
    table: str, id_col: str, text_col: str, terms: list[str], k: int = 20,
    round_to: int = 6, candidate_where: str = "1=1",
    variant: str = "lucene",
) -> str:
    """The same computation as DuckDB SQL (for the correctness gate)."""
    terms = sorted({t.lower() for t in terms})
    terms_list = ", ".join(f"'{t}'" for t in terms)
    if variant == "fts5":
        raw = "ln((c.n_docs - t.df + 0.5) / (t.df + 0.5))"
        idf = f"(CASE WHEN {raw} <= 0.0 THEN 0.000001 ELSE {raw} END)"
    else:
        idf = "ln(1.0 + (c.n_docs - t.df + 0.5) / (t.df + 0.5))"
    return f"""
WITH tokens AS (
    SELECT {id_col} AS doc_id,
           unnest(string_split_regex(lower(COALESCE({text_col}, '')),
                  '{TOKEN_SPLIT_RE}')) AS term
    FROM {table}
),
tokens_clean AS (SELECT doc_id, term FROM tokens WHERE term != ''),
postings AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM tokens_clean GROUP BY 1, 2
),
doc_stats AS (SELECT doc_id, COUNT(*) AS dl FROM tokens_clean GROUP BY 1),
corpus AS (
    SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM doc_stats
),
term_df AS (
    SELECT term, COUNT(*) AS df FROM postings
    WHERE term IN ({terms_list}) GROUP BY 1
),
per_term AS (
    SELECT p.doc_id,
           {idf} *
           ((p.tf * ({K1} + 1)) /
            (p.tf + {K1} * (1 - {B} + {B} * d.dl / c.avgdl))) AS contribution
    FROM postings p
    JOIN term_df t USING (term)
    JOIN doc_stats d USING (doc_id)
    CROSS JOIN corpus c
    WHERE p.term IN ({terms_list}) AND ({candidate_where})
)
SELECT doc_id, round(SUM(contribution), {round_to}) AS score
FROM per_term
GROUP BY doc_id
HAVING COUNT(*) = {len(terms)}
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def bm25_scores_prefix(
    postings: DataFrame,
    doc_stats: DataFrame,
    tokens: list[str],
    *,
    round_to: int | None = None,
    corpus_stats: tuple[int, float] | None = None,
) -> DataFrame:
    """BM25 with FTS5-style prefix tokens: a trailing ``*`` makes the token
    match every indexed term sharing the prefix (reference term quoting
    sqlite.go:1325-1335; FTS5 `term*`).

    Prefix semantics (documented contract): each prefix token is ONE
    virtual query term — per doc its tf is the SUM of matching terms' tfs,
    its df the count of docs with ≥1 match. AND-of-terms counts each query
    token once. Exact tokens behave exactly as bm25_scores."""
    tokens = sorted({t.lower() for t in tokens})
    if not tokens:
        raise ValueError("bm25_scores_prefix needs at least one token")
    exacts = [t for t in tokens if not t.endswith("*")]
    prefixes = [t[:-1] for t in tokens if t.endswith("*") and len(t) > 1]
    # degenerate tokens (bare '*', empty) match nothing and must not count
    # toward the AND gate — otherwise terms_matched == len(tokens) can never
    # pass and results silently vanish (FTS5 rejects bare '*' as a syntax
    # error; mirror that)
    exacts = [t for t in exacts if t]
    n_usable = len(exacts) + len(prefixes)
    if n_usable == 0:
        raise ValueError(
            f"bm25_scores_prefix: no usable terms in {tokens!r} "
            "(bare '*' and empty tokens are not valid FTS terms)"
        )

    parts = []
    if exacts:
        parts.append(
            postings.filter(F.col("term").isin(*exacts)).select(
                "doc_id", F.col("term").alias("qterm"), "tf"
            )
        )
    for p in prefixes:
        parts.append(
            postings.filter(F.col("term").startswith(p))
            .groupBy("doc_id")
            .agg(F.sum("tf").alias("tf"))
            .select("doc_id", F.lit(p + "*").alias("qterm"), "tf")
        )
    matched = parts[0]
    for extra in parts[1:]:
        matched = matched.unionByName(extra)

    term_df = matched.groupBy("qterm").agg(F.count(F.lit(1)).alias("df"))
    matched = matched.join(F.broadcast(term_df), "qterm").join(
        doc_stats, "doc_id"
    )
    if corpus_stats is not None:
        matched = matched.withColumn(
            "n_docs", F.lit(int(corpus_stats[0]))
        ).withColumn("avgdl", F.lit(float(corpus_stats[1])))
    else:
        n_docs_avgdl = doc_stats.agg(
            F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
        )
        matched = matched.crossJoin(F.broadcast(n_docs_avgdl))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfc = (F.col("tf") * (K1 + 1)) / (
        F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        matched.select("doc_id", "qterm", (idf * tfc).alias("contribution"))
        .groupBy("doc_id")
        .agg(
            F.sum("contribution").alias("score"),
            F.count(F.lit(1)).alias("terms_matched"),
        )
        .filter(F.col("terms_matched") == n_usable)
        .drop("terms_matched")
    )
    if round_to is not None:
        scored = scored.withColumn("score", F.round(F.col("score"), round_to))
    return scored


def bm25_prefix_oracle_sql(
    table: str, id_col: str, text_col: str, tokens: list[str], k: int = 20,
    round_to: int = 6,
) -> str:
    """DuckDB replica of bm25_scores_prefix."""
    tokens = sorted({t.lower() for t in tokens})
    exacts = [t for t in tokens if not t.endswith("*")]
    prefixes = [t[:-1] for t in tokens if t.endswith("*") and len(t) > 1]
    branches = []
    if exacts:
        in_list = ", ".join(f"'{t}'" for t in exacts)
        branches.append(
            f"SELECT doc_id, term AS qterm, tf FROM postings "
            f"WHERE term IN ({in_list})"
        )
    for p in prefixes:
        branches.append(
            f"SELECT doc_id, '{p}*' AS qterm, SUM(tf) AS tf FROM postings "
            f"WHERE term LIKE '{p}%' GROUP BY doc_id"
        )
    matched_sql = " UNION ALL ".join(branches)
    return f"""
WITH tokens AS (
    SELECT {id_col} AS doc_id,
           unnest(string_split_regex(lower(COALESCE({text_col}, '')),
                  '{TOKEN_SPLIT_RE}')) AS term
    FROM {table}
),
tokens_clean AS (SELECT doc_id, term FROM tokens WHERE term != ''),
postings AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM tokens_clean GROUP BY 1, 2
),
doc_stats AS (SELECT doc_id, COUNT(*) AS dl FROM tokens_clean GROUP BY 1),
corpus AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM doc_stats),
matched AS ({matched_sql}),
term_df AS (SELECT qterm, COUNT(*) AS df FROM matched GROUP BY 1),
per_term AS (
    SELECT m.doc_id,
           ln(1.0 + (c.n_docs - t.df + 0.5) / (t.df + 0.5)) *
           ((m.tf * ({K1} + 1)) /
            (m.tf + {K1} * (1 - {B} + {B} * d.dl / c.avgdl))) AS contribution
    FROM matched m
    JOIN term_df t USING (qterm)
    JOIN doc_stats d USING (doc_id)
    CROSS JOIN corpus c
)
SELECT doc_id, round(SUM(contribution), {round_to}) AS score
FROM per_term
GROUP BY doc_id
HAVING COUNT(*) = {len(tokens)}
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Phrase queries (round 2): positional postings + adjacency intersection
# ---------------------------------------------------------------------------
#
# The reference's parser accepts "quoted phrases" (internal/search/
# parser.go:197,243-247) and FTS5 matches them positionally. Spark twin:
# a positional postings table and an adjacency fold —
#
#     positions(doc_id, term, pos[])     pos = ordinal among non-empty tokens
#     phrase(t1..tn) matches doc  ⇔  fold of
#         cur := pos(t1);  cur := intersect(cur+1, pos(t2)); ...
#     is non-empty; |cur| = number of phrase occurrences.
#
# The fold is n-1 equi-joins on doc_id over TERM-PRUNED postings (the same
# pruning BM25 does), so the joined frames are each one term's posting
# list, never the corpus. Positions arrays are per-(doc, term) — bounded
# by document length.


def tokenize_with_positions(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, pos, term): pos is the 1-based ordinal among NON-EMPTY
    tokens (filter before posexplode, so dropped empties never shift
    later positions differently across engines)."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), TOKEN_SPLIT_RE),
        lambda t: t != "",
    )
    return df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")


def build_positional_index(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """ETL: (doc_id, term, positions array<int> sorted ascending)."""
    return (
        tokenize_with_positions(df, id_col, text_col)
        .groupBy("doc_id", "term")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
    )


def phrase_occurrences(
    pos_index: DataFrame, phrase_terms: list[str]
) -> DataFrame:
    """(doc_id, n_occurrences) for docs containing the exact phrase.
    Inner joins make every term mandatory; the adjacency fold runs as one
    projection over bound position-array columns."""
    if not phrase_terms:
        raise ValueError("empty phrase")
    terms = [t.lower() for t in phrase_terms]
    out = (
        pos_index.filter(F.col("term") == terms[0])
        .select("doc_id", F.col("positions").alias("p_0"))
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = pos_index.filter(F.col("term") == t).select(
            "doc_id", F.col("positions").alias(f"p_{i}")
        )
        out = out.join(nxt, "doc_id")
    cur = F.col("p_0")
    for i in range(1, len(terms)):
        cur = F.array_intersect(
            F.transform(cur, lambda x: x + 1), F.col(f"p_{i}")
        )
    return (
        out.select("doc_id", F.size(cur).alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 0)
    )


def phrase_oracle_sql(
    table: str, id_col: str, text_col: str, phrase_terms: list[str],
) -> str:
    """DuckDB replica: positions via list indexing over range(), the same
    shifted-intersection fold."""
    terms = [t.lower() for t in phrase_terms]
    terms_list = ", ".join(f"'{t}'" for t in terms)
    cur = "p_0"
    for i in range(1, len(terms)):
        cur = f"list_intersect(list_transform({cur}, x -> x + 1), p_{i})"
    joins = "\n".join(
        f"JOIN pos p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.term = '{terms[i]}'"
        for i in range(1, len(terms))
    )
    sel_pos = ",\n       ".join(
        f"p{i}.positions AS p_{i}" for i in range(len(terms))
    )
    return f"""
WITH toks AS (
    SELECT {id_col} AS doc_id,
           list_filter(string_split_regex(lower(COALESCE({text_col}, '')),
                       '{TOKEN_SPLIT_RE}'), x -> x != '') AS t
    FROM {table}
),
tok_idx AS (
    SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM toks
),
tok_pos AS (
    SELECT doc_id, CAST(i AS INT) AS pos, t[i] AS term FROM tok_idx
),
pos AS (
    SELECT doc_id, term, list_sort(list(pos)) AS positions
    FROM tok_pos WHERE term IN ({terms_list})
    GROUP BY doc_id, term
),
folded AS (
    SELECT p0.doc_id,
       {sel_pos}
    FROM pos p0
    {joins}
    WHERE p0.term = '{terms[0]}'
)
SELECT doc_id, CAST(len({cur}) AS INT) AS n_occurrences
FROM folded
WHERE len({cur}) > 0
"""

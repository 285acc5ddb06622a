"""Iterative BPE merge training (Sennrich et al. 2016) — k merge rounds
over the corpus vocabulary, engine-exact.

bpe_merge_candidates scores round-1 candidates; this module runs the
actual training loop: per round, count adjacent SYMBOL pairs over the
current segmentation (weighted by term frequency), take the argmax
(count desc, pair asc — the deterministic tie-break real tokenizers
pin), and apply the merge to every term.

The trick that keeps merge APPLICATION declarative in both engines:
terms are carried as double-separated symbol strings

    ``;;h;;e;;l;;l;;o;;``

and a merge of (a, b) is one literal ``replace(s, ';a;;b;', ';ab;')``.
A single-pass left-to-right non-overlapping string replace — which is
exactly what Spark's and DuckDB's ``replace`` are — is PRECISELY BPE's
greedy merge order: consuming one separator from each side of the match
leaves the neighbor's boundary intact, so back-to-back occurrences
(`a b a b`) both merge, while overlapping ones (`a a a` under (a,a))
merge left-first — byte-identical in both engines, no UDF, no loop over
rows. Symbols are [a-z0-9]+ by tokenization, so ';' never collides.

Scale shape: all rounds run on the VOCABULARY (term, freq) table — an
ETL artifact, thousands of rows at any corpus size — never the corpus;
each round is one vocab-sized pair aggregate + one argmax. The per-round
argmax is a bounded 1-row collect folded into the next round's plan as
literals (the k-means centroid pattern, sanctioned bounded driver
state); the DuckDB oracle instead computes each argmax in unrolled CTEs
and applies the identical replace, so the learned merge table
hash-matches.

Reference: the msgvault engine has no tokenizer training (extension
surface); published shape is Sennrich et al. 2016 §3.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEP = ";"


def _wrap(term_col):
    """'hello' → ';;h;;e;;l;;l;;o;;' (each char double-delimited)."""
    return F.concat(F.lit(SEP * 2), F.regexp_replace(term_col, "(.)", "$1;;"))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(left_sym, right_sym, freq): adjacent symbol pairs over the
    current segmentation, weighted by term frequency. SELECT the symbol
    array into a column first, then zip it with its own shift — zip_with
    arguments evaluate once (never the per-element capture re-evaluation
    hazard an element_at(syms, i) lambda has)."""
    staged = vocab.select(
        F.filter(F.split(F.col("s"), SEP * 2), lambda x: x != "").alias(
            "sy"
        ),
        "freq",
    )
    n = F.size(F.col("sy"))
    pairs = F.zip_with(
        F.slice(F.col("sy"), 1, F.greatest(n - 1, F.lit(0))),
        F.slice(F.col("sy"), 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        staged.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(
            F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
        )
        .agg(F.sum("freq").cast("long").alias("freq"))
    )


def bpe_train_merges(
    docs: DataFrame,
    *,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    ctf: DataFrame | None = None,
) -> DataFrame:
    """(round, left, right, freq): the first ``k`` merges a BPE tokenizer
    learns on this corpus, with the pair's corpus count at the time it
    was chosen. Pass ``ctf`` (term, freq) to train from a memoized vocab
    artifact instead of re-tokenizing."""
    from msgvault_spark.textstats.analysis import words

    if ctf is None:
        toks = docs.select(
            F.explode(
                words(F.coalesce(F.col(text_col), F.lit("")))
            ).alias("term")
        )
        ctf = toks.groupBy("term").agg(
            F.count(F.lit(1)).cast("long").alias("freq")
        )
    vocab = ctf.select(_wrap(F.col("term")).alias("s"), "freq")

    spark = docs.sparkSession
    out_rows = []
    for r in range(1, k + 1):
        # bounded 1-row collect: the argmax merge of this round (the
        # k-means-centroid pattern — vocab-sized input, single-row state)
        top = (
            _pair_counts(vocab)
            .orderBy(
                F.col("freq").desc(),
                F.col("left_sym").asc(),
                F.col("right_sym").asc(),
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, f = top[0]["left_sym"], top[0]["right_sym"], top[0]["freq"]
        # symbols splice into a SQL replace literal: enforce the charset
        # invariant the default tokenizer guarantees, because a caller's
        # ctf may have been built with a different tokenizer (a quote
        # would break the expression; a ';' would corrupt segmentation)
        import re

        if not re.fullmatch(r"[a-z0-9]+", a + b):
            raise ValueError(
                f"BPE symbols must be [a-z0-9]+ (got {a!r}, {b!r}); "
                "retokenize the ctf input"
            )
        out_rows.append((r, a, b, int(f)))
        vocab = vocab.select(
            F.expr(
                f"replace(s, '{SEP}{a}{SEP}{SEP}{b}{SEP}', "
                f"'{SEP}{a}{b}{SEP}')"
            ).alias("s"),
            "freq",
        )
    return spark.createDataFrame(
        out_rows, "round int, left_sym string, right_sym string, freq long"
    )


def bpe_encode_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, words, bpe_tokens, fertility_ppm): segment every word
    under the LEARNED merge list (applied in training order via the same
    double-separator replace chain) and report tokens-per-word fertility
    per group — the trained-tokenizer version of the regex proxy in
    token_fertility_report. Pure map + one group aggregate: the explode
    is per word, the replace chain is whole-stage codegen, linear at any
    corpus size."""
    from msgvault_spark.textstats.analysis import words

    per_word = docs.select(
        F.col(group_col).alias("source"),
        F.explode(
            words(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("w"),
    ).select("source", _wrap(F.col("w")).alias("s"))
    expr = "s"
    for a, b in merges:
        expr = (
            f"replace({expr}, '{SEP}{a}{SEP}{SEP}{b}{SEP}', "
            f"'{SEP}{a}{b}{SEP}')"
        )
    # symbols = semicolons/2 - 1 for the ';;x;;y;;' wrapping
    n_tokens = (
        (F.length(F.expr(expr)) - F.length(F.regexp_replace(F.expr(expr), SEP, "")))
        / 2
        - 1
    ).cast("long")
    return (
        per_word.select("source", n_tokens.alias("nt"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("words"),
            F.sum("nt").cast("long").alias("bpe_tokens"),
        )
        .select(
            "source",
            "words",
            "bpe_tokens",
            F.expr("(bpe_tokens * 1000000) div words")
            .cast("long")
            .alias("fertility_ppm"),
        )
    )


def bpe_encode_oracle_sql(source_select: str, *, k: int = 3) -> str:
    """DuckDB twin of train-then-encode: the unrolled merge CTEs feed a
    per-word replace chain (m1..mk cross-joined as 1-row scalars)."""
    # each merge rides a GUARDED 1-row CTE: aggregating over the LIMIT-1
    # m{r} yields exactly one row even when training ran dry before round
    # r (empty m{r} would annihilate the cross join → 0-row report while
    # the Spark side still encodes with the fewer learned merges); the
    # '' sentinel makes the replace pattern ';;;;' — an empty symbol
    # never occurs in the wrapping, so the pass is a no-op
    guards = ",\n".join(
        f"""mm{r} AS (
    SELECT COALESCE(MIN(left_s), '') AS left_s,
           COALESCE(MIN(right_s), '') AS right_s
    FROM m{r}
)"""
        for r in range(1, k + 1)
    )
    ctes = (
        "WITH "
        + ",\n".join(_train_ctes(source_select, k))
        + ",\n"
        + guards
    )
    expr = "pw.s"
    joins = []
    for r in range(1, k + 1):
        expr = (
            f"replace({expr}, ';' || mm{r}.left_s || ';;' || mm{r}.right_s "
            f"|| ';', ';' || mm{r}.left_s || mm{r}.right_s || ';')"
        )
        joins.append(f"CROSS JOIN mm{r}")
    return f"""{ctes},
per_word AS (
    SELECT source,
           ';;' || regexp_replace(w, '(.)', '\\1;;', 'g') AS s
    FROM (
        SELECT source,
               unnest(list_filter(string_split_regex(lower(COALESCE(text,
                      '')), '[^a-z0-9]+'), x -> x != '')) AS w
        FROM docs
    )
),
encoded AS (
    SELECT pw.source,
           (length({expr}) -
            length(replace({expr}, ';', ''))) // 2 - 1 AS nt
    FROM per_word pw {' '.join(joins)}
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS words,
       CAST(SUM(nt) AS BIGINT) AS bpe_tokens,
       CAST((SUM(nt) * 1000000) // COUNT(*) AS BIGINT) AS fertility_ppm
FROM encoded
GROUP BY source
ORDER BY source
"""


def bpe_oracle_sql(source_select: str, *, k: int = 3) -> str:
    """DuckDB twin: the same k rounds as unrolled CTEs — per round a
    vocab-sized pair aggregate, a 1-row argmax, and the identical
    double-separator replace applied via a cross join."""
    ctes = _train_ctes(source_select, k)
    selects = [
        f"SELECT {r} AS round, left_s AS left_sym, "
        f"right_s AS right_sym, f AS freq FROM m{r}"
        for r in range(1, k + 1)
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY round"
    )


def _train_ctes(source_select: str, k: int) -> list[str]:
    """The shared unrolled training CTE chain: docs/toks/ctf/v0, then per
    round syms/p/m/v — consumed by both the merge-table oracle and the
    encode oracle (no post-hoc string surgery)."""
    ctes = [
        f"""docs AS ({source_select}),
toks AS (
    SELECT unnest(list_filter(string_split_regex(lower(COALESCE(text, '')),
                  '[^a-z0-9]+'), x -> x != '')) AS term
    FROM docs
),
ctf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY 1),
v0 AS (
    SELECT ';;' || regexp_replace(term, '(.)', '\\1;;', 'g') AS s, freq
    FROM ctf
)"""
    ]
    for r in range(1, k + 1):
        prev = f"v{r - 1}"
        ctes.append(f"""syms{r} AS (
    SELECT list_filter(string_split(s, ';;'), x -> x != '') AS sy, freq
    FROM {prev}
),
p{r} AS (
    SELECT sy[i] AS left_s, sy[i + 1] AS right_s, freq
    FROM (SELECT sy, freq, unnest(generate_series(1, len(sy) - 1)) AS i
          FROM syms{r} WHERE len(sy) >= 2)
),
m{r} AS (
    SELECT left_s, right_s, CAST(SUM(freq) AS BIGINT) AS f
    FROM p{r} GROUP BY 1, 2
    ORDER BY f DESC, left_s ASC, right_s ASC LIMIT 1
),
v{r} AS (
    SELECT replace(s, ';' || left_s || ';;' || right_s || ';',
                   ';' || left_s || right_s || ';') AS s, freq
    FROM {prev} CROSS JOIN m{r}
)""")
    return ctes

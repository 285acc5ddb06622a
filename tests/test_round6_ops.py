"""Round-6 batch-4 operators: repeated-substring span coverage, integer
PageRank, nDCG eval, Stupid-Backoff bigram scoring. Catalog-entry
exactness is pinned by the DuckDB oracle gate (tools/verify_oracle.py);
these tests pin the semantics the hash compare can't express —
brute-force reference equality on adversarial shapes, and the algebraic
invariants of each operator."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from msgvault_spark.dedup.substrings import duplicated_span_coverage
from msgvault_spark.operators.pagerank import pagerank
from msgvault_spark.similarity.ndcg import (
    discount_nano,
    idcg_prefix_nano,
    ndcg_report,
)
from msgvault_spark.textstats.backoff import bigram_backoff_scores


# ---------------------------------------------------------------------------
# repeated-substring span coverage
# ---------------------------------------------------------------------------


def _py_span_coverage(texts: dict[int, str], w: int) -> dict[int, tuple]:
    """Brute-force reference: tokenize, shingle, count, interval-union."""
    toks = {
        d: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
        for d, s in texts.items()
    }
    counts: dict[tuple, int] = {}
    starts: dict[int, list[int]] = {}
    for d, ws in toks.items():
        for i in range(len(ws) - w + 1):
            counts[tuple(ws[i : i + w])] = (
                counts.get(tuple(ws[i : i + w]), 0) + 1
            )
    out = {}
    for d, ws in toks.items():
        if len(ws) < w:
            continue
        ss = [
            i
            for i in range(len(ws) - w + 1)
            if counts[tuple(ws[i : i + w])] >= 2
        ]
        covered: set[int] = set()
        for s in ss:
            covered.update(range(s, s + w))
        out[d] = (len(ws), len(ss), len(covered))
    return out


def test_span_coverage_matches_bruteforce_interval_union(spark):
    # doc 0 and 1 share an 11-token run (overlapping duplicated shingles
    # must union, not sum); doc 2 repeats its OWN phrase (intra-doc dup
    # counts); doc 3 is unique filler; doc 4 is below the shingle width.
    shared = "the quick brown fox jumps over the lazy dog every day"
    texts = {
        0: shared + " unique zero tail words here alpha beta gamma",
        1: "prefix one two three " + shared + " suffix four five",
        2: ("copy me now please again soon " * 3) + "tail x y z",
        3: "totally fresh words nobody else uses anywhere at all today",
        4: "short doc",
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_starts"], r["covered_tokens"])
        for r in duplicated_span_coverage(
            docs, "doc_id", "text", w=4, top_n=100
        ).collect()
    }
    want = _py_span_coverage(texts, 4)
    assert got == want
    assert 4 not in got  # below shingle width → not in the report
    assert want[2][2] > 0  # intra-doc repetition was detected
    assert want[3][2] == 0  # unique doc has zero coverage


def test_span_coverage_ppm_bounds_and_order(spark):
    rows = [(0, "a b c d a b c d a b c d"), (1, "p q r s t u v w x y")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicated_span_coverage(docs, "doc_id", "text", w=4).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert 0 < by_id[0]["covered_ppm"] <= 1_000_000
    assert by_id[1]["covered_ppm"] == 0
    # presentation order: most-covered first
    assert out[0]["doc_id"] == 0


# ---------------------------------------------------------------------------
# integer PageRank
# ---------------------------------------------------------------------------


def _py_pagerank(edges: list[tuple], iters: int = 5, d_pct: int = 85):
    sym = set()
    nodes = set()
    for a, b in edges:
        nodes.update((a, b))
        if a != b:
            sym.add((a, b))
            sym.add((b, a))
    deg = {n: 0 for n in nodes}
    for a, _ in sym:
        deg[a] += 1
    base = 1_000_000 - 1_000_000 * d_pct // 100
    r = {n: 1_000_000 for n in nodes}
    for _ in range(iters):
        inc = {n: 0 for n in nodes}
        for a, b in sym:
            if deg[a] > 0:
                inc[b] += r[a] // deg[a]
        r = {n: base + (d_pct * inc[n]) // 100 for n in nodes}
    return r


def test_pagerank_matches_python_reference_exactly(spark):
    # star + chain + triangle + a self-loop-only node: exercises hubs,
    # leaves, cycles, and the isolated-node branch in one graph
    edges = [
        (1, 2), (1, 3), (1, 4), (1, 5),
        (5, 6), (6, 7),
        (8, 9), (9, 10), (10, 8),
        (11, 11),
        (2, 1),  # duplicate reverse edge must collapse
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank_micro"] for r in pagerank(df).collect()
    }
    assert got == _py_pagerank(edges)


def test_pagerank_hub_outranks_leaves(spark):
    edges = [(1, k) for k in range(2, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_micro"] for r in pagerank(df).collect()}
    leaves = {got[k] for k in range(2, 8)}
    assert len(leaves) == 1  # symmetry: all leaves identical
    assert got[1] > leaves.pop()


# ---------------------------------------------------------------------------
# nDCG eval
# ---------------------------------------------------------------------------


def test_ndcg_constants_are_fixed_point_of_log2():
    disc = discount_nano(10)
    assert disc[0] == 1_000_000_000  # 1/log2(2)
    for i, d in enumerate(disc, start=1):
        assert d == int(math.floor(1e9 / math.log2(i + 1) + 0.5))
    prefix = idcg_prefix_nano(10)
    assert prefix[0] == 0 and prefix[3] == sum(disc[:3])


def test_ndcg_perfect_ranking_scores_one(spark):
    # label-0 cluster tightly around [1, 0]; label-1 around [0, 1].
    # Query 0 (label 0): all its relevant vectors rank above every
    # label-1 vector → DCG == IDCG → ndcg_ppm == 1_000_000 exactly.
    rows = [(0, [1.0, 0.01], 0), (1, [1.0, 0.02], 0), (2, [1.0, 0.03], 0)]
    rows += [(10 + i, [0.01 * (i + 1), 1.0], 1) for i in range(5)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        r["qid"]: r
        for r in ndcg_report(
            emb, emb.filter(F.col("vec_id") == 0), k=10
        ).collect()
    }
    assert out[0]["n_rel"] == 2
    assert out[0]["ndcg_ppm"] == 1_000_000


def test_ndcg_unique_label_scores_zero(spark):
    rows = [(0, [1.0, 0.0], 7)] + [
        (i, [0.5, 0.5], 1) for i in range(1, 6)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = ndcg_report(
        emb, emb.filter(F.col("vec_id") == 0), k=10
    ).collect()
    assert out[0]["n_rel"] == 0
    assert out[0]["idcg_nano"] == 0 and out[0]["ndcg_ppm"] == 0


# ---------------------------------------------------------------------------
# Stupid-Backoff bigram scoring
# ---------------------------------------------------------------------------


def _py_backoff(texts: dict[int, tuple[str, str]], ref_sources: set[str]):
    toks = {
        d: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
        for d, (s, src) in texts.items()
    }
    cb: dict[tuple, int] = {}
    cu: dict[str, int] = {}
    for d, (_, src) in texts.items():
        if src not in ref_sources:
            continue
        ws = toks[d]
        for a, b in zip(ws, ws[1:]):
            cb[(a, b)] = cb.get((a, b), 0) + 1
        for t in ws:
            cu[t] = cu.get(t, 0) + 1
    n, v = sum(cu.values()), len(cu)
    out = {}
    for d, ws in toks.items():
        grams = list(zip(ws, ws[1:]))
        if not grams:
            continue
        s = 0
        for a, b in grams:
            if (a, b) in cb:
                s += int(math.floor(math.log(cu[a] / cb[(a, b)]) * 1e6 + 0.5))
            else:
                s += int(
                    math.floor(
                        math.log((5 * (n + v)) / (2 * (cu.get(b, 0) + 1)))
                        * 1e6
                        + 0.5
                    )
                )
        out[d] = (len(grams), s // len(grams))
    return out


def test_backoff_matches_python_reference(spark):
    texts = {
        0: ("the cat sat on the mat", "ref"),
        1: ("the cat ate the fish", "ref"),
        2: ("the cat sat on the mat again", "raw"),  # mostly seen bigrams
        3: ("zx qv wq pl mn bv", "raw"),  # fully unseen → pure backoff
        4: ("solo", "raw"),  # one token → no bigrams → absent
    }
    docs = spark.createDataFrame(
        [(d, t, s) for d, (t, s) in texts.items()],
        "doc_id long, text string, source string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_micro"])
        for r in bigram_backoff_scores(docs, "source = 'ref'").collect()
    }
    assert got == _py_backoff(texts, {"ref"})
    assert 4 not in got


def test_backoff_fluent_text_beats_unseen_soup(spark):
    texts = {
        0: ("alpha beta gamma delta alpha beta gamma delta", "ref"),
        1: ("alpha beta gamma delta", "raw"),
        2: ("qq ww ee rr", "raw"),
    }
    docs = spark.createDataFrame(
        [(d, t, s) for d, (t, s) in texts.items()],
        "doc_id long, text string, source string",
    )
    got = {
        r["doc_id"]: r["nll_micro"]
        for r in bigram_backoff_scores(docs, "source = 'ref'").collect()
    }
    assert got[1] < got[2]  # in-model text scores lower NLL


# ---------------------------------------------------------------------------
# span deletion (clean_spans)
# ---------------------------------------------------------------------------


def _py_clean(texts: dict[int, str], w: int) -> dict[int, tuple]:
    import hashlib

    toks = {
        d: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
        for d, s in texts.items()
    }
    counts: dict[tuple, int] = {}
    for ws in toks.values():
        for i in range(len(ws) - w + 1):
            key = tuple(ws[i : i + w])
            counts[key] = counts.get(key, 0) + 1
    out = {}
    for d, ws in toks.items():
        if not ws:
            continue
        covered: set[int] = set()
        for i in range(len(ws) - w + 1):
            if counts[tuple(ws[i : i + w])] >= 2:
                covered.update(range(i, i + w))
        kept = [t for i, t in enumerate(ws) if i not in covered]
        out[d] = (
            len(ws),
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


def test_clean_spans_matches_bruteforce(spark):
    from msgvault_spark.dedup.substrings import clean_spans

    shared = "one two three four five six seven eight nine ten"
    texts = {
        0: "head words " + shared + " tail alpha",
        1: shared + " completely different ending here",
        2: "no duplicate content at all in this document",
        3: "tiny",
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["kept_tokens"], r["cleaned_hash"])
        for r in clean_spans(docs, "doc_id", "text", w=4).collect()
    }
    assert got == _py_clean(texts, 4)
    # the unduplicated doc keeps EVERY token (the empty-start-array edge
    # that silently deleted everything in the first oracle draft)
    assert got[2][1] == got[2][0]
    assert got[3] == _py_clean(texts, 4)[3]  # below shingle width: kept whole


def test_incremental_coverage_probes_index_only(spark):
    from msgvault_spark.dedup.substrings import (
        coverage_against_index,
        shingle_starts,
    )

    old = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),  # full copy
            (11, "fresh new words never seen before anywhere else"),
            # 12+13 duplicate EACH OTHER but not the index: must NOT count
            (12, "intra batch duplicate run apple pear plum fig"),
            (13, "intra batch duplicate run apple pear plum fig"),
        ],
        "doc_id long, text string",
    )
    idx = shingle_starts(old, "doc_id", "text", w=4).select("h").distinct()
    got = {
        r["doc_id"]: (r["covered_tokens"], r["n_tokens"])
        for r in coverage_against_index(
            batch, idx, "doc_id", "text", w=4
        ).collect()
    }
    assert got[10] == (8, 8)  # full copy fully covered
    assert got[11][0] == 0
    assert got[12][0] == 0 and got[13][0] == 0  # frozen index: intra-batch invisible


# ---------------------------------------------------------------------------
# triplet-margin eval
# ---------------------------------------------------------------------------


def test_triplet_margin_counts_inversions(spark):
    from msgvault_spark.similarity.triplet import triplet_margin_report

    # query 0 (label 0): its only positive (id 1) sits at cos≈0.707 while
    # two label-1 vectors sit closer — exactly 2 violations. Query 5
    # (label 2) has its positive nearest — 0 violations.
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 1.0], 0),        # best positive for q0
        (2, [1.0, 0.1], 1),        # closer than the positive
        (3, [1.0, 0.2], 1),        # closer than the positive
        (5, [0.0, 1.0], 2),
        (6, [0.01, 1.0], 2),       # best positive for q5, nearest overall
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        r["qid"]: (r["n_pos"], r["n_violations"])
        for r in triplet_margin_report(
            emb, emb.filter(F.col("vec_id").isin(0, 5))
        ).collect()
    }
    assert got[0] == (1, 2)
    assert got[5] == (1, 0)


def test_triplet_queries_without_positives_are_dropped(spark):
    from msgvault_spark.similarity.triplet import triplet_margin_report

    rows = [(0, [1.0, 0.0], 9)] + [(i, [0.5, 0.5], 1) for i in range(1, 4)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = triplet_margin_report(
        emb, emb.filter(F.col("vec_id") == 0)
    ).collect()
    assert out == []


# ---------------------------------------------------------------------------
# Zipf slope
# ---------------------------------------------------------------------------


def _py_zipf_slope(freqs: list[int], top_k: int = 100) -> float:
    from msgvault_spark.textstats.zipf import ln_rank_micro

    xs = ln_rank_micro(top_k)
    pts = [
        (xs[i], int(math.floor(math.log(f) * 1e6 + 0.5)))
        for i, f in enumerate(sorted(freqs, reverse=True)[:top_k])
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    return round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)


def test_zipf_slope_matches_python_reference_and_is_near_minus_one(spark):
    from msgvault_spark.textstats.zipf import zipf_slope_by_source

    zipf_freqs = [100000 // r for r in range(1, 51)]
    flat_freqs = [500] * 50
    rows = [("z", f"t{i}", f) for i, f in enumerate(zipf_freqs)]
    rows += [("flat", f"t{i}", f) for i, f in enumerate(flat_freqs)]
    tf = spark.createDataFrame(rows, "source string, term string, freq long")
    got = {
        r["source"]: r["slope"]
        for r in zipf_slope_by_source(tf, top_k=100).collect()
    }
    assert got["z"] == _py_zipf_slope(zipf_freqs)
    assert got["flat"] == 0.0
    assert -1.05 < got["z"] < -0.95


# ---------------------------------------------------------------------------
# MRR eval
# ---------------------------------------------------------------------------


def test_mrr_constants_are_fixed_point_reciprocals():
    from msgvault_spark.similarity.mrr import rr_nano

    rr = rr_nano(10)
    assert rr[0] == 1_000_000_000
    assert rr[1] == 500_000_000
    assert rr[2] == 333_333_333  # floor(1e9/3 + 0.5)
    for i, v in enumerate(rr, start=1):
        assert v == int(math.floor(1e9 / i + 0.5))


def test_mrr_first_hit_rank_and_no_positive_rows(spark):
    from msgvault_spark.similarity.mrr import mrr_report

    # query 0 (label 0): nearest neighbor is label-1, second is label-0
    # → first_rel_rank == 2, rr == 5e8.  query 1 (label 9, unique): no
    # relevant result anywhere → rank 0, rr 0, but the row still exists.
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.0, 1.0], 9),
        (2, [1.0, 0.001], 1),   # rank 1 for q0, wrong label
        (3, [1.0, 0.002], 0),   # rank 2 for q0, relevant
        (4, [0.5, 0.5], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        r["qid"]: r
        for r in mrr_report(
            emb, emb.filter(F.col("vec_id") < 2), k=10
        ).collect()
    }
    assert set(out) == {0, 1}
    assert out[0]["first_rel_rank"] == 2
    assert out[0]["rr_nano"] == 500_000_000
    assert out[0]["n_rel_topk"] == 1
    assert out[1]["first_rel_rank"] == 0
    assert out[1]["rr_nano"] == 0
    assert out[1]["n_rel_topk"] == 0


def test_mrr_perfect_first_hit(spark):
    from msgvault_spark.similarity.mrr import mrr_report

    rows = [(0, [1.0, 0.0], 0), (1, [1.0, 0.01], 0), (2, [0.0, 1.0], 1)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = mrr_report(
        emb, emb.filter(F.col("vec_id") == 0), k=10
    ).collect()
    assert out[0]["first_rel_rank"] == 1
    assert out[0]["rr_nano"] == 1_000_000_000


# ---------------------------------------------------------------------------
# Gopher quality rules
# ---------------------------------------------------------------------------


def test_gopher_rules_flags_and_keep(spark):
    from msgvault_spark.textstats.analysis import gopher_rules

    good = " ".join(["the quick brown fox and that have with of be"] * 6)
    short = "the and of that"                       # fails word count
    longwords = " ".join(["extraordinarily"] * 60)  # mwl 15 > 10, no stops
    symbols = ("the and that of be to have with " + "# " * 30
               + "word " * 50)                      # symbol ratio > 0.1
    df = spark.createDataFrame(
        [(0, good), (1, short), (2, longwords), (3, symbols)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_rules(df, "doc_id", "text").collect()}
    assert out[0]["keep"] == 1 and all(
        out[0][f] == 1
        for f in ("r_wordcount", "r_mean_word_len", "r_symbol", "r_alpha",
                  "r_stopwords")
    )
    assert out[1]["r_wordcount"] == 0 and out[1]["keep"] == 0
    assert out[1]["r_stopwords"] == 1  # the/and/of/that are 4 distinct stops
    assert out[2]["r_mean_word_len"] == 0 and out[2]["r_stopwords"] == 0
    assert out[3]["r_symbol"] == 0 and out[3]["keep"] == 0


def test_gopher_rules_integer_thresholds_are_exact(spark):
    from msgvault_spark.textstats.analysis import gopher_rules

    # exactly at the boundaries: 50 words, mean word length exactly 3
    # and exactly 10 must PASS (inclusive bounds, integer cross-multiply)
    at3 = " ".join(["the", "and"] + ["abc"] * 48)        # 50 words, mwl 3.0... not exact
    # build exact mwl 3: fifty 3-char words, but need 2 stopwords → 'the'
    # (3 chars) and 'and' (3 chars) keep it exact
    # exact mwl == 10: 'the'+'and' (6) + 46x10-char + 2x17-char = 500
    # chars over 50 words — the INCLUSIVE upper bound must pass
    seventeen = "abcdefghijklmnopq"
    at10 = " ".join(
        ["the", "and"] + ["abcdefghij"] * 46 + [seventeen] * 2
    )
    over10 = " ".join(
        ["the", "and"] + ["abcdefghij"] * 45 + ["abcdefghijk"]
        + [seventeen] * 2
    )  # 501 chars over 50 words — one char past the bound must fail
    df = spark.createDataFrame(
        [(0, at3), (1, at10), (2, over10)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in gopher_rules(df, "doc_id", "text").collect()}
    assert out[0]["n_words"] == 50 and out[0]["word_chars"] == 150
    assert out[0]["keep"] == 1
    assert out[1]["word_chars"] == 500 and out[1]["n_words"] == 50
    assert out[1]["r_mean_word_len"] == 1 and out[1]["keep"] == 1
    assert out[2]["word_chars"] == 501
    assert out[2]["r_mean_word_len"] == 0 and out[2]["keep"] == 0


# ---------------------------------------------------------------------------
# k-means cells
# ---------------------------------------------------------------------------


def test_kmeans_recovers_planted_clusters(spark):
    from msgvault_spark.similarity.ivf import (
        assign_cells,
        train_centroids_kmeans,
    )

    # two tight direction clusters; seeds (ids 0,1) start one per cluster
    rows = [(0, [1.0, 0.05]), (1, [0.05, 1.0])]
    rows += [(2 + i, [1.0, 0.1 + 0.01 * i]) for i in range(5)]
    rows += [(10 + i, [0.1 + 0.01 * i, 1.0]) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = train_centroids_kmeans(emb, n_cells=2, n_iter=2)
    out = (
        assign_cells(emb, cents)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), F.min("id").alias("mn"))
        .collect()
    )
    by_cell = {r["cell"]: r for r in out}
    assert by_cell[0]["n"] == 6 and by_cell[1]["n"] == 6
    assert by_cell[0]["mn"] == 0 and by_cell[1]["mn"] == 1


def test_kmeans_empty_cell_keeps_previous_centroid(spark):
    from msgvault_spark.similarity.ivf import train_centroids_kmeans

    # seed 1 duplicates seed 0, so every vector (including vector 1) ties
    # and breaks to the LOWER cell id — cell 1 is empty every round and
    # must keep its seed centroid verbatim
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0])] + [
        (2 + i, [1.0, 0.01 * i]) for i in range(4)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = {r["cid"]: r["cvec"] for r in
             train_centroids_kmeans(emb, n_cells=2, n_iter=3).collect()}
    assert set(cents) == {0, 1}
    assert cents[1] == [1.0, 0.0]  # untouched seed
    assert cents[0] != [1.0, 0.0]  # moved to the cluster mean


# ---------------------------------------------------------------------------
# edit-distance pair verification
# ---------------------------------------------------------------------------


def test_edit_distance_pairs_known_values(spark):
    # identical 40-word docs → dist 0, sim 1e6; one word swapped → dist =
    # word-length delta-bounded, sim < 1e6.  Texts share enough shingles
    # to survive the LSH propose + jaccard >= 0.5 verify.
    from msgvault_spark.dedup.minhash import (
        build_minhash_index,
        pairs_from_index,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    variant = base.replace("tok7 ", "tok7x ", 1)
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, variant)], "doc_id long, text string"
    )
    idx = build_minhash_index(docs, "doc_id", "text")
    pairs = pairs_from_index(idx, jaccard_threshold=0.5).select("id_a", "id_b")
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("text_a"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("text_b"))
    out = {
        (r["id_a"], r["id_b"]): r
        for r in b.join(F.broadcast(a.join(F.broadcast(pairs), "id_a")), "id_b")
        .select(
            "id_a", "id_b",
            F.levenshtein("text_a", "text_b").cast("long").alias("d"),
            F.greatest(F.length("text_a"), F.length("text_b"))
            .cast("long").alias("m"),
        )
        .collect()
    }
    assert out[(0, 1)]["d"] == 0
    assert out[(0, 2)]["d"] == 1  # one inserted char
    assert out[(0, 2)]["m"] == len(variant)


# ---------------------------------------------------------------------------
# span-corruption planning
# ---------------------------------------------------------------------------


def _py_span_plan(texts: dict[int, str], w: int, rate: int):
    import hashlib

    out = {}
    for d, s in texts.items():
        ws = [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
        if len(ws) < w:
            continue
        starts = [
            i
            for i in range(len(ws) - w + 1)
            if int(hashlib.md5(f"{d}:{i}".encode()).hexdigest()[:6], 16)
            % rate
            == 0
        ]
        covered: set[int] = set()
        spans = 0
        prev = None
        for s0 in starts:
            covered.update(range(s0, s0 + w))
            if prev is None or s0 - prev >= w:
                spans += 1
            prev = s0
        out[d] = (len(ws), len(starts), spans, len(covered))
    return out


def test_span_corruption_matches_python_reference(spark):
    from msgvault_spark.operators.spanmask import span_corruption_plan

    texts = {
        0: " ".join(f"w{i}" for i in range(120)),
        1: " ".join(f"x{i}" for i in range(60)),
        2: "too short",
        3: " ".join(f"y{i}" for i in range(200)),
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_starts"], r["n_spans"], r["masked_tokens"]
        )
        for r in span_corruption_plan(docs, w=3, rate=20).collect()
    }
    want = _py_span_plan(texts, 3, 20)
    assert got == want
    assert 2 not in got  # below span width → excluded like the telescope
    # the hash draw should land near 15% masked across the big docs
    tot = sum(v[0] for v in want.values())
    masked = sum(v[3] for v in want.values())
    assert 0.05 < masked / tot < 0.30


def test_span_corruption_adjacent_spans_keep_sentinels(spark):
    from msgvault_spark.operators.spanmask import span_corruption_plan

    # force the start set by checking the invariant algebraically instead:
    # masked_tokens <= n_spans * w and n_spans <= n_starts always hold
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(80))) for i in range(20)],
        "doc_id long, text string",
    )
    for r in span_corruption_plan(docs, w=3, rate=5).collect():
        assert r["n_spans"] <= r["n_starts"]
        # every merged span covers at least w tokens; every start adds
        # at most w new ones
        assert r["masked_tokens"] >= r["n_spans"] * 3
        assert r["masked_tokens"] <= r["n_starts"] * 3


# ---------------------------------------------------------------------------
# PSI drift
# ---------------------------------------------------------------------------


def test_psi_identical_halves_score_zero(spark):
    from msgvault_spark.operators.psi import psi_report

    rows = [(i, (i // 2) % 40) for i in range(200)]  # halves mirror exactly
    df = spark.createDataFrame(rows, "doc_id long, v long")
    out = psi_report(df, F.col("doc_id") % 2 == 0, F.col("v")).collect()
    assert len(out) == 13
    assert all(r["psi_nano"] == 0 for r in out)
    assert all(r["n_expected"] == r["n_actual"] for r in out)


def test_psi_shifted_distribution_is_positive_and_localized(spark):
    from msgvault_spark.operators.psi import psi_report

    # baseline concentrated in bucket 0 (v<8); actual shifted to bucket 5
    rows = [(2 * i, 3) for i in range(100)]          # expected: bucket 0
    rows += [(2 * i + 1, 45) for i in range(100)]    # actual: bucket 5
    df = spark.createDataFrame(rows, "doc_id long, v long")
    out = {r["bucket"]: r for r in
           psi_report(df, F.col("doc_id") % 2 == 0, F.col("v")).collect()}
    assert out[0]["n_expected"] == 100 and out[0]["n_actual"] == 0
    assert out[5]["n_actual"] == 100
    total = sum(r["psi_nano"] for r in out.values())
    assert total > 250_000_000  # PSI far beyond the 0.25 action line
    assert out[3]["psi_nano"] == 0  # untouched bucket contributes nothing


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------


def _py_pmi(texts: list[str], min_count: int, top_n: int):
    import math as m

    uni: dict[str, int] = {}
    cb: dict[tuple, int] = {}
    for s in texts:
        ws = [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
        for t in ws:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(ws, ws[1:]):
            cb[(a, b)] = cb.get((a, b), 0) + 1
    nu = sum(uni.values())
    nb = sum(cb.values())
    rows = []
    for (a, b), c in cb.items():
        if c < min_count:
            continue
        ratio = ((c * nu) / (uni[a] * uni[b])) * (nu / nb)
        rows.append((a, b, c, int(m.floor(m.log(ratio) * 1e9 + 0.5))))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:top_n]


def test_pmi_matches_python_reference_and_ranks_collocations(spark):
    from msgvault_spark.textstats.pmi import pmi_collocations

    # "san francisco" always co-occurs (true collocation); "the" is
    # frequent but promiscuous — frequency ranks "the x" pairs high,
    # PMI must rank the exclusive pair first
    texts = (
        ["we visited san francisco last may"] * 6
        + ["the cat saw the dog near the park"] * 10
        + ["the sun and the moon and the stars"] * 10
    )
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["w1"], r["w2"], r["pair_count"], r["pmi_nano"])
        for r in pmi_collocations(docs, min_count=5, top_n=10).collect()
    ]
    assert got == _py_pmi(texts, 5, 10)
    assert (got[0][0], got[0][1]) in {("san", "francisco"),
                                      ("visited", "san"),
                                      ("francisco", "last"),
                                      ("we", "visited"),
                                      ("last", "may")}
    the_pairs = [g for g in got if g[0] == "the" or g[1] == "the"]
    exclusive = [g for g in got if g[0] == "san"]
    assert exclusive and the_pairs
    assert exclusive[0][3] > max(p[3] for p in the_pairs)


# ---------------------------------------------------------------------------
# weighted sampling without replacement
# ---------------------------------------------------------------------------


def _py_weighted_sample(rows, quota):
    import hashlib
    import math as m

    out: dict[str, list] = {}
    for g, i, w in rows:
        if w <= 0:
            continue
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16)
        u = (h + 1) / 16777217.0
        k = int(m.floor(-m.log(u) / w * 1e9 + 0.5))
        out.setdefault(g, []).append((k, i, w))
    res = []
    for g in sorted(out):
        for k, i, w in sorted(out[g])[:quota]:
            res.append((g, i, w, k))
    return res


def test_weighted_sample_matches_python_reference(spark):
    from msgvault_spark.operators.sampling import weighted_sample_wor

    rows = [("a", i, (i % 7) + 1) for i in range(200)]
    rows += [("b", 1000 + i, 50) for i in range(15)]   # under-quota group
    rows += [("c", 2000, 0), ("c", 2001, 3)]           # zero weight dropped
    df = spark.createDataFrame(rows, "grp string, doc_id long, w long")
    got = [
        (r["grp"], r["doc_id"], r["w"], r["key_nano"])
        for r in weighted_sample_wor(df, "grp", "doc_id", "w", 20)
        .orderBy("grp", "key_nano", "doc_id")
        .collect()
    ]
    want = _py_weighted_sample([(g, i, w) for g, i, w in rows], 20)
    assert got == want
    assert len([g for g in got if g[0] == "b"]) == 15  # all kept
    assert [g for g in got if g[0] == "c"] == [
        w for w in want if w[0] == "c"
    ]
    assert all(g[1] != 2000 for g in got)  # zero-weight row excluded


def test_weighted_sample_prefers_heavy_rows(spark):
    from msgvault_spark.operators.sampling import weighted_sample_wor

    # weight 1000 vs weight 1: across 40 groups of 10+10, heavy rows
    # should dominate the quota-5 picks by a wide margin
    rows = []
    for g in range(40):
        rows += [(f"g{g}", g * 100 + i, 1000) for i in range(10)]
        rows += [(f"g{g}", g * 100 + 50 + i, 1) for i in range(10)]
    df = spark.createDataFrame(rows, "grp string, doc_id long, w long")
    got = weighted_sample_wor(df, "grp", "doc_id", "w", 5).collect()
    heavy = sum(1 for r in got if r["w"] == 1000)
    assert heavy / len(got) > 0.9


def test_weighted_sample_preserves_id_and_weight_types(spark):
    """String ids must survive (no ANSI cast failure) and fractional
    weights must come back untruncated — the operator preserves the
    caller's column types in the output struct."""
    from msgvault_spark.operators.sampling import weighted_sample_wor

    rows = [("a", f"doc-{i}", 0.5 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "grp string, doc_id string, w double")
    out = weighted_sample_wor(df, "grp", "doc_id", "w", 3)
    fields = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert fields["doc_id"] == "string" and fields["w"] == "double"
    got = out.collect()
    assert len(got) == 3
    assert all(r["doc_id"].startswith("doc-") for r in got)
    assert all(r["w"] == 0.5 + int(r["doc_id"][4:]) for r in got)


# ---------------------------------------------------------------------------
# OOV rate / boilerplate prefixes
# ---------------------------------------------------------------------------


def test_oov_rate_flags_out_of_vocab_source(spark):
    from msgvault_spark.sources.cache import get_text_index

    # build a corpus where src_common uses only 2 terms and src_rare is
    # all hapax terms — with vocab = top 2, src_rare must be ~100% OOV.
    # Exercise the entry's core join logic directly on a local index.
    from pyspark.sql import functions as F2

    docs = spark.createDataFrame(
        [(i, "alpha beta alpha beta", "src_common") for i in range(10)]
        + [(100 + i, f"rare{i}x uniq{i}y", "src_rare") for i in range(5)],
        "doc_id long, text string, source string",
    )
    from msgvault_spark.textstats.analysis import words

    postings = (
        docs.select(
            "doc_id", F2.explode(words(F2.col("text"))).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F2.count(F2.lit(1)).cast("long").alias("tf"))
    )
    ctf = postings.groupBy("term").agg(F2.sum("tf").alias("ctf"))
    vocab = (
        ctf.orderBy(F2.col("ctf").desc(), F2.col("term").asc())
        .limit(2)
        .select("term", F2.lit(1).alias("in_vocab"))
    )
    out = {
        r["source"]: r
        for r in postings.join(F2.broadcast(vocab), "term", "left")
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F2.sum("tf").cast("long").alias("total"),
            F2.sum(
                F2.when(F2.col("in_vocab").isNull(), F2.col("tf")).otherwise(
                    F2.lit(0)
                )
            ).cast("long").alias("oov"),
        )
        .collect()
    }
    assert out["src_common"]["oov"] == 0
    assert out["src_rare"]["oov"] == out["src_rare"]["total"] == 10


def test_boilerplate_prefixes_surface_shared_headers(spark):
    from msgvault_spark.catalog import CATALOG  # noqa: F401  (idiom check)
    from msgvault_spark.textstats.analysis import words

    header = "subscribe to our newsletter for the latest updates today"
    docs = spark.createDataFrame(
        [(i, header + f" body {i} varies", "s%d" % (i % 3)) for i in range(9)]
        + [(100, "completely unique document text here", "s9")],
        "doc_id long, text string, source string",
    )
    ws = docs.select(
        "doc_id", "source", words(F.col("text")).alias("w")
    ).filter(F.size("w") >= 1)
    out = (
        ws.select(
            "doc_id", "source",
            F.concat_ws(" ", F.slice("w", 1, 8)).alias("prefix"),
        )
        .groupBy("prefix")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
            F.min("doc_id").alias("example_doc_id"),
        )
        .orderBy(F.col("n_docs").desc(), F.col("prefix").asc())
        .collect()
    )
    top = out[0]
    assert top["prefix"] == "subscribe to our newsletter for the latest updates"
    assert top["n_docs"] == 9 and top["n_sources"] == 3
    assert top["example_doc_id"] == 0


# ---------------------------------------------------------------------------
# token entropy / MAD outliers
# ---------------------------------------------------------------------------


def _py_entropy(texts: dict[int, str]):
    import math as m

    out = {}
    for d, s in texts.items():
        ws = [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
        if not ws:
            continue
        dl = len(ws)
        tfs: dict[str, int] = {}
        for t in ws:
            tfs[t] = tfs.get(t, 0) + 1
        ssum = sum(
            int(m.floor(tf * m.log(dl / tf) * 1e6 + 0.5))
            for tf in tfs.values()
        )
        ent = ssum // dl
        if dl >= 2:
            lnd = int(m.floor(m.log(dl) * 1e6 + 0.5))
            uni = (ent * 1_000_000) // lnd  # floored first: overflow-proof
        else:
            uni = 0
        out[d] = (dl, len(tfs), ent, uni)
    return out


def test_token_entropy_matches_python_reference(spark):
    from msgvault_spark.textstats.analysis import token_entropy_scores

    texts = {
        0: "spam " * 50,                                  # loop → H = 0
        1: " ".join(f"u{i}" for i in range(64)),          # all distinct
        2: "a a b b c c d d",                             # uniform over 4
        3: "solo",                                        # dl = 1 edge
        4: "",                                            # absent (no row)
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    postings = (
        docs.select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split(F.lower("text"), "[^a-z0-9]+"),
                    lambda w: w != "",
                )
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["distinct_terms"],
            r["entropy_micro"], r["uniformity_ppm"],
        )
        for r in token_entropy_scores(postings).collect()
    }
    assert got == _py_entropy(texts)
    assert got[0][2] == 0 and got[0][3] == 0          # loop scores zero
    assert got[1][3] == 1_000_000                     # all-distinct = 1e6
    assert 4 not in got                               # empty doc absent
    assert got[3] == (1, 1, 0, 0)                     # single token


def test_mad_outliers_flag_extremes_only(spark):
    from msgvault_spark.catalog import CATALOG
    import os
    import tempfile

    # build a tiny parquet lake the entry can read: one tight source with
    # two wild outliers, one constant source with a single deviant
    rows = []
    for i in range(40):
        rows.append((i, " ".join(["w"] * (20 + (i % 3))), "en", "tight", 0))
    rows.append((100, " ".join(["w"] * 500), "en", "tight", 0))
    rows.append((101, "w", "en", "tight", 0))
    for i in range(30):
        rows.append((200 + i, " ".join(["w"] * 10), "en", "const", 0))
    rows.append((300, " ".join(["w"] * 11), "en", "const", 0))
    import pandas as pd

    with tempfile.TemporaryDirectory() as d:
        pdf = pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        )
        pdf["n_chars"] = pdf["text"].str.len()
        pdf.to_parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["source"]: r
            for r in CATALOG["length_mad_outliers"].fn(spark, d).collect()
        }
    tight = out["tight"]
    assert tight["median_x2"] == 2 * 21
    assert tight["n_outliers"] == 2          # 500 and 1, nothing else
    const = out["const"]
    assert const["mad_x4"] == 0
    assert const["n_outliers"] == 1          # any deviation from constant


# ---------------------------------------------------------------------------
# LSH embedding near-dups / quality z-score
# ---------------------------------------------------------------------------


def test_lsh_near_dups_subset_of_exact_and_finds_identicals(spark):
    from msgvault_spark.dedup.embedding import lsh_near_dups

    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    rows.append((100, list(rows[0][1])))       # exact duplicate of vec 0
    rows.append((101, [x * 1.001 for x in rows[1][1]]))  # near-dup of vec 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in lsh_near_dups(emb, 0.9, dim=16).collect()
    }
    # identical and scaled vectors share every signature bit → both found
    assert (0, 100) in got and got[(0, 100)] >= 0.999999
    assert (1, 101) in got
    # LSH can only MISS exact pairs, never invent them: rescore is exact
    from msgvault_spark.similarity.knn import cosine, _as_double

    a = emb.select(F.col("vec_id").alias("id_a"),
                   _as_double("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"),
                   _as_double("embedding").alias("vb"))
    exact = {
        (r["id_a"], r["id_b"]): r["c"]
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.round(cosine(F.col("va"), F.col("vb")), 6).alias("c"))
        .filter(F.col("c") >= 0.9)
        .collect()
    }
    assert set(got) <= set(exact)
    assert all(got[k] == exact[k] for k in got)


def test_quality_zscore_matches_float_calibration(spark):
    from msgvault_spark.textstats.calibrate import calibrate_expr

    rows = [(i, "en", 1_000_000 + i * 10_000) for i in range(20)]
    rows += [(100 + i, "fr", 2_000_000 + i * 5_000) for i in range(10)]
    rows += [(200, "zz", 9_999_999)]  # singleton group → z = 0
    df = spark.createDataFrame(rows, "doc_id long, lang string, x long")
    # integer-stats fixed-point z (the entry's formula)
    st = df.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("a"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("b"),
    )
    n, a, b = F.col("n"), F.col("a").cast("double"), F.col("b").cast("double")
    var_num = n * b - a * a
    sd = F.sqrt(var_num / (n.cast("double") * (n - 1)))
    z = F.floor(
        (F.col("x").cast("double") * n - a) / (n * sd) * 1000 + 0.5
    ).cast("long")
    fixed = {
        r["doc_id"]: r["zm"]
        for r in df.join(F.broadcast(st), "lang")
        .select(
            "doc_id",
            F.when((n >= 2) & (var_num > 0), z).otherwise(F.lit(0)).alias(
                "zm"
            ),
        )
        .collect()
    }
    flt = {
        r["doc_id"]: r["z"]
        for r in calibrate_expr(df, "lang", "x").collect()
    }
    for d, zm in fixed.items():
        assert abs(zm - round(flt[d] * 1000)) <= 1, (d, zm, flt[d])
    assert fixed[200] == 0 and flt[200] == 0.0


# ---------------------------------------------------------------------------
# SimHash Hamming-ball search
# ---------------------------------------------------------------------------


def test_hamming_neighbors_exact_within_radius(spark):
    from msgvault_spark.dedup.simhash import hamming_neighbors

    # constructed fingerprints: pairs at distance 0..5, including a
    # 4-bit pair whose diffs cluster in one band (still must be EXCLUDED
    # by the distance filter even though banding proposes it)
    fps = [
        (0, 0b10101010_11110000_00001111_01010101),
        (1, 0b10101010_11110000_00001111_01010101),  # d=0 from 0
        (2, 0b10101010_11110000_00001111_01010100),  # d=1 from 0/1
        (3, 0b10101010_11110000_00001111_01011010),  # d=4 in one band
        (4, 0b01010101_00001111_11110000_10101010),  # far from all
    ]
    df = spark.createDataFrame(fps, "doc_id long, simhash long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_neighbors(df, max_dist=3).collect()
    }
    # python brute force within radius 3 — banding with 4 bands must
    # find EVERY such pair (pigeonhole guarantee), no more, no less
    want = {}
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            d = bin(fps[i][1] ^ fps[j][1]).count("1")
            if d <= 3:
                want[(fps[i][0], fps[j][0])] = d
    assert got == want
    assert (0, 1) in got and got[(0, 1)] == 0
    assert (0, 2) in got and got[(0, 2)] == 1
    assert (0, 3) not in got  # d=4: proposed by its shared bands, disposed


# ---------------------------------------------------------------------------
# word sampling plan
# ---------------------------------------------------------------------------


def test_word_sampling_plan_reference_values(spark):
    import math as m

    from msgvault_spark.catalog import CATALOG  # registration side effect
    from pyspark.sql import functions as F2

    # inline the entry's formula on a constructed count table and check
    # against python: rare words keep 1e6 (capped), the hot word is
    # subsampled; neg shares follow ctf^0.75 and sum to ~1e6
    # T = 10000 exactly: "rare" at ctf 1 sits right AT the t=1e-4
    # threshold (f = t → keep = 1e6); "the" at 90% is heavily subsampled
    counts = {"the": 9000, "cat": 900, "mid": 99, "rare": 1}
    t = sum(counts.values())
    ctf = spark.createDataFrame(
        list(counts.items()), "term string, ctf long"
    )
    tot = ctf.agg(F2.sum("ctf").cast("long").alias("t"))
    w = ctf.select(
        "term", "ctf",
        F2.floor(F2.pow(F2.col("ctf").cast("double"), 0.75) * 1000 + 0.5)
        .cast("long").alias("wfp"),
    )
    sw = w.agg(F2.sum("wfp").cast("long").alias("s"))
    keep = F2.least(
        F2.lit(1000000).cast("long"),
        F2.floor(
            F2.sqrt(F2.col("t").cast("double") / (10000 * F2.col("ctf")))
            * 1000000 + 0.5
        ).cast("long"),
    )
    out = {
        r["term"]: r
        for r in w.crossJoin(F2.broadcast(tot))
        .crossJoin(F2.broadcast(sw))
        .select("term", "ctf", keep.alias("keep_ppm"),
                F2.expr("(wfp * 1000000) div s").alias("neg_ppm"))
        .collect()
    }
    wfp = {k: int(m.floor(v ** 0.75 * 1000 + 0.5)) for k, v in counts.items()}
    s = sum(wfp.values())
    for k, v in counts.items():
        assert out[k]["keep_ppm"] == min(
            1_000_000, int(m.floor(m.sqrt(t / (10000 * v)) * 1e6 + 0.5))
        )
        assert out[k]["neg_ppm"] == wfp[k] * 1_000_000 // s
    assert out["rare"]["keep_ppm"] == 1_000_000      # below threshold
    assert out["the"]["keep_ppm"] < 1_000_000        # hot word subsampled
    assert sum(r["neg_ppm"] for r in out.values()) <= 1_000_000


# ---------------------------------------------------------------------------
# dup position profile / threshold sweep
# ---------------------------------------------------------------------------


def test_dup_position_profile_buckets_lead_mass(spark):
    from msgvault_spark.dedup.substrings import (
        dup_position_profile,
        duplicated_starts,
    )

    header = "one two three four five six seven eight"  # 8 tokens, w=4
    docs = spark.createDataFrame(
        [
            (i, header + " " + " ".join(f"u{i}x{j}" for j in range(40)))
            for i in range(4)
        ],
        "doc_id long, text string",
    )
    marked = duplicated_starts(docs, "doc_id", "text", w=4)
    out = {r["third"]: r for r in dup_position_profile(marked, w=4).collect()}
    # the shared header occupies starts 1..5 of a 45-position range —
    # all in the LEAD third; unique tails contribute nothing
    assert set(out) == {0}
    assert out[0]["n_docs"] == 4
    assert out[0]["n_starts"] == 4 * 5


def test_dup_position_profile_tail_heavy_footer(spark):
    from msgvault_spark.dedup.substrings import (
        dup_position_profile,
        duplicated_starts,
    )

    footer = "unsubscribe link here now"
    docs = spark.createDataFrame(
        [
            (i, " ".join(f"u{i}x{j}" for j in range(40)) + " " + footer)
            for i in range(4)
        ],
        "doc_id long, text string",
    )
    marked = duplicated_starts(docs, "doc_id", "text", w=4)
    out = {r["third"]: r for r in dup_position_profile(marked, w=4).collect()}
    assert set(out) == {2}  # footer mass lands in the TAIL third


def test_gopher_rules_null_text_counts_zero(spark):
    from msgvault_spark.textstats.analysis import gopher_rules

    df = spark.createDataFrame(
        [(0, None), (1, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in gopher_rules(df, "doc_id", "text").collect()}
    # NULL text must behave like empty text (the parity rule), never NULL
    for d in (0, 1):
        assert out[d]["n_words"] == 0 and out[d]["word_chars"] == 0
        assert out[d]["keep"] == 0


def test_mrr_truncates_deep_topk_frames(spark):
    from msgvault_spark.similarity.mrr import mrr_report

    corpus = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 1), (3, 0)], "vec_id long, label int"
    )
    queries = spark.createDataFrame([(0, 0)], "vec_id long, label int")
    # topk deeper than k: ranks 1,2 wrong-label, rank 3 relevant — with
    # k=2 the relevant hit is OUTSIDE the window: rank 0, rr 0, count 0
    topk = spark.createDataFrame(
        [(0, 1, 0.9), (0, 2, 0.8), (0, 3, 0.7)],
        "qid long, id long, score double",
    )
    out = mrr_report(corpus, queries, k=2, topk=topk).collect()
    assert out[0]["first_rel_rank"] == 0
    assert out[0]["rr_nano"] == 0 and out[0]["n_rel_topk"] == 0


def test_ndcg_truncates_deep_topk_frames(spark):
    from msgvault_spark.similarity.ndcg import ndcg_report

    corpus = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 1), (3, 0)], "vec_id long, label int"
    )
    queries = spark.createDataFrame([(0, 0)], "vec_id long, label int")
    # topk deeper than k=2: the only relevant hit sits at rank 3 — it
    # must be truncated (dcg 0), not index past the 2-element discount
    # array (ANSI INVALID_ARRAY_INDEX) or count as gain
    topk = spark.createDataFrame(
        [(0, 1, 0.9), (0, 2, 0.8), (0, 3, 0.7)],
        "qid long, id long, score double",
    )
    out = ndcg_report(corpus, queries, k=2, topk=topk).collect()
    assert out[0]["dcg_nano"] == 0 and out[0]["ndcg_ppm"] == 0
    assert out[0]["n_rel"] == 1  # corpus has one other label-0 vector


# ---------------------------------------------------------------------------
# UniMax waterfill
# ---------------------------------------------------------------------------


def _py_unimax(tokens: dict[str, int], budget: int, cap_ppm: int):
    caps = {s: t * cap_ppm // 1_000_000 for s, t in tokens.items()}
    order = sorted(caps, key=lambda s: (caps[s], s))
    S = len(order)
    p = 0
    k = 0
    pk = 0
    for i, s in enumerate(order, start=1):
        if caps[s] * (S - i + 1) <= budget - p:
            k += 1
            pk += caps[s]
        p += caps[s]
    water = (budget - pk) // (S - k) if k < S else 0
    out = {}
    for i, s in enumerate(order, start=1):
        capped = 1 if i <= k else 0
        out[s] = (tokens[s], caps[s], capped,
                  caps[s] if capped else water)
    return out


def test_unimax_matches_reference_binding_and_uniform(spark):
    from msgvault_spark.operators.unimax import unimax_plan

    # skewed sizes: tiny sources must CAP, big sources share the line
    tokens = {"a": 100, "b": 200, "c": 5000, "d": 9000, "e": 9100}
    df = spark.createDataFrame(
        list(tokens.items()), "source string, tokens long"
    )
    budget = 10_000
    got = {
        r["source"]: (r["tokens"], r["cap"], r["capped"], r["alloc"])
        for r in unimax_plan(df, budget=budget, cap_ppm=1_000_000).collect()
    }
    want = _py_unimax(tokens, budget, 1_000_000)
    assert got == want
    assert got["a"][2] == 1 and got["a"][3] == 100   # tiny source capped
    assert got["d"][2] == 0 and got["d"][3] == got["e"][3]  # shared line
    total_alloc = sum(v[3] for v in got.values())
    assert total_alloc <= budget  # integer remainder stays unallocated
    assert budget - total_alloc < len(tokens)  # ...and is < S tokens

    # budget above the cap sum: everyone capped at their own data
    got2 = {
        r["source"]: r
        for r in unimax_plan(df, budget=10**9, cap_ppm=1_000_000).collect()
    }
    assert all(r["capped"] == 1 and r["alloc"] == r["cap"]
               for r in got2.values())


def test_label_dispersion_tight_vs_spread(spark):
    from msgvault_spark.catalog import CATALOG
    import os
    import tempfile

    import pandas as pd

    rows = []
    for i in range(6):  # tight label: identical direction
        rows.append((i, [1.0, 0.0, 0.0, 0.0], 0))
    spread = [[1.0, 0, 0, 0], [-1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, -1.0, 0, 0]]
    for i, v in enumerate(spread):  # spread label: centroid ~0, low cos
        rows.append((100 + i, [float(x) for x in v], 1))
    with tempfile.TemporaryDirectory() as d:
        pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
        pdf.to_parquet(os.path.join(d, "embeddings.parquet"))
        out = {
            r["label"]: r
            for r in CATALOG["label_dispersion_report"].fn(spark, d).collect()
        }
    assert out[0]["n"] == 6
    assert out[0]["mean_cos_ppm"] == 1_000_000  # identical members
    assert out[1]["n"] == 4
    assert out[1]["mean_cos_ppm"] < 500_000     # collapsed/spread class


def test_band_recall_monotone_in_bands(spark):
    from msgvault_spark.dedup.minhash import (
        build_minhash_index,
        pairs_from_index,
    )

    base = " ".join(f"tok{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(i, base) for i in range(4)]                         # exact dups
        + [(10 + i, base.replace(f"tok{3 * i} ", "z "))        # near dups
           for i in range(3)]
        + [(100 + i, " ".join(f"u{100 + i}x{j}" for j in range(30)))
           for i in range(5)],                                 # uniques
        "doc_id long, text string",
    )

    def found(bands):
        idx = build_minhash_index(docs, "doc_id", "text", bands=bands)
        return {
            (r["id_a"], r["id_b"])
            for r in pairs_from_index(idx, jaccard_threshold=0.5).collect()
        }

    f3, f4, f6, f12 = found(3), found(4), found(6), found(12)
    # coarser banding can only MISS pairs, never add them (verify is
    # exact, and sharing r consecutive hashes implies sharing each one)
    assert f3 <= f12 and f4 <= f12 and f6 <= f12
    # identical docs share every hash → found at EVERY banding
    exact_pairs = {(a, b) for a in range(4) for b in range(4) if a < b}
    assert exact_pairs <= f3


def test_volume_anomaly_flags_spike_day(spark):
    import datetime as dt

    from pyspark.sql import functions as F2

    # inline the entry's stats formula on constructed dailies: 9 quiet
    # days at ~100 and one 10x spike — the spike's z must clear 2.5
    rows = []
    for i in range(9):
        rows.append(("click", f"2024-01-0{i + 1}" if i < 9 else "", 100 + i))
    rows.append(("click", "2024-01-10", 1000))
    daily = spark.createDataFrame(rows, "event_type string, day string, n long")
    st = daily.groupBy("event_type").agg(
        F2.count(F2.lit(1)).cast("long").alias("d"),
        F2.sum("n").cast("long").alias("a"),
        F2.sum(F2.col("n") * F2.col("n")).cast("long").alias("b"),
    )
    d, a, b = (F2.col("d"), F2.col("a").cast("double"),
               F2.col("b").cast("double"))
    var_num = d * b - a * a
    sd = F2.sqrt(var_num / (d.cast("double") * (d - 1)))
    z = F2.floor(
        (F2.col("n").cast("double") * d - a) / (d * sd) * 1000 + 0.5
    ).cast("long")
    out = {
        r["day"]: r["z"]
        for r in daily.join(F2.broadcast(st), "event_type")
        .select("day", F2.when((d >= 2) & (var_num > 0), z)
                .otherwise(F2.lit(0)).alias("z"))
        .collect()
    }
    assert out["2024-01-10"] > 2500   # the spike stands out
    assert all(v < 1000 for k, v in out.items() if k != "2024-01-10")


def test_rfm_segments_constructed_population(spark):
    import datetime as dt
    import os
    import tempfile

    import pandas as pd

    from msgvault_spark.catalog import CATALOG

    base = dt.datetime(2024, 6, 30)
    rows = []
    okey = 0
    # 3 archetypes x 3 customers each: champions (recent, frequent, big),
    # mid, and lapsed one-timers
    for c in range(3):      # champions
        for j in range(9):
            rows.append((okey, c, "O", 900.0, base - dt.timedelta(days=j)))
            okey += 1
    for c in range(10, 13):  # mid
        for j in range(3):
            rows.append((okey, c, "O", 300.0,
                         base - dt.timedelta(days=40 + j)))
            okey += 1
    for c in range(20, 23):  # lapsed one-timers
        rows.append((okey, c, "O", 50.0, base - dt.timedelta(days=200)))
        okey += 1
    with tempfile.TemporaryDirectory() as d:
        pdf = pd.DataFrame(
            rows,
            columns=["o_orderkey", "o_custkey", "o_orderstatus",
                     "o_totalprice", "o_orderdate"],
        )
        pdf["o_orderpriority"] = "1-URGENT"
        # micro-second physical type: pandas defaults to nanos, which the
        # vanilla reader rejects (the loader's nanos probe is testdata-
        # shaped; fixtures should just write µs)
        pdf["o_orderdate"] = pdf["o_orderdate"].astype("datetime64[us]")
        pdf.to_parquet(os.path.join(d, "orders.parquet"))
        out = {r["segment"]: r
               for r in CATALOG["rfm_segments"].fn(spark, d).collect()}
    assert out[333]["n_customers"] == 3     # champions: best on all axes
    assert out[111]["n_customers"] == 3     # lapsed: worst on all axes
    assert sum(r["n_customers"] for r in out.values()) == 9

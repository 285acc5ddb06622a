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

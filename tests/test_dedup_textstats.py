"""Dedup survivor rules, content hashing, MinHash/SimHash, text stats."""

import pytest
from pyspark.sql import functions as F

from msgvault_spark.dedup.exact import (
    content_hash,
    dedup_merge_plan,
    exact_dup_groups,
    select_survivors,
)
from msgvault_spark.dedup.minhash import lsh_candidate_pairs, word_shingles
from msgvault_spark.dedup.simhash import hamming32, simhash
from msgvault_spark.textstats.analysis import text_profile


@pytest.fixture(scope="module")
def dup_msgs(spark):
    # two dup groups + one singleton; columns: id, rfc, source_type,
    # label_count, is_sent, sent_at
    rows = [
        (1, "r1", "gmail", 2, False, "2024-01-02"),
        (2, "r1", "imap", 5, False, "2024-01-01"),
        (3, "r1", "mbox", 1, True, "2024-01-03"),  # sent copy wins despite all
        (4, "r2", "imap", 1, False, "2024-01-01"),
        (5, "r2", "gmail", 1, False, "2024-01-05"),  # gmail preferred
        (6, "r3", "gmail", 0, False, "2024-01-01"),  # singleton: not a dup
    ]
    df = spark.createDataFrame(
        rows, ["id", "rfc", "source_type", "label_count", "is_sent", "sent_at"]
    )
    return df.withColumn("sent_at", F.to_timestamp("sent_at"))


def test_exact_groups_excludes_singletons(dup_msgs):
    g = exact_dup_groups(dup_msgs, "rfc")
    assert sorted(r["id"] for r in g.collect()) == [1, 2, 3, 4, 5]


def test_survivor_priority_rules(dup_msgs):
    src_rank = (
        F.when(F.col("source_type") == "gmail", 0)
        .when(F.col("source_type") == "imap", 1)
        .otherwise(2)
    )
    marked = select_survivors(
        exact_dup_groups(dup_msgs, "rfc"),
        priority=[src_rank.asc(), F.col("label_count").desc(),
                  F.col("sent_at").asc()],
        sent_copy=F.col("is_sent"),
    )
    survivors = {
        r["group_key"]: r["id"] for r in marked.filter("is_survivor").collect()
    }
    # r1: sent-copy signal overrides source preference → id 3
    # r2: no sent copies → gmail preference → id 5
    assert survivors == {"r1": 3, "r2": 5}


def test_merge_plan_unions_labels(spark, dup_msgs):
    marked = select_survivors(
        exact_dup_groups(dup_msgs, "rfc"),
        priority=[F.col("sent_at").asc()],
    )
    ml = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 100), (4, 300)], ["message_id", "label_id"]
    )
    survivor_labels, losers = dedup_merge_plan(marked, ml)
    sl = {(r["survivor_id"], r["label_id"]) for r in survivor_labels.collect()}
    # r1 survivor = 2 (earliest sent_at) inherits {100, 200}
    assert sl == {(2, 100), (2, 200), (4, 300)}
    loser_ids = sorted(r["id"] for r in losers.collect())
    assert loser_ids == [1, 3, 5]
    assert losers.collect()[0]["delete_batch_id"] == "dedup-batch-1"


def test_content_hash_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "  HELLO\tWORLD \n"),
         (4, "different")],
        ["id", "text"],
    )
    hashed = df.withColumn("h", content_hash(F.col("text")))
    hs = {r["id"]: r["h"] for r in hashed.collect()}
    assert hs[1] == hs[2] == hs[3]
    assert hs[4] != hs[1]


def test_word_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], ["id", "t"])
    out = df.select(word_shingles(F.col("t"), 3).alias("s")).collect()[0]["s"]
    assert sorted(out) == ["a b c", "b c d"]
    # short text degrades to a single whole-text shingle
    df2 = spark.createDataFrame([(1, "a b")], ["id", "t"])
    out2 = df2.select(word_shingles(F.col("t"), 3).alias("s")).collect()[0]["s"]
    assert out2 == ["a b"]


def test_minhash_lsh_finds_planted_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    rows = [
        (1, base),
        (2, base + " with a tiny suffix change"),
        (3, "completely different content about spark engines and parquet "
            "files with nothing shared at all whatsoever in any shingle"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = lsh_candidate_pairs(df, "doc_id", "text",
                                jaccard_threshold=0.3).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["jaccard"] > 0.5


def test_simhash_similarity_property(spark):
    base = "spark parquet shuffle partition broadcast join aggregate " * 4
    df = spark.createDataFrame(
        [(1, base), (2, base + " one extra token"),
         (3, "entirely unrelated words about cooking pasta tomatoes basil")],
        ["doc_id", "text"],
    )
    fp = {r["doc_id"]: r["simhash"] for r in simhash(df, "doc_id", "text").collect()}
    d12 = bin(fp[1] ^ fp[2]).count("1")
    d13 = bin(fp[1] ^ fp[3]).count("1")
    assert d12 < d13  # near-dup closer in hamming space
    assert d12 <= 6
    # hamming32 column matches python popcount
    hdf = spark.createDataFrame([(fp[1], fp[2])], ["a", "b"]).select(
        hamming32(F.col("a"), F.col("b")).alias("h")
    )
    assert hdf.collect()[0]["h"] == d12


def test_text_profile(spark):
    df = spark.createDataFrame(
        [(1, "The quick brown fox and the lazy dog!"),
         (2, "el la de que y los en un " * 4)],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in text_profile(df, "doc_id", "text").collect()}
    assert out[1]["n_words"] == 8
    assert out[1]["lang_guess"] == "en"
    assert out[2]["lang_guess"] == "es"
    assert out[1]["ws_tokens"] == 8
    assert 0 < out[1]["stopword_ratio"] < 1
    assert out[1]["fingerprint"] != out[2]["fingerprint"]


# ---------------------------------------------------------------------------
# winnowing substring fingerprints
# ---------------------------------------------------------------------------


def test_winnow_detects_shared_paragraph(spark):
    from pyspark.sql import functions as F

    from msgvault_spark.dedup.winnow import winnow_candidate_pairs, winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = spark.createDataFrame(
        [
            (1, "intro alpha. " + shared + " outro omega text."),
            (2, "different beginning here. " + shared + " and a new ending."),
            (3, "nothing in common with the others, purely novel content."),
            (4, "x"),  # shorter than k: empty fingerprint, no crash
        ],
        "doc_id long, text string",
    )
    pairs = winnow_candidate_pairs(docs, "doc_id", "text", min_shared=3).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]

    # guarantee property: w+k-1 window selects at least one gram of the
    # shared run -> fingerprint sets intersect
    f1 = set(docs.filter("doc_id=1").select(
        F.explode(winnow_fingerprints(F.col("text"))).alias("h")).toPandas()["h"])
    f2 = set(docs.filter("doc_id=2").select(
        F.explode(winnow_fingerprints(F.col("text"))).alias("h")).toPandas()["h"])
    f3 = set(docs.filter("doc_id=3").select(
        F.explode(winnow_fingerprints(F.col("text"))).alias("h")).toPandas()["h"])
    assert len(f1 & f2) >= 3 and not (f1 & f3)


def test_winnow_portable_hash_matches_fast_structure(spark):
    """Portable (md5) and fast (xxhash64) paths select the same POSITIONS
    structurally — same density guarantees — even though hash values
    differ. Check densities are in the winnowing ~2/(w+1) ballpark."""
    from pyspark.sql import functions as F

    from msgvault_spark.dedup.winnow import winnow_fingerprints

    text = " ".join(f"word{i}" for i in range(200))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    for portable in (False, True):
        nfp = df.select(
            F.size(winnow_fingerprints(F.col("text"), portable=portable)).alias("n")
        ).head()["n"]
        assert 0.1 * len(text) < nfp < 0.6 * len(text)


def test_decontamination_finds_planted_leak(spark):
    """A training doc containing a benchmark passage collides on its
    trigrams and is flagged; unrelated docs are not; the benchmark doc
    itself (present in the corpus) is excluded as a self-pair."""
    from msgvault_spark.dedup.decontaminate import (
        contaminated_docs,
        contamination_pairs,
    )

    bench_text = "the quick brown fox jumps over the lazy dog"
    corpus = spark.createDataFrame(
        [
            (1, f"intro text then {bench_text} then more filler"),  # leak
            (2, "completely unrelated content about spark shuffles"),
            (3, "quick brown animals exist"),  # 1 shared trigram < min 2
            (100, bench_text),  # the benchmark doc itself
        ],
        "doc_id long, text string",
    )
    bench = corpus.filter("doc_id = 100")
    pairs = contamination_pairs(corpus, bench, n=3, min_collisions=2).collect()
    assert [(r["doc_id"], r["bench_id"]) for r in pairs] == [(1, 100)]
    assert pairs[0]["n_collisions"] >= 6  # the full passage's trigrams
    rollup = contaminated_docs(
        contamination_pairs(corpus, bench, n=3, min_collisions=2)
    ).collect()
    assert [r["doc_id"] for r in rollup] == [1]


def test_calibration_pandas_matches_jvm(spark):
    """applyInPandas group calibration ≡ the JVM window twin (1e-9)."""
    from pyspark.sql import functions as F

    from msgvault_spark.textstats.calibrate import calibrate_expr, calibrate_pandas

    rows = [
        ("en", 1.0), ("en", 2.0), ("en", 3.0), ("en", 10.0),
        ("de", 5.0), ("de", 5.0),          # zero variance -> z = 0
        ("fr", 7.5),                        # singleton -> z = 0
    ]
    df = spark.createDataFrame(
        [(i, g, s) for i, (g, s) in enumerate(rows)],
        "id long, lang string, score double",
    )
    a = {r["id"]: r["z"] for r in calibrate_expr(df, "lang", "score").collect()}
    b = {r["id"]: r["z"] for r in calibrate_pandas(df, "lang", "score").collect()}
    assert set(a) == set(b)
    for k in a:
        assert abs(a[k] - b[k]) < 1e-9, (k, a[k], b[k])
    # zero-variance + singleton groups pinned to 0
    assert a[4] == a[5] == a[6] == 0.0
    # en z-scores: mean 4, centered ordering preserved
    assert a[0] < a[1] < a[2] < a[3] and abs(sum(a[i] for i in range(4))) < 1e-9


def test_segment_dedup_drops_repeats_keeps_first(spark):
    from msgvault_spark.dedup.lines import dedup_exact_segments

    boiler = "one two three four"
    docs = spark.createDataFrame(
        [
            (1, boiler + " alpha beta gamma delta"),
            (2, boiler + " epsilon zeta eta theta"),  # repeats doc 1's segment
            (3, "alpha beta gamma delta " + boiler),  # both segs seen before
            (4, "fresh words only here now yes no maybe"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dedup_exact_segments(docs, size=4).collect()}
    assert rows[1]["n_kept"] == 2 and rows[1]["n_dropped"] == 0
    assert rows[2]["n_kept"] == 1 and rows[2]["n_dropped"] == 1
    assert rows[2]["dedup_text"] == "epsilon zeta eta theta"
    assert rows[3]["n_kept"] == 0 and rows[3]["n_dropped"] == 2
    assert rows[3]["dedup_text"] == ""
    assert rows[4]["n_kept"] == 2
    # within-doc duplicate: second copy dropped
    docs2 = spark.createDataFrame(
        [(9, "a b c d a b c d")], "doc_id long, text string"
    )
    r9 = dedup_exact_segments(docs2, size=4).collect()[0]
    assert (r9["n_kept"], r9["n_dropped"], r9["dedup_text"]) == (1, 1, "a b c d")


def test_incremental_pairs_touch_batch_only(spark):
    from pyspark.sql import functions as F
    from msgvault_spark.dedup.minhash import (
        build_minhash_index,
        incremental_pairs,
        pairs_from_index,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base + " one"),
            (2, base + " two"),          # old×old near-dup pair (1,2)
            (17, base + " three"),       # new (id%10==7): pairs with 1,2
            (27, base + " four"),        # new: pairs with 1,2,17
            (30, "completely different words here nothing shared at all ok"),
        ],
        "doc_id long, text string",
    )
    idx = build_minhash_index(docs, "doc_id", "text")
    inc = {(r["id_a"], r["id_b"])
           for r in incremental_pairs(idx, F.col("doc_id") % 10 == 7).collect()}
    full = {(r["id_a"], r["id_b"]) for r in pairs_from_index(idx).collect()}
    # incremental = full restricted to pairs touching the batch
    want = {p for p in full if p[0] % 10 == 7 or p[1] % 10 == 7}
    assert inc == want and want, "expected non-empty batch-touching pairs"
    assert (1, 2) in full and (1, 2) not in inc  # old×old excluded
    assert (17, 27) in inc  # within-batch pair found
    assert (1, 17) in inc or (2, 17) in inc  # old-new found


def test_hot_bucket_cap_bounds_pair_counts(spark):
    """A planted hot bucket (one boilerplate text shared by most docs)
    must produce O(B) star edges under the cap, not O(B²) pairs — and
    the capped result must agree with the uncapped one on every pair
    OUTSIDE the hot cluster."""
    from pyspark.sql import functions as F

    from msgvault_spark.dedup.hotbuckets import hot_bucket_stats
    from msgvault_spark.dedup.minhash import (
        build_minhash_index,
        pairs_from_index,
    )

    boiler = (
        "permission is hereby granted free of charge to any person "
        "obtaining a copy of this software and associated documentation"
    )
    uniq = "totally distinct sentence number {} with its own odd words {}"
    rows = [(i, boiler) for i in range(40)]  # the hot cluster
    rows += [(100 + i, uniq.format(i, i * 7)) for i in range(10)]
    rows += [(200, "the quick brown fox jumps over the lazy dog today"),
             (201, "the quick brown fox jumps over the lazy dog tonight")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_minhash_index(docs, "doc_id", "text")

    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in pairs_from_index(idx, bucket_cap=8).collect()
    }
    # hot cluster: exactly B-1 = 39 star edges anchored at the min id,
    # all exact duplicates
    hot = {p: j for p, j in capped.items() if p[1] < 100}
    assert len(hot) == 39
    assert all(p[0] == 0 and j == 1.0 for p, j in hot.items())
    # outside the hot cluster the capped run matches the uncapped one
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in pairs_from_index(idx).collect()
    }
    assert {p: j for p, j in capped.items() if p[0] >= 100} == {
        p: j for p, j in full.items() if p[0] >= 100
    }
    assert (200, 201) in capped
    # accounting: 4 bands × one 40-member bucket over the cap
    st = hot_bucket_stats(idx.select("bucket", "doc_id"), 8).collect()[0]
    assert st["n_over_cap"] == 4 and st["max_bucket"] == 40
    assert st["star_pairs"] == 4 * 39
    assert st["dropped_pairs"] == 4 * (40 * 39 // 2 - 39)


def test_hamming_neighbors_and_embedding_lsh_accept_bucket_cap(spark):
    """The cap policy in the other two propose stages: identical
    fingerprints in an over-cap bucket collapse to star edges; results
    outside stay equal to the uncapped run."""
    from msgvault_spark.dedup.embedding import lsh_near_dups
    from msgvault_spark.dedup.simhash import hamming_neighbors, simhash

    docs = spark.createDataFrame(
        [(i, "identical boilerplate text shared by every hot document")
         for i in range(20)]
        + [(100, "some other words entirely unrelated to the rest"),
           (101, "some other words entirely unrelated to the rest")],
        "doc_id long, text string",
    )
    fps = simhash(docs, "doc_id", "text")
    got = {(r["id_a"], r["id_b"]) for r in
           hamming_neighbors(fps, bucket_cap=8).collect()}
    hot = {p for p in got if p[1] < 100}
    assert hot == {(0, i) for i in range(1, 20)}  # star edges only
    assert (100, 101) in got  # under-cap bucket pairs classically

    embs = spark.createDataFrame(
        [(i, [1.0, 0.5, 0.25, 0.125]) for i in range(20)]
        + [(100, [-1.0, -0.5, 0.25, 0.125]),
           (101, [-1.0, -0.5, 0.26, 0.125])],
        "vec_id long, embedding array<double>",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in
             lsh_near_dups(embs, 0.9, dim=4, bucket_cap=8).collect()}
    assert {p for p in pairs if p[1] < 100} == {(0, i) for i in range(1, 20)}
    assert (100, 101) in pairs


def test_ngram_winnow_incremental_accept_bucket_cap(spark):
    """The cap policy extends to the remaining propose stages: n-gram
    Jaccard (gram postings), winnowing (fingerprint postings), and the
    incremental MinHash probe — hot buckets collapse to star edges,
    results outside the hot cluster match the uncapped run."""
    from pyspark.sql import functions as F

    from msgvault_spark.dedup.minhash import build_minhash_index, incremental_pairs
    from msgvault_spark.dedup.ngram import ngram_jaccard_pairs
    from msgvault_spark.dedup.winnow import winnow_candidate_pairs

    boiler = "the quick brown fox jumps over the lazy dog every single day"
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(30)]
        + [(100, "completely different words alpha beta gamma delta"),
           (101, "completely different words alpha beta gamma epsilon")],
        "doc_id long, text string",
    )
    # n-gram: hot grams (30 identical docs) star to doc 0 at jaccard 1.0
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           ngram_jaccard_pairs(docs, "doc_id", "text",
                               bucket_cap=8, prefix_filter=False).collect()}
    hot = {p: j for p, j in got.items() if p[1] < 100}
    assert hot == {(0, i): 1.0 for i in range(1, 30)}
    assert (100, 101) in got  # under-cap pair survives classically

    # winnow: same star shape; shared counted per surviving edge
    wgot = {(r["id_a"], r["id_b"]): r["shared"] for r in
            winnow_candidate_pairs(docs, "doc_id", "text",
                                   bucket_cap=8).collect()}
    whot = {p for p in wgot if p[1] < 100}
    assert whot == {(0, i) for i in range(1, 30)}
    assert all(s >= 2 for s in wgot.values())
    uncapped = {(r["id_a"], r["id_b"]): r["shared"] for r in
                winnow_candidate_pairs(docs, "doc_id", "text").collect()}
    # star edges keep the exact shared count of the uncapped run
    for p, s in wgot.items():
        assert uncapped[p] == s

    # incremental probe: new docs (id % 10 == 7) in the hot bucket pair
    # only with the bucket's min-id member
    idx = build_minhash_index(docs, "doc_id", "text")
    inc = {(r["id_a"], r["id_b"]) for r in
           incremental_pairs(idx, F.col("doc_id") % 10 == 7,
                             bucket_cap=8).collect()}
    assert {p for p in inc if p[1] < 100} == {(0, 7), (0, 17), (0, 27)}

    # rep-is-NEW hazard: a new doc whose id undercuts every resident of
    # its hot bucket must still pair (with the min OLD member), not
    # silently vanish behind the self-edge guard
    docs2 = spark.createDataFrame(
        [(0, boiler)]  # the NEW backfill doc, smaller id than all
        + [(i, boiler) for i in range(10, 40)],
        "doc_id long, text string",
    )
    idx2 = build_minhash_index(docs2, "doc_id", "text")
    inc2 = {(r["id_a"], r["id_b"]) for r in
            incremental_pairs(idx2, F.col("doc_id") == 0,
                              bucket_cap=8).collect()}
    assert inc2 == {(0, 10)}  # linked to the min OLD resident


def test_lsh_propose_joins_are_slim(spark):
    """The r6 verdict's heavy-payload finding: the bucket self-join must
    ship (bucket, id) only — shingle arrays / float vectors decorate the
    distinct pair list afterwards. Pin: no shingle/vector column inside
    any bucket-keyed Exchange subtree."""
    from msgvault_spark.dedup.embedding import lsh_near_dups
    from msgvault_spark.dedup.minhash import build_minhash_index, pairs_from_index

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f h")],
        "doc_id long, text string",
    )
    idx = build_minhash_index(docs, "doc_id", "text")
    plan = pairs_from_index(idx)._jdf.queryExecution().executedPlan().toString()

    import re

    def slim_pair_projection(plan_str):
        """True iff the projection sitting directly on the bucket
        self-join is exactly [id_a, id_b] — i.e. heavy payloads are
        decorated onto the pair list AFTER the join, never through it."""
        lines = plan_str.splitlines()
        for n, line in enumerate(lines):
            if re.search(r"(SortMergeJoin|ShuffledHashJoin) \[bucket", line):
                return bool(
                    re.search(
                        r"Project \[id_a#\d+L?, id_b#\d+L?\]\s*$",
                        lines[n - 1],
                    )
                )
        return False

    assert slim_pair_projection(plan), "shingles ride the bucket join"

    embs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1])],
        "vec_id long, embedding array<double>",
    )
    eplan = (
        lsh_near_dups(embs, 0.5, dim=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert slim_pair_projection(eplan), "vectors ride the bucket join"


def test_semantic_dedup_drops_planted_duplicates(spark):
    """SemDeDup: planted exact/near-duplicate vectors must drop (keeping
    the lowest id), dissimilar vectors must all survive, and cluster
    confinement must not produce cross-cell drops."""
    import math
    from pyspark.sql import functions as F
    from msgvault_spark.dedup.semdedup import (
        semantic_dedup,
        semantic_dedup_summary,
    )

    def vec(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    rows = []
    # two well-separated clusters of 3 orthogonal-ish members each
    for i, th in enumerate([0.0, 0.5, 1.0]):
        rows.append((i, vec(th)))
    for i, th in enumerate([3.0, 3.5, 4.0]):
        rows.append((10 + i, vec(th)))
    # planted near-dups: 100 ~ id 0 (same direction), 101 ~ id 11
    rows.append((100, vec(0.001)))
    rows.append((101, vec(3.501)))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    flags = semantic_dedup(
        emb, n_cells=2, threshold=0.99, id_col="vec_id", vec_col="embedding"
    )
    got = {r["id"]: r["is_survivor"] for r in flags.collect()}
    assert got[100] is False and got[101] is False  # planted dups dropped
    for keep in (0, 1, 2, 10, 11, 12):
        assert got[keep] is True  # originals all survive (lowest-id rule)
    summary = {r["cell"]: (r["n_members"], r["n_survivors"])
               for r in semantic_dedup_summary(flags).collect()}
    assert sum(m for m, _ in summary.values()) == 8
    assert sum(s for _, s in summary.values()) == 6


def test_kmv_overlap_tracks_exact_jaccard(spark):
    """KMV sketch estimate vs ground truth on planted overlap: sources A
    and B share half of A's text; A↔C share nothing. With k larger than
    the distinct-shingle count the 'estimate' must be EXACT (the sketch
    is the full set); with a small k it must still separate the
    overlapping pair from the disjoint one."""
    from msgvault_spark.operators.kmv import kmv_overlap, kmv_sketches

    shared = " ".join(f"common{i}" for i in range(30))
    a_only = " ".join(f"alpha{i}" for i in range(30))
    b_only = " ".join(f"beta{i}" for i in range(30))
    c_only = " ".join(f"gamma{i}" for i in range(60))
    docs = spark.createDataFrame(
        [
            (1, shared + " " + a_only, "A"),
            (2, shared + " " + b_only, "B"),
            (3, c_only, "C"),
        ],
        "doc_id long, text string, source string",
    )

    # k big enough to hold every shingle -> exact Jaccard
    exact = {
        (r["source_a"], r["source_b"]): r
        for r in kmv_overlap(kmv_sketches(docs, k=500), k=500).collect()
    }
    ab = exact[("A", "B")]
    # shingle-level Jaccard of the two texts, computed independently
    from msgvault_spark.dedup.minhash import word_shingles
    from pyspark.sql import functions as F

    sh = {
        r["source"]: set(r["s"])
        for r in docs.select(
            "source", F.explode(word_shingles(F.col("text"), 3)).alias("s")
        ).groupBy("source").agg(F.collect_set("s").alias("s")).collect()
    }
    truth = len(sh["A"] & sh["B"]) / len(sh["A"] | sh["B"])
    assert abs(ab["jaccard_est"] - truth) < 1e-6
    assert exact[("A", "C")]["matched"] == 0
    assert exact[("B", "C")]["matched"] == 0

    # small k: still separates overlap from disjoint, k_eff == k
    small = {
        (r["source_a"], r["source_b"]): r
        for r in kmv_overlap(kmv_sketches(docs, k=16), k=16).collect()
    }
    assert small[("A", "B")]["k_eff"] == 16
    assert small[("A", "B")]["jaccard_est"] > 0.1
    assert small[("A", "C")]["matched"] == 0


def test_allpairs_blocked_gemm_matches_naive(spark):
    """The blocked-GEMM candidate phase must be exactness-preserving: every
    pair the naive theta-join cosine emits (and nothing else), including
    same-group pairs (the diagonal tile emits each pair twice pre-mask),
    zero vectors (NULL cosine drops), and pairs whose unrounded cosine
    sits just under the threshold but ROUNDS up to it (the margin must be
    wider than the rounding half-ulp)."""
    import math

    from msgvault_spark.dedup.embedding import allpairs_near_dups

    def vec(theta):
        return [math.cos(theta), math.sin(theta), 0.0]

    rows = []
    # a tight bundle: many mutual near-dups (some will share a hash group,
    # exercising the diagonal-tile upper-triangle mask)
    for i in range(12):
        rows.append((i, vec(0.001 * i)))
    # far-away singletons: no pairs
    rows.append((100, vec(2.0)))
    rows.append((101, vec(4.0)))
    # zero vector: cosine NULL against everything, never emitted
    rows.append((200, [0.0, 0.0, 0.0]))
    # rounding-boundary pair: cos just under 0.45 that rounds to 0.45
    # (angle whose cosine is 0.4499996) against the x-axis seed
    rows.append((300, [1.0, 0.0, 0.0]))
    th = math.acos(0.4499996)
    rows.append((301, [math.cos(th), math.sin(th), 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # force multiple groups so diagonal AND off-diagonal tiles both occur
    got = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in allpairs_near_dups(emb, 0.45, group_rows=4).collect()
    }

    # naive reference: the original single-phase theta-join expression
    from pyspark.sql import functions as F
    from msgvault_spark.similarity.knn import cosine, _as_double

    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    naive = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos", F.round(cosine(_as_double(F.col("va")), _as_double(F.col("vb"))), 6)
        )
        .filter(F.col("cos") >= 0.45)
        .select("id_a", "id_b", "cos")
    )
    want = {(r["id_a"], r["id_b"]): r["cos"] for r in naive.collect()}

    assert got == want
    assert (300, 301) in got  # the round-up boundary pair survived
    assert not any(200 in p for p in got)  # zero vector never pairs
    # no duplicate emission: dict equality above already proves values,
    # but assert the DataFrame itself has no repeated (id_a, id_b) rows
    df = allpairs_near_dups(emb, 0.45, group_rows=4)
    assert df.count() == df.select("id_a", "id_b").distinct().count()


def test_semantic_contamination_gemm_twin(spark):
    """decontaminate.semantic_contamination_gemm must emit BIT-identical
    rows to the interpreted-fold semantic_contamination on every input:
    the real sf0.01 corpus (catalog parameters), an adversarial corpus
    (identicals, threshold straddle, zero-norm, NULL vector), and an
    empty benchmark."""
    import math

    from msgvault_spark.dedup.decontaminate import (
        semantic_contamination,
        semantic_contamination_gemm,
    )
    from msgvault_spark.sources.loader import load_table

    def rows(df):
        return sorted((r["id"], repr(r["max_sim"])) for r in df.collect())

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    bench = emb.filter(F.col("vec_id") % 100 == 0)
    fold = rows(semantic_contamination(emb, bench, threshold=0.35))
    gemm = rows(semantic_contamination_gemm(emb, bench, threshold=0.35))
    assert fold == gemm
    assert fold  # the real corpus must flag something

    adv = spark.createDataFrame(
        [
            (0, [1.0, 0.5, 0.25, 0.125]),       # bench member (vec_id%2==0)
            (1, [1.0, 0.5, 0.25, 0.125]),       # identical → sim 1.0
            (2, [-1.0, -0.5, 0.26, 0.125]),     # bench member
            (3, [-1.0, -0.5, -0.25, 0.80]),     # straddles the threshold
            (4, [0.0, 0.0, 0.0, 0.0]),          # zero norm: bench member
            (5, None),                          # NULL vector
            (7, [math.pi, -1 / 3, 1e-7, 2 / 3]),
        ],
        "vec_id long, embedding array<double>",
    )
    b2 = adv.filter(F.col("vec_id") % 2 == 0)
    f2 = rows(semantic_contamination(adv, b2, threshold=0.9))
    g2 = rows(semantic_contamination_gemm(adv, b2, threshold=0.9))
    assert f2 == g2
    assert any(i == 1 for i, _ in f2)
    assert not any(i in (4, 5) for i, _ in f2)

    empty_bench = adv.filter(F.col("vec_id") < 0)
    assert rows(semantic_contamination_gemm(adv, empty_bench)) == []

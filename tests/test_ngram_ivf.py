"""n-gram Jaccard dedup (prefix filtering) + IVF ANN."""

from __future__ import annotations

from pyspark.sql import functions as F

from msgvault_spark.dedup.ngram import ngram_jaccard_pairs
from msgvault_spark.similarity.ivf import build_ivf_index, ivf_search
from msgvault_spark.similarity.knn import knn_bruteforce


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different text about spark engines"),
            (4, "the quick brown fox jumps over the lazy dog"),
        ],
        ["doc_id", "text"],
    )


def test_ngram_exact_dup_and_near_dup(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            _docs(spark), "doc_id", "text", n=2, threshold=0.5
        ).collect()
    }
    assert pairs[(1, 4)] == 1.0  # exact duplicate
    assert 0.5 <= pairs[(1, 2)] < 1.0  # one word differs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ngram_prefix_filter_matches_naive(spark):
    docs = _docs(spark)
    with_f = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.3).collect()
    without = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.3, prefix_filter=False
    ).collect()
    assert [tuple(r) for r in with_f] == [tuple(r) for r in without]


def _vectors(spark):
    # two well-separated clusters around (1,0) and (0,1)
    rows = [
        (0, [1.0, 0.05]), (1, [0.05, 1.0]),  # the 2 cells' centroids
        (2, [0.9, 0.1]), (3, [0.95, 0.0]), (4, [0.1, 0.9]), (5, [0.0, 0.95]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_ivf_assignment_and_search(spark):
    emb = _vectors(spark)
    index = build_ivf_index(emb, n_cells=2)
    cells = {r["id"]: r["cell"] for r in index.collect()}
    assert cells[2] == 0 and cells[3] == 0 and cells[4] == 1 and cells[5] == 1

    # nprobe=1 restricts the scan to the seed's own cluster
    seed = [1.0, 0.05]
    got = ivf_search(
        index, emb, seed, k=3, n_cells=2, nprobe=1, exclude_id=0
    ).collect()
    assert [r["id"] for r in got] == [3, 2]

    # nprobe = n_cells degenerates to exact brute-force
    full = ivf_search(index, emb, seed, k=5, n_cells=2, nprobe=2, exclude_id=0)
    brute = knn_bruteforce(emb, seed, k=5, round_to=6, exclude_id=0)
    assert [r["id"] for r in full.collect()] == [r["id"] for r in brute.collect()]


def test_kmeans_centroids_converge_and_improve(spark):
    """Lloyd's on three well-separated synthetic clusters must place one
    centroid per cluster (matching a numpy reference run) and beat the
    lowest-id init on within-cluster cosine."""
    import numpy as np

    from msgvault_spark.similarity.ivf import train_centroids_kmeans

    rng = np.random.default_rng(11)
    protos = np.array([[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0]], dtype=float)
    rows = []
    for i in range(150):
        base = protos[i % 3] + rng.normal(0, 0.5, 4)
        rows.append((i, [float(x) for x in base]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = train_centroids_kmeans(emb, n_cells=3, n_iter=8)
    got = {r["cid"]: np.array(r["cvec"]) for r in cents.collect()}
    assert len(got) == 3
    # every prototype direction is captured by exactly one centroid
    claimed = set()
    for c in got.values():
        sims = protos @ c / (np.linalg.norm(protos, axis=1) * np.linalg.norm(c))
        claimed.add(int(np.argmax(sims)))
        assert sims.max() > 0.99
    assert claimed == {0, 1, 2}


# ---------------------------------------------------------------------------
# Product quantization (similarity/pq.py)
# ---------------------------------------------------------------------------


def _toy_vectors(spark, n=40, d=8):
    rows = []
    for i in range(n):
        # two well-separated clusters so PQ recall is meaningful
        base = 10.0 if i % 2 else -10.0
        rows.append((i, [float(base + ((i * 7 + j * 3) % 5) - 2) for j in range(d)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_encode_shape_and_determinism(spark):
    from msgvault_spark.similarity.pq import collect_codebooks, encode_pq

    emb = _toy_vectors(spark)
    books = collect_codebooks(emb, m=2, n_codes=4)
    assert len(books) == 2 and len(books[0]) == 4 and len(books[0][0]) == 4
    codes = encode_pq(emb, books)
    rows = {r["id"]: (r["code_0"], r["code_1"]) for r in codes.collect()}
    assert len(rows) == 40
    assert all(0 <= c < 4 for pair in rows.values() for c in pair)
    # codewords encode to themselves (distance 0 to their own slice)
    for i in range(4):
        assert rows[i] == (i, i)
    # deterministic across a re-plan
    rows2 = {r["id"]: (r["code_0"], r["code_1"]) for r in encode_pq(emb, books).collect()}
    assert rows == rows2


def test_pq_adc_ranks_near_cluster_first(spark):
    from msgvault_spark.similarity.pq import (
        adc_lut,
        collect_codebooks,
        encode_pq,
        pq_search,
    )

    emb = _toy_vectors(spark)
    books = collect_codebooks(emb, m=2, n_codes=4)
    codes = encode_pq(emb, books)
    query = [10.0] * 8  # sits in the odd (positive) cluster
    top = pq_search(codes, adc_lut(books, query), k=10).collect()
    assert len(top) == 10
    assert all(r["id"] % 2 == 1 for r in top), "ADC must rank the near cluster first"
    # scores are exact integers, descending
    scores = [r["qscore_scaled"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_pq_is_pure_map_no_shuffle(spark):
    from msgvault_spark.similarity.pq import collect_codebooks, encode_pq

    emb = _toy_vectors(spark)
    books = collect_codebooks(emb, m=2, n_codes=4)
    plan = encode_pq(emb, books)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "PQ encode must not shuffle"


# ---------------------------------------------------------------------------
# random projection (similarity/rp.py)
# ---------------------------------------------------------------------------


def test_rp_preserves_cosine_structure(spark):
    import math
    from pyspark.sql import functions as F
    from msgvault_spark.similarity.rp import project

    emb = _toy_vectors(spark, n=40, d=8)
    proj = {r["id"]: r["proj"] for r in project(
        emb, out_dim=4, in_dim=8).collect()}
    orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a))
                      * math.sqrt(sum(y * y for y in b)))

    # same-cluster pairs stay similar, cross-cluster pairs stay dissimilar
    same = [cos(proj[1], proj[3]), cos(proj[2], proj[4])]
    cross = [cos(proj[1], proj[2]), cos(proj[3], proj[4])]
    assert min(same) > max(cross)
    # deterministic across re-plan
    proj2 = {r["id"]: r["proj"] for r in project(
        emb, out_dim=4, in_dim=8).collect()}
    assert proj == proj2


def test_rp_is_shuffle_free(spark):
    from msgvault_spark.similarity.rp import project

    emb = _toy_vectors(spark, n=10, d=8)
    plan = project(emb, out_dim=4, in_dim=8)._jdf.queryExecution(
        ).executedPlan().toString()
    assert "Exchange" not in plan


def test_exact_knn_join_partitioning_independent(spark):
    """exact_knn_join's two-level top-k must return the true per-query
    top-k regardless of how the corpus is partitioned (level 1 keeps a
    superset per input partition; level 2 reduces it)."""
    import random

    from pyspark.sql import functions as F

    from msgvault_spark.similarity.knn import knn_bruteforce
    from msgvault_spark.similarity.knnjoin import exact_knn_join

    random.seed(3)
    dim = 8
    rows = [(i, [random.uniform(-1, 1) for _ in range(dim)])
            for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qset = emb.filter(F.col("vec_id") < 3)
    for parts in (1, 7):
        got = exact_knn_join(emb.repartition(parts), qset, k=5)
        by_q = {}
        for r in got.collect():
            by_q.setdefault(r["qid"], []).append((r["id"], r["score"]))
        for qid in (0, 1, 2):
            qv = rows[qid][1]
            want = [
                (r["id"], r["score"])
                for r in knn_bruteforce(
                    emb, qv, k=5, round_to=6, exclude_id=qid
                ).collect()
            ]
            assert sorted(by_q[qid]) == sorted(want), (parts, qid)


def test_ivf_knn_join_matches_per_seed_search(spark):
    """Batch IVF retrieval (ivf_knn_join) must return, per query, exactly
    what the serving path (ivf_search) returns for that seed — the
    batch=serving equivalence the recall report relies on."""
    import random

    from pyspark.sql import functions as F

    from msgvault_spark.similarity.ivf import (
        build_ivf_index,
        ivf_knn_join,
        ivf_search,
    )
    from msgvault_spark.similarity.knn import _as_double

    random.seed(5)
    dim = 8
    rows = [(i, [random.uniform(-1, 1) for _ in range(dim)])
            for i in range(150)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    index = build_ivf_index(emb, n_cells=4)
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cid"), _as_double(F.col("embedding")).alias("cvec")
    )
    qset = emb.filter(F.col("vec_id") < 3)
    batch = ivf_knn_join(index, cents, qset, k=5, nprobe=2)
    by_q = {}
    for r in batch.collect():
        by_q.setdefault(r["qid"], []).append((r["id"], r["score"]))
    for qid in (0, 1, 2):
        want = [
            (r["id"], r["score"])
            for r in ivf_search(
                index, emb, rows[qid][1], k=5, n_cells=4, nprobe=2,
                exclude_id=qid,
            ).collect()
        ]
        assert sorted(by_q.get(qid, [])) == sorted(want), qid

"""Connected components over a near-dup pair graph.

Pairwise dedup (MinHash-LSH, n-gram Jaccard, embedding cosine) emits EDGES;
merge policy needs CLUSTERS — A~B, B~C must collapse A,B,C together even
when A~C was never emitted. That's connected components, the step between
candidate pairs and survivor selection in every at-scale dedup pipeline.

Algorithm: min-label propagation WITH POINTER JUMPING (path compression —
the contraction device of small-star/large-star, Kiveris et al. "Connected
Components in MapReduce and Beyond", SOCC'14, and of classic
Shiloach-Vishkin): each round every node adopts the smallest label in its
closed neighborhood, then additionally adopts its label's label
(label[label[v]]). Propagation alone needs O(diameter) rounds — a
1000-node chain would take ~1000; the jump step more than doubles the
reach per round, giving O(log diameter): the same chain converges in ~12.
Near-dup clusters are shallow anyway, but the bound now holds for
adversarial shapes too. Each round is two shuffle joins + one aggregate,
all JVM-side; state is localCheckpoint'ed per round so plans don't grow.

DataFrame-only by design: no GraphX/graphframes dependency (GraphX is
RDD-based and JVM-package-gated; this stays in the DataFrame planner with
AQE + whole-stage codegen).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from msgvault_spark.planmem import unpersist_local_checkpoint

from msgvault_spark.operators.present import present_sorted


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = smallest
    node id reachable. Edges are undirected (either orientation works) and
    may contain duplicates/self-loops.

    Per-round cost discipline: the label frame is partitioned relative to
    the GRAPH size (from the node count the contract already pays for),
    not the session's global shuffle width — a 500-node dedup graph runs
    2-partition rounds instead of 32 empty-task shuffles, and a
    billion-node graph still fans out fully. Convergence is detected by
    comparing Σlabel across rounds: labels only ever shrink (min-label +
    monotone jump), so the sum is strictly decreasing until fixpoint —
    one cheap aggregate per round instead of a join + count job."""
    both = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    # node universe BEFORE dropping self-loops: a node appearing only as
    # (x, x) is still a (singleton) component per the contract
    labels = (
        both.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_nodes = labels.count()
    spark = edges.sparkSession
    default_p = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_part = max(1, min(default_p, n_nodes // 50_000 + 1))
    labels0 = labels  # the persisted source frame, freed after round 1
    labels = labels.repartition(n_part, "node")
    sym = (
        both.filter(F.col("a") != F.col("b"))
        .distinct()
        .repartition(n_part, "a")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    prev_sum = labels.agg(
        F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    ).head()["s"]
    for _ in range(max_iter):
        # smallest label among neighbors, per node
        neigh_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("label").alias("nmin"))
        )
        cand = labels.join(
            neigh_min, labels["node"] == F.col("node2"), "left"
        ).select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
            ).alias("label"),
        )
        # pointer jump: also adopt label[label[v]] — labels only ever
        # shrink, so the jump is monotone-safe and compresses chains
        # geometrically (O(log diameter) rounds instead of O(diameter))
        jump = cand.select(
            F.col("node").alias("jnode"), F.col("label").alias("jlabel")
        )
        # localCheckpoint (not just persist): truncates lineage so the
        # logical plan stays constant-size across rounds — chained
        # iteration plans otherwise grow until Catalyst itself chokes
        # (see similarity/ivf.py:train_centroids_kmeans note)
        new_labels = (
            cand.join(jump, cand["label"] == F.col("jnode"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("jlabel"), F.col("label"))
                ).alias("label"),
            )
            .coalesce(n_part)
            .localCheckpoint(eager=True)
        )
        # Σlabel as the fixpoint witness (decimal: no overflow at any n);
        # labels are monotone non-increasing per node, so sum-equality ⇔
        # no node changed.
        new_sum = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).head()["s"]
        # free the superseded round NOW: checkpoint blocks need the
        # RDD-handle unpersist (DataFrame.unpersist is a CacheManager
        # no-op for them); round 1's predecessor is the persisted source
        # frame, which the plain unpersist does handle
        if not unpersist_local_checkpoint(labels):
            labels0.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")

    sym.unpersist()
    return labels.select("node", F.col("label").alias("component"))


def component_sizes(components: DataFrame) -> DataFrame:
    """Histogram: (size, n_components), size ascending."""
    return (
        components.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_components"))
        .transform(present_sorted, "size")
    )

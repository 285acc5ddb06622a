"""Integer-arithmetic PageRank over a pair graph (fixed iteration count).

The dedup family turns candidate pairs into clusters (connected
components, dedup/components.py); PageRank answers the next curation
question — WHICH documents sit at the center of a near-duplicate
neighborhood (template hubs, boilerplate attractors) versus its fringe.
Centrality over the near-dup graph is the standard triage signal for
"delete the hub, audit the fringe" policies.  The reference engine
(wesm/msgvault) has no counterpart; this is part of the LLM-pipeline
extension surface.

Numeric design — engine-exact without a single float:
  - ranks are micro-fixed-point LONGS, r0 = 1_000_000 per node;
  - per-edge contribution is integer division r div deg (exact, and the
    per-node SUM of longs is order-free — no float summation order to
    disagree on);
  - the damping update is r' = (1-d)·1e6 + (d_pct · Σcontrib) div 100,
    again all-integer.  Spark's `div` and DuckDB's `//` both truncate
    toward zero (verified: -7 // 2 = -3 in DuckDB), so they agree for
    any sign, not just the non-negative values here.
A fixed iteration count (default 5) replaces convergence detection so
the DuckDB oracle can replay the exact computation as unrolled CTEs.

Scale shape (100 TB): each iteration is one shuffle join of the rank
table with the (symmetrized, deduped) edge list keyed by source node,
plus one groupBy(dst) with map-side combine — the Pregel step expressed
in DataFrame ops.  State per iteration is the O(nodes) rank table;
`localCheckpoint` truncates lineage so the plan stays constant-size per
round, and each superseded round's blocks are unpersisted as soon as the
next round materializes (the components.py discipline) — in-flight
storage is O(2·nodes), not O(iters·nodes).  Skewed hubs are absorbed by the
partial aggregate; AQE splits oversized post-join partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iters: int = 5,
    damping_pct: int = 85,
    checkpoint: bool = True,
) -> DataFrame:
    """(node, rank_micro) after ``iters`` damped power-iteration rounds
    over the undirected graph of ``edges`` (self-loops dropped,
    duplicate edges collapsed; isolated self-loop-only nodes keep the
    base rank)."""
    both = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    nodes_all = both.select(F.col("a").alias("node")).distinct()
    sym = both.filter(F.col("a") != F.col("b")).distinct()
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    base = SCALE - SCALE * damping_pct // 100
    r = nodes_all.join(deg, nodes_all.node == deg.a, "left").select(
        "node",
        F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("deg"),
        F.lit(SCALE).cast("long").alias("rank"),
    )
    prev_ckpt: DataFrame | None = None
    for _ in range(iters):
        contrib = (
            r.filter(F.col("deg") > 0)
            .join(sym, r.node == sym.a)
            .select(
                F.col("b").alias("node"),
                F.expr("rank div deg").alias("c"),
            )
        )
        inc = contrib.groupBy("node").agg(
            F.sum("c").cast("long").alias("s")
        )
        r = (
            r.select("node", "deg")
            .join(inc, "node", "left")
            .select(
                "node",
                "deg",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(s, 0L)) div 100"
                    )
                ).cast("long").alias("rank"),
            )
        )
        if checkpoint:
            # eager, then unpersist the superseded round: once round k is
            # materialized, round k-1's blocks serve nothing — lazy
            # checkpoints kept every round live inside the one final
            # action, O(iters·nodes) storage at the worst possible
            # moment; this holds it at O(2·nodes). Checkpoint blocks
            # need the RDD-handle unpersist (planmem) — the DataFrame
            # method is a CacheManager no-op for them.
            from msgvault_spark.planmem import unpersist_local_checkpoint

            r = r.localCheckpoint(eager=True)
            if prev_ckpt is not None:
                unpersist_local_checkpoint(prev_ckpt)
            prev_ckpt = r
    return r.select("node", F.col("rank").alias("rank_micro"))


def pagerank_oracle_sql(
    pairs_sql: str,
    *,
    iters: int = 5,
    damping_pct: int = 85,
) -> str:
    """DuckDB twin: the identical integer power iteration, unrolled one
    CTE per round (a recursive CTE can't aggregate in its recursive
    term; a generated fixed unroll replays the exact computation).
    ``pairs_sql`` must yield (id_a, id_b)."""
    base = SCALE - SCALE * damping_pct // 100
    rounds = []
    for k in range(1, iters + 1):
        rounds.append(
            f"""r{k} AS (
    SELECT n.node, n.deg,
           CAST({base} + ({damping_pct} * COALESCE(s.s, 0)) // 100
                AS BIGINT) AS rank
    FROM r0 n LEFT JOIN (
        SELECT e.b AS node, CAST(SUM(r.rank // r.deg) AS BIGINT) AS s
        FROM r{k - 1} r JOIN sym e ON e.a = r.node
        WHERE r.deg > 0
        GROUP BY 1
    ) s USING (node)
)"""
        )
    chain = ",\n".join(rounds)
    return f"""
WITH pairs AS (
    SELECT id_a, id_b FROM ({pairs_sql}) t
),
both_dir AS (SELECT id_a AS a, id_b AS b FROM pairs
             UNION ALL SELECT id_b, id_a FROM pairs),
nodes AS (SELECT DISTINCT a AS node FROM both_dir),
sym AS (SELECT DISTINCT a, b FROM both_dir WHERE a != b),
deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY a),
r0 AS (
    SELECT n.node, COALESCE(d.deg, 0) AS deg,
           CAST({SCALE} AS BIGINT) AS rank
    FROM nodes n LEFT JOIN deg d ON d.a = n.node
),
{chain}
SELECT node, rank AS rank_micro FROM r{iters}
ORDER BY node
"""

"""Integer-exact PageRank — iterative graph analytics as a driver-driven
loop over node-sized frames (round 7).

The components operator (operators/components.py) answers "which
nodes are connected"; this answers "which nodes matter" — the other
half of the graph-analytics surface (dedup-cluster authority, link
spam scoring, entity salience). Same execution doctrine as the BPE
trainer (operators/bpe.py): the corpus-scale work happens ONCE (edge
construction, degree count); the fixed-k iteration loop runs over
NODE-sized frames driven from the driver, each iteration
localCheckpoint'ed so plan depth stays O(1).

Exactness device: ranks are BIGINT rationals at SCALE = 10¹² — every
step is integer arithmetic (r DIV outdeg per edge, (85·s) DIV 100 for
damping, (15·SCALE) DIV (100·n) for the teleport term), so the result
is bit-identical on any engine and any partitioning, and the DuckDB
oracle replays the identical k iterations as an unrolled MATERIALIZED
CTE chain (the q127 device). Truncation error vs float PageRank is
≤ k·outdeg ulps at 1e-12 — irrelevant for ranking, decisive for
hash-checkability.

Scale shape (100 TB): per iteration, one edge-keyed equi-join
(ranks ⋈ edges on src — co-partition both by src once and every
iteration's join is shuffle-free; AQE broadcasts the node frame while
it fits) and one dst-keyed agg with map-side partial sums (hot
dst nodes — celebrities — collapse before the exchange). k is fixed
and small; nothing is quadratic. Dangling nodes are the caller's
contract: symmetrize_edges() guarantees outdeg ≥ 1 for every node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12
PR_DAMP_PCT = 85  # damping factor 0.85 as an integer percentage


def symmetrize_edges(pairs: DataFrame) -> DataFrame:
    """(src, dst) distinct pairs → both directions, so the graph is
    undirected and no node is dangling (every node has outdeg ≥ 1)."""
    return pairs.select("src", "dst").union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def pagerank(edges: DataFrame, iters: int = 4) -> DataFrame:
    """Integer-exact PageRank over a symmetric edge list.

    edges: DataFrame(src string, dst string), outdeg ≥ 1 for every
    node (use symmetrize_edges). Returns (node, r) with r the
    SCALE-scaled BIGINT rank after `iters` damped iterations from the
    uniform start r₀ = SCALE DIV n.
    """
    # one corpus-scale pass: degree per node; node set == deg keys
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("outdeg"))
    nn = F.broadcast(deg.agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    # edges carry their src outdeg once, checkpointed: the loop below
    # never re-derives corpus-scale state (the bpe.py rule)
    ed = edges.join(deg, "src").localCheckpoint(eager=True)
    ranks = (
        deg.select(F.col("src").alias("node"))
        .crossJoin(nn)
        .select("node", F.expr(f"CAST({PR_SCALE} DIV n AS BIGINT)").alias("r"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        s = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(F.col("dst"), F.expr("CAST(r DIV outdeg AS BIGINT)").alias("c"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").cast("bigint").alias("s"))
        )
        ranks = (
            ranks.select("node")
            .join(s, "node", "left")
            .crossJoin(nn)
            .select(
                "node",
                F.expr(
                    f"CAST(({100 - PR_DAMP_PCT} * {PR_SCALE}) DIV (100 * n)"
                    f" + ({PR_DAMP_PCT} * coalesce(s, CAST(0 AS BIGINT))) DIV 100"
                    " AS BIGINT)"
                ).alias("r"),
            )
            .localCheckpoint(eager=True)  # plan depth stays O(1) per iteration
        )
    return ranks

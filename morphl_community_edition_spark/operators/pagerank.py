"""Integer-exact PageRank — iterative graph analytics as a driver-driven
loop over node-sized frames (round 7; hardened round 8).

The components operator (operators/components.py) answers "which
nodes are connected"; this answers "which nodes matter" — the other
half of the graph-analytics surface (dedup-cluster authority, link
spam scoring, entity salience). Same execution doctrine as the BPE
trainer (operators/bpe.py): the corpus-scale work happens ONCE (edge
construction, degree count); the fixed-k iteration loop runs over
NODE-sized frames driven from the driver, each iteration
lineage-truncated so plan depth stays O(1).

Exactness device: ranks are BIGINT rationals at SCALE = 10¹² — every
step is integer arithmetic (r DIV outdeg per edge, (85·s) DIV 100 for
damping, (15·SCALE) DIV (100·n) for the teleport term), so the result
is bit-identical on any engine and any partitioning, and the DuckDB
oracle replays the identical k iterations as an unrolled MATERIALIZED
CTE chain (the q127 device). Truncation error vs float PageRank is
≤ k·outdeg ulps at 1e-12 — irrelevant for ranking, decisive for
hash-checkability.

Scale shape (100 TB), implemented not just promised (round 8):
the degree-carrying edge list is hash-partitioned by src ONCE and
``persist()``-ed — an InMemoryRelation preserves outputPartitioning,
so every iteration's ranks⋈edges join reuses it and the CORPUS-SCALE
side never re-shuffles (plan-gated: no ENSURE_REQUIREMENTS exchange on
src in the iteration plan). What does move per iteration is strictly
NODE-sized: the checkpoint-truncated ranks frame shuffles to meet the
join (AQE broadcasts it instead while it fits), and the contribution
sum exchanges on dst with map-side partial aggregation, so hot dst
nodes (celebrities) collapse before the wire. Nothing is quadratic;
k is fixed and small. Dangling nodes are the caller's contract:
symmetrize_edges() guarantees outdeg ≥ 1 for every node.

Durability (round 8): per-iteration truncation goes through
``operators/checkpointing.loop_checkpoint`` — default localCheckpoint
for local runs; ``reliable=True`` switches to durable
``DataFrame.checkpoint`` against the configured checkpoint dir so an
executor loss mid-loop recomputes instead of aborting. The persisted
edge frame needs neither: persist keeps lineage, lost cache blocks
self-heal by recomputation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from morphl_community_edition_spark.operators.checkpointing import (
    ensure_checkpoint_dir,
    loop_checkpoint,
)

PR_SCALE = 10**12
PR_DAMP_PCT = 85  # damping factor 0.85 as an integer percentage


def symmetrize_edges(pairs: DataFrame) -> DataFrame:
    """(src, dst) distinct pairs → both directions, so the graph is
    undirected and no node is dangling (every node has outdeg ≥ 1)."""
    return pairs.select("src", "dst").union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _damped_update(s_col: str = "s") -> Column:
    """teleport + damped contribution sum, all BIGINT integer math."""
    return F.expr(
        f"CAST(({100 - PR_DAMP_PCT} * {PR_SCALE}) DIV (100 * n)"
        f" + ({PR_DAMP_PCT} * coalesce({s_col}, CAST(0 AS BIGINT))) DIV 100"
        " AS BIGINT)"
    )


def pagerank_step(ed: DataFrame, ranks: DataFrame, nn: DataFrame) -> DataFrame:
    """ONE damped iteration: contributions (src-keyed equi-join onto
    the degree-carrying edge frame), dst-keyed partial-agg sum, then
    the integer teleport/damping update. Factored out so the plan gate
    (tests/test_plans.py) can assert the iteration shape directly:
    the persisted src-partitioned edge side joins exchange-free, the
    contribution agg keeps map-side combine, and no FileScan (corpus
    re-read) appears anywhere in the loop body.

    Round 13 (guide §2.4 — remove shuffles outright): nodes that
    receive no contribution used to be re-attached by a node-keyed
    LEFT JOIN after the sum (one more exchange + two sorts per
    iteration). Instead every node now contributes an explicit 0 row
    into the SAME dst-keyed aggregation (the LPA self-vote device):
    sum(+0) is exact in BIGINT, every node appears exactly once, and
    _damped_update's coalesce sees 0 instead of NULL — identical
    ranks, one aggregation and zero joins of node frames per
    iteration.

    Precondition (advice r13): every dst in ``ed`` must appear in
    ``ranks.node`` — the output node set is ranks ∪ dst(edges), so an
    edge whose dst is absent from ranks would ADD a rank row the old
    left-join shape dropped. symmetrize_edges guarantees this (every
    node occurs as src and dst, and ranks0 = all srcs); callers
    feeding a hand-built edge frame must symmetrize first."""
    contrib = ed.join(ranks, ed["src"] == ranks["node"]).select(
        F.col("dst"), F.expr("CAST(r DIV outdeg AS BIGINT)").alias("c")
    )
    zero = ranks.select(F.col("node").alias("dst"), F.lit(0).cast("bigint").alias("c"))
    return (
        contrib.unionAll(zero)
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum("c").cast("bigint").alias("s"))
        .crossJoin(nn)
        .select("node", _damped_update().alias("r"))
    )


def pagerank_prepare(
    edges: DataFrame, reliable: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The loop's one-time corpus-scale setup: returns (ed, ranks0,
    nn, deg) — the degree-carrying edge frame hash-partitioned by src ONCE
    and ``persist()``-ed (an InMemoryRelation preserves that
    partitioning, so no iteration re-shuffles the edge side —
    plan-gated; and persist, unlike localCheckpoint, keeps lineage
    for durable self-healing), the uniform BIGINT start vector (a
    projection over the lineage-truncated node frame), and the node
    count as a broadcast LITERAL 1-row frame — materialized here
    exactly once so the k-loop never re-executes corpus lineage for
    the constant n (plan-gated: zero FileScans in an iteration over
    checkpointed inputs). Caller owns ``ed.unpersist()``."""
    spark = edges.sparkSession
    # one corpus-scale pass: degree per node; node set == deg keys.
    # deg is persist()-ed (node-sized) BEFORE its two consumers
    # (round-9 review): nodes0's eager checkpoint materializes it
    # here, and ed's first materialization then joins the CACHED
    # frame — previously the degree scan+agg ran a second time inside
    # ed's lineage, one redundant corpus pass per invocation
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("outdeg")
    ).persist()
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ed = edges.join(deg, "src").repartition(n_part, "src").persist()
    # node frame first, THEN count it off the truncated lineage: nn as
    # a literal one-row frame carries NO corpus lineage, so the k-loop
    # can crossJoin it without re-executing the degree agg (or, in
    # q143's case, the orders⋈lineitem build) every iteration — the
    # round-8 review caught exactly that re-derivation when nn was the
    # live broadcast agg frame
    nodes0 = loop_checkpoint(deg.select(F.col("src").alias("node")), reliable)
    n_nodes = nodes0.count()
    nn = F.broadcast(spark.createDataFrame([(n_nodes,)], "n bigint"))
    # empty graph: no rows flow anywhere, but the Python-side literal
    # below must not divide by zero (round-8 review) — the loop then
    # degrades to an empty (node, r) frame instead of crashing
    init_r = PR_SCALE // n_nodes if n_nodes else 0
    ranks0 = nodes0.select(
        "node", F.lit(init_r).cast("bigint").alias("r")
    )
    # deg's cache has served both consumers by the time the caller
    # acts on ed; node-sized, returned so the loop can release it
    # alongside the edge frame
    return ed, ranks0, nn, deg


def pagerank(
    edges: DataFrame,
    iters: int = 4,
    reliable: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Integer-exact PageRank over a symmetric edge list.

    edges: DataFrame(src string, dst string), outdeg ≥ 1 for every
    node (use symmetrize_edges). Returns (node, r) with r the
    SCALE-scaled BIGINT rank after ``iters`` damped iterations from
    the uniform start r₀ = SCALE DIV n.

    reliable=True: per-iteration lineage truncation uses durable
    ``DataFrame.checkpoint`` (set ``checkpoint_dir``, or configure
    ``sparkContext.setCheckpointDir`` yourself) so the loop survives
    executor loss — the cluster setting. Default localCheckpoint is
    the fast local path.
    """
    ensure_checkpoint_dir(edges.sparkSession, checkpoint_dir)
    ed, ranks, nn, deg = pagerank_prepare(edges, reliable)
    for _ in range(iters):
        # plan depth stays O(1) per iteration (loop_checkpoint)
        ranks = loop_checkpoint(pagerank_step(ed, ranks, nn), reliable)
    # final ranks are materialized independent of the cache by the
    # eager checkpoint above, so the edge cache can be dropped now
    ed.unpersist(blocking=False)
    deg.unpersist(blocking=False)
    return ranks

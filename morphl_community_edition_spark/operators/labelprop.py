"""Deterministic synchronous label propagation (community detection)
— round 8, completing the graph-analytics triple: connectivity
(operators/components.py), centrality (operators/pagerank.py),
COMMUNITIES (this module).

Public recipe: Raghavan et al. 2007 ("Near linear time algorithm to
detect community structures in large-scale networks"). Each node
adopts the most frequent label among its neighbours; communities
emerge where label majorities reinforce. Production uses next to the
dedup stack: near-dup cluster REFINEMENT (connected components
over-merge through chain pairs — a single borderline edge fuses two
tight groups; majority-vote communities split them back), template /
boilerplate family detection, and spam-farm grouping (the same role
PageRank plays for authority).

Determinism contract (the hash-exactness device shared with q143):
classic LPA breaks ties randomly and updates asynchronously — useless
for oracle checking. This variant is fully deterministic:

- SYNCHRONOUS rounds: iteration k+1 reads only iteration k's labels
  (order-independent, partitioning-independent);
- each neighbour votes its current label once per edge, plus ONE
  self-vote (the standard damping fix — without it a bipartite graph
  two-colour-oscillates forever; with it stable majorities lock in);
- winner = highest vote count, ties broken by SMALLEST label
  (labels are node ids, so min-label is the q77-components keeper
  convention; ASCII-lexicographic order is identical in Spark and
  DuckDB);
- fixed iteration count; labels start as each node's own id.

Every step is (count, min) integer/string math — no float anywhere —
so the DuckDB oracle replays the identical k rounds as an unrolled
MATERIALIZED CTE chain (the q127/q143 device) and the result
hash-matches exactly.

Scale shape (100 TB): one corpus-scale pass builds the node set; the
edge frame is hash-partitioned by src ONCE and persisted (the q143
device — InMemoryRelation preserves outputPartitioning, so no
iteration re-shuffles the corpus-scale side). Each iteration is one
edge-keyed equi-join (node-sized labels frame moves to the edges),
one (node, label) partial-count agg, and one node-keyed
min(struct(-cnt, label)) partial agg — NOT a window: min-of-struct
keeps map-side combine, so celebrity nodes collapse their vote lists
before the wire. Lineage per iteration truncated via
operators/checkpointing.loop_checkpoint (reliable=True for durable
cluster checkpoints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from morphl_community_edition_spark.operators.checkpointing import (
    ensure_checkpoint_dir,
    loop_checkpoint,
)


def label_propagation_step(ed: DataFrame, labels: DataFrame) -> DataFrame:
    """ONE synchronous LPA round: neighbour votes (src-keyed equi-join
    onto the persisted edge frame) + one self-vote per node, then the
    deterministic winner — max count, min-label tie-break — as a
    min(struct(-cnt, label)) PARTIAL agg (never a window; factored out
    so the plan gate can assert the iteration shape directly)."""
    votes = (
        ed.join(labels, ed["src"] == labels["node"])
        .select(F.col("dst").alias("n"), "label")
        .unionAll(labels.select(F.col("node").alias("n"), "label"))
    )
    counts = votes.groupBy("n", "label").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counts.groupBy("n")
        .agg(
            F.min(
                F.struct((-F.col("cnt")).alias("nc"), F.col("label").alias("lb"))
            ).alias("w")
        )
        .select(F.col("n").alias("node"), F.col("w.lb").alias("label"))
    )


def label_propagation(
    edges: DataFrame,
    iters: int = 4,
    reliable: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Deterministic synchronous label propagation over a symmetric
    edge list.

    edges: DataFrame(src, dst), symmetric (use
    operators/pagerank.symmetrize_edges), so every node appears as a
    src and no node is isolated from its own community vote. Returns
    (node, label) after ``iters`` rounds from labelᵢ₀ = node-id.

    reliable=True: per-iteration lineage truncation uses durable
    ``DataFrame.checkpoint`` (the loop_checkpoint contract shared
    with q143/q127) so the loop survives executor loss on a cluster.
    """
    spark = edges.sparkSession
    ensure_checkpoint_dir(spark, checkpoint_dir)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # corpus-scale work ONCE: node set + src-partitioned persisted edges
    ed = edges.repartition(n_part, "src").persist()
    # labels0 off the PERSISTED frame (round-8 review): deriving it
    # from raw `edges` re-scanned the corpus-scale source once more;
    # off `ed` the first action populates the cache and the distinct's
    # partial agg runs on the existing src partitioning — no extra
    # exchange, no second source scan
    labels = loop_checkpoint(
        ed.select("src").distinct().select(
            F.col("src").alias("node"), F.col("src").alias("label")
        ),
        reliable,
    )
    for _ in range(iters):
        labels = loop_checkpoint(label_propagation_step(ed, labels), reliable)
    ed.unpersist(blocking=False)
    return labels

"""Distributed triangle counting via degree-ordered edge orientation.

The naive triangle join (edges ⋈ edges ⋈ edges) enumerates every
WEDGE — Σ deg(v)² candidate rows — which a power-law graph turns
quadratic at its hubs (one celebrity node with deg 10⁶ contributes
10¹² wedges). The standard fix (Schank's forward algorithm / the
Suri-Vassilvitskii MapReduce formulation) orients every undirected
edge from its lower endpoint to its higher endpoint under the total
order (degree, node-id), and joins ORIENTED edges on their source:
out-degree under this orientation is bounded by O(√m) regardless of
the degree distribution, so candidate volume drops from Σ deg² to
Σ outdeg² ≤ m·√m — the bound that makes the join feasible at
billion-edge scale. Each triangle {x,y,z} then has exactly ONE vertex
with oriented edges to the other two (the order-minimum), so closure
checking counts every triangle exactly once — no /6 correction, no
double counting.

Shuffle shape: one node-sized degree aggregate, two edge⋈degree
equi-joins to attach endpoint degrees, one oriented⋈oriented
equi-join on the shared source (the Σ outdeg² step — map-side
bounded by orientation), and one closure equi-join back to the
oriented edge list on (lo, hi). All equi-joins on graph keys; AQE
handles residual source skew by splitting the hot src partitions.
The per-corner count is a plain hash agg over 3 rows per triangle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _order_lt(d1: Column, n1: Column, d2: Column, n2: Column) -> Column:
    """The orientation total order: (degree, node-id) lexicographic."""
    return (d1 < d2) | ((d1 == d2) & (n1 < n2))


def orient_edges(und: DataFrame) -> DataFrame:
    """Orient an undirected simple edge list (columns ``a`` < ``b``,
    distinct) by (degree, id): returns (src, dst, src_deg, dst_deg)
    with src strictly lower than dst in the total order."""
    sym = und.select(F.col("a").alias("node")).unionAll(
        und.select(F.col("b").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    e = (
        und.join(deg.withColumnsRenamed({"node": "a", "deg": "da"}), "a")
        .join(deg.withColumnsRenamed({"node": "b", "deg": "db"}), "b")
    )
    a_lt = _order_lt(F.col("da"), F.col("a"), F.col("db"), F.col("b"))
    return e.select(
        F.when(a_lt, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_lt, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_lt, F.col("da")).otherwise(F.col("db")).alias("src_deg"),
        F.when(a_lt, F.col("db")).otherwise(F.col("da")).alias("dst_deg"),
    )


def triangles(und: DataFrame, broadcast_closure: bool = False) -> DataFrame:
    """All triangles of an undirected simple graph (``a`` < ``b``
    distinct edge rows), one row per triangle as (x, y, z) — the
    orientation-order-ascending corner naming. Exact, each triangle
    exactly once.

    ``broadcast_closure``: the wedge frame (Σ outdeg² rows) is the
    dominant volume; hashing the closure EDGE LIST to every executor
    turns the closure check into a map-side probe, so the wedges are
    never shuffled. Callers size-gate this on the edge source's bytes
    (plans/hints.broadcast_if_small doctrine) — two BIGINTs per edge
    broadcasts fine up to tens of millions of edges; past the gate the
    shuffle join runs unchanged (and AQE may still promote it).

    Materialization (round 13, guide §7.2 "duplicated subtrees"): the
    oriented frame is referenced three times (e1, e2, closure) and
    itself references ``und`` five times (the edge row + two degree
    attachments over the two-sided symmetrization), so a lazy plan
    re-executes the caller's edge derivation ~15× — measured 180
    duplicate source scans and a 735-operator plan on q163 with zero
    ReusedExchange under a static plan. Both frames are edge-scale
    (never wedge-scale), so they are localCheckpoint-ed ONCE here and
    every downstream reference is a cheap RDD scan. localCheckpoint,
    not persist: CacheManager keys persisted plans canonically, so a
    persist would let a REPEATED invocation of the same query serve
    from the previous run's cache — exactly the cross-run reuse the
    honest-warm bench (and the no-precomputation rule) forbids.

    Cluster-durability caveat (advice r13, shared by every eager
    dedup-subtree pin: here, the SimHash signature pin, BM25's tfq
    pin, the trade-graph pair-set pin): localCheckpoint truncates
    lineage into EXECUTOR-LOCAL storage, so on a cluster with executor
    loss or dynamic allocation the query FAILS and re-runs instead of
    self-healing — the pins trade lineage durability for the measured
    duplicated-subtree elimination within one ad-hoc query invocation.
    Iterative loops that must survive mid-flight executor loss use
    operators/checkpointing.loop_checkpoint(reliable=True) instead;
    these single-shot query pins deliberately do not grow a flag until
    a deployment needs it (re-running an ad-hoc query is the normal
    recovery)."""
    und = und.localCheckpoint(eager=True)
    o = orient_edges(und).localCheckpoint(eager=True)
    e1 = o.select(
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.col("dst_deg").alias("dv"),
    )
    e2 = o.select(
        F.col("src").alias("u"),
        F.col("dst").alias("w"),
        F.col("dst_deg").alias("dw"),
    )
    # wedge (v, w) out of u, deduped by taking v strictly below w in
    # the orientation order — so the closure edge, if present, is
    # oriented v -> w by construction
    wedges = e1.join(e2, "u").where(
        _order_lt(F.col("dv"), F.col("v"), F.col("dw"), F.col("w"))
    )
    closure = o.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    if broadcast_closure:
        closure = F.broadcast(closure)
    return wedges.join(closure, ["v", "w"]).select(
        F.col("u").alias("x"), F.col("v").alias("y"), F.col("w").alias("z")
    )


def triangle_corner_counts(und: DataFrame, broadcast_closure: bool = False) -> DataFrame:
    """Per-node triangle participation: explode each triangle to its
    three corners and count — the local-clustering numerator.

    One pass over the triangle frame (round 13): the old 3-way
    ``unionAll`` referenced ``tri`` three times, replaying the wedge
    join + closure once per corner column; ``explode(array(x,y,z))``
    emits the identical corner multiset from a SINGLE execution of
    the triangle subtree (guide §2.4 — remove recomputation before
    tuning anything else)."""
    tri = triangles(und, broadcast_closure=broadcast_closure)
    corners = tri.select(
        F.explode(F.array("x", "y", "z")).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )

"""Interleaved A/B for the round-13 triangles materialization fix
(drift-immune measurement, the round-5 device): OLD = lazy oriented
frame + 3-way corner union (re-executes the edge derivation ~15x),
NEW = repo triangles.py (localCheckpoint und + oriented frame, explode
corners). Runs A,B,A,B,... in ONE session under the bench profile and
reports per-variant best plus a correctness cross-check.

Usage: python tools/ab_triangles.py [rounds=4]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from morphl_community_edition_spark.catalog import load_table  # noqa: E402
from morphl_community_edition_spark.operators.triangles import (  # noqa: E402
    _order_lt,
    orient_edges,
    triangle_corner_counts,
)
from morphl_community_edition_spark.plans.hints import (  # noqa: E402
    DEFAULT_BROADCAST_FILE_LIMIT,
)
from morphl_community_edition_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _old_corner_counts(und: DataFrame, broadcast_closure: bool) -> DataFrame:
    """The pre-round-13 implementation, verbatim: lazy frames, union."""
    o = orient_edges(und)
    e1 = o.select(F.col("src").alias("u"), F.col("dst").alias("v"),
                  F.col("dst_deg").alias("dv"))
    e2 = o.select(F.col("src").alias("u"), F.col("dst").alias("w"),
                  F.col("dst_deg").alias("dw"))
    wedges = e1.join(e2, "u").where(
        _order_lt(F.col("dv"), F.col("v"), F.col("dw"), F.col("w")))
    closure = o.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    if broadcast_closure:
        closure = F.broadcast(closure)
    tri = wedges.join(closure, ["v", "w"]).select(
        F.col("u").alias("x"), F.col("v").alias("y"), F.col("w").alias("z"))
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles"))


def _und(spark):
    li = load_table(spark, SF_DIR, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    pairs = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct().localCheckpoint(eager=True)
    est_edges = (
        pairs.groupBy("ok").agg(F.count(F.lit(1)).alias("k"))
        .agg(F.sum(F.col("k") * (F.col("k") - 1) / 2).alias("e"))
        .collect()[0]["e"] or 0
    )
    bc = est_edges * 16 <= DEFAULT_BROADCAST_FILE_LIMIT
    a = pairs.withColumnsRenamed({"pk": "a"})
    b = pairs.withColumnsRenamed({"pk": "b", "ok": "ok2"})
    und = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("a") < F.col("b")))
        .select("a", "b").distinct()
    )
    return und, bc


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="ab-triangles")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")

    def run_old():
        und, bc = _und(spark)
        return (_old_corner_counts(und, bc)
                .orderBy(F.col("n_triangles").desc(), "node").limit(20).collect())

    def run_new():
        und, bc = _und(spark)
        return (triangle_corner_counts(und, broadcast_closure=bc)
                .orderBy(F.col("n_triangles").desc(), "node").limit(20).collect())

    r_old, r_new = run_old(), run_new()  # warm + correctness
    assert [tuple(r) for r in r_old] == [tuple(r) for r in r_new], "MISMATCH"
    print("# results identical", file=sys.stderr)

    best = {"old": 1e9, "new": 1e9}
    samples = {"old": [], "new": []}
    for i in range(rounds):
        for name, fn in (("old", run_old), ("new", run_new)):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            samples[name].append(round(dt, 3))
            best[name] = min(best[name], dt)
        print(f"# round {i+1}: old {samples['old'][-1]}s new {samples['new'][-1]}s",
              file=sys.stderr)
    print({"best_old": round(best["old"], 3), "best_new": round(best["new"], 3),
           "samples": samples})
    return 0


if __name__ == "__main__":
    sys.exit(main())

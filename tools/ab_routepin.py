"""Interleaved A/B for round 14 (VERDICT r13 item 6, q157
decomposition follow-up): pin the ANN serve's probe-routing result.

The q157 serve plan carries FOUR scans of the index's centroids table
(plus four replays of the crossJoin+row_number routing subtree): two
"real" references (the int8 candidate join and its window lineage)
and one copy inside EACH vectors scan's dynamic-partition-pruning
subquery. probe_cells is probe-batch-bounded (|queries| x n_probe
rows of (q_vec, cell)) — the classic small multi-referenced proxy the
round-13 pins targeted (guide §7.2 / §8).

Variant B pins route_probes_to_cells' result with an eager
localCheckpoint inside ann_index_topk. GATE CHECK built in: the
q150/q157 plan gates require `dynamicpruningexpression(cell` on the
vectors scans and zero corpus reads — both asserted here per variant
before any timing, so a pin that erases the gated pruning evidence is
rejected on the spot (the round-13 q151 lesson).

Usage: python tools/ab_routepin.py [rounds]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import morphl_community_edition_spark.operators.ann_index as ai  # noqa: E402
from morphl_community_edition_spark.queries import QUERIES  # noqa: E402
from morphl_community_edition_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ROUTE_A = ai.route_probes_to_cells


def route_pinned(centroid_df, queries, n_probe, id_col="vec_id", vec_col="embedding"):
    return ROUTE_A(centroid_df, queries, n_probe, id_col, vec_col).localCheckpoint(
        eager=True
    )


def run(spark, qname: str, variant: str):
    ai.route_probes_to_cells = route_pinned if variant == "B" else ROUTE_A
    try:
        return QUERIES[qname](spark, SF_DIR).collect()
    finally:
        ai.route_probes_to_cells = ROUTE_A


def gate(spark, qname: str, variant: str) -> None:
    ai.route_probes_to_cells = route_pinned if variant == "B" else ROUTE_A
    try:
        df = QUERIES[qname](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        ai.route_probes_to_cells = ROUTE_A
    assert "dynamicpruningexpression(cell" in plan, (
        f"{qname}/{variant}: cell DPP gone — pin rejected"
    )
    n_cent = plan.count("morphl_ann_index/centroids") or plan.count("/centroids")
    print(f"# {qname}/{variant}: DPP ok, centroids scans in plan: {n_cent}",
          file=sys.stderr, flush=True)


def sha(rows) -> str:
    return hashlib.sha256(repr(sorted(tuple(r) for r in rows)).encode()).hexdigest()[:16]


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="morphl-ab-routepin")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")

    qnames = ("q157_persisted_hybrid_serve", "q150_persisted_ann_serve")
    for qname in qnames:
        ref = None
        for v in ("A", "B"):
            s = sha(run(spark, qname, v))
            print(f"# {qname}/{v}: result sha {s}", file=sys.stderr, flush=True)
            if ref is None:
                ref = s
            else:
                assert s == ref, f"{qname}/{v} result differs!"
        for v in ("A", "B"):
            gate(spark, qname, v)

    best: dict[str, float] = {}
    for r in range(rounds):
        for qname in qnames:
            tag = qname.split("_")[0]
            order = ("A", "B") if r % 2 == 0 else ("B", "A")
            for v in order:
                key = f"{tag}:{v}"
                spark.sparkContext.setJobDescription(f"ab-routepin:{key}:{r}")
                t0 = time.perf_counter()
                run(spark, qname, v)
                dt = time.perf_counter() - t0
                best[key] = min(best.get(key, 1e9), dt)
                print(f"# round {r} {key}: {dt:.3f}s", file=sys.stderr, flush=True)
    print({k: round(v, 4) for k, v in best.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())

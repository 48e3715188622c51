"""Interleaved A/B for round 14: pinned_order on unbounded serve
tails.

The round-13 q150 decomposition showed a bare ``orderBy`` tail plans
Sort + RangeExchange whose boundary sampling RE-EXECUTES the child
subtree; ``capped_order`` fixed the row-BOUNDED serves. This round
extends the device to the group-bounded (uncappable) rollup/serve
tails via ``plans/hints.pinned_order`` (lazy localCheckpoint before
the sort). This tool measures each candidate REGISTERED query with
the pin on (B, the shipped code) vs off (A, the exact pre-round-14
plain-orderBy plan via hints.PIN_UNBOUNDED_SORT — variants toggle the
one branch inside the landed helper, so the comparison is
landing-order-proof and replication-drift-proof). Order alternates
per round; result sets are asserted identical in-run.

Usage: python tools/ab_pinsort.py [rounds] [targets...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import morphl_community_edition_spark.plans.hints as hints  # noqa: E402
from morphl_community_edition_spark.queries import QUERIES  # noqa: E402
from morphl_community_edition_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_TARGETS = (
    "q159_incremental_rollup",
    "q162_psi_drift",
    "q164_zorder_histogram",
    "q165_compacted_rollup",
    "q168_quantile_rollup",
    "q169_hist_topk_serve",
    "q170_rollup_view_match",
    "q175_hist_retraction",
    "q178_sample_quantile_rollup",
)


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    targets = tuple(sys.argv[2:]) or DEFAULT_TARGETS

    spark = get_spark(app_name="morphl-ab-pinsort")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")

    def run(name: str, pin: bool) -> tuple[float, list]:
        hints.PIN_UNBOUNDED_SORT = pin
        try:
            t0 = time.perf_counter()
            rows = QUERIES[name](spark, SF_DIR).collect()
            return time.perf_counter() - t0, rows
        finally:
            hints.PIN_UNBOUNDED_SORT = True

    best: dict[str, dict[str, float]] = {t: {"A": 1e9, "B": 1e9} for t in targets}
    for name in targets:
        # pre-warm once: builds any persisted structure so guarded
        # queries serve from committed state in BOTH variants
        spark.sparkContext.setJobDescription(f"ab-pinsort:warm:{name}")
        QUERIES[name](spark, SF_DIR).collect()
        ref_rows = None
        for r in range(rounds):
            order = ("A", "B") if r % 2 == 0 else ("B", "A")
            for v in order:
                spark.sparkContext.setJobDescription(f"ab-pinsort:{name}:{v}:r{r}")
                sec, rows = run(name, pin=(v == "B"))
                best[name][v] = min(best[name][v], sec)
                if ref_rows is None:
                    ref_rows = rows
                else:
                    assert rows == ref_rows, f"{name}: variant {v} rows differ"
        a, b = best[name]["A"], best[name]["B"]
        verdict = "B wins" if b < a * 0.97 else ("A wins" if a < b * 0.97 else "wash")
        print(
            f"{name}: A(plain)={a:.3f}s B(pinned)={b:.3f}s "
            f"({(b / a - 1) * 100:+.1f}%) -> {verdict}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

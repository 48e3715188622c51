"""Decade-validation of the re-staged jaccard auto dispatch (round
13, verdict r12 #4): run the two auto-dispatched pipeline queries —
q147_quality_keeper_dedup and q158_leakage_safe_split — at the sf0.1
base and both adversarial decade variants (grown 10x, dup90), and
record WHICH machinery the dispatcher chose (collapse fired? postings
or prefix?) next to the timing, via dedup.LAST_AUTO_DISPATCH. The
sampled-sum-of-df^2 profile and the dup-mass collapse gate each had
exactly one decade reading before this tool existed; this makes the
decision itself part of the committed evidence instead of something
inferred from timings.

Requires the variant tables already staged by tools/scale_sweep.py
(default workdir /tmp/scale-sweep). Prints one JSON line.

Usage: python tools/check_dispatch.py [workdir=/tmp/scale-sweep]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
QUERY_NAMES = ("q147_quality_keeper_dedup", "q158_leakage_safe_split")
RUNS = 3


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale-sweep"
    variants = {
        "sf0.1": SF01,
        "grown": os.path.join(workdir, "docs", "grown"),
        "dup90": os.path.join(workdir, "docs", "dup90"),
    }
    for tag, d in variants.items():
        if not os.path.isdir(d):
            print(
                f"missing variant dir {d} — run tools/scale_sweep.py first",
                file=sys.stderr,
            )
            sys.exit(2)

    from morphl_community_edition_spark.engine import get_spark
    from morphl_community_edition_spark.operators import dedup
    from morphl_community_edition_spark.queries import QUERIES

    spark = get_spark(app_name="check-dispatch-r13")
    out: dict = {"runs": RUNS}
    for tag, sf_dir in variants.items():
        out[tag] = {}
        for qname in QUERY_NAMES:
            best = float("inf")
            decision = None
            for _ in range(RUNS):
                t0 = time.perf_counter()
                QUERIES[qname](spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
                decision = dict(dedup.LAST_AUTO_DISPATCH)
            out[tag][qname] = {"best_sec": round(best, 3), "dispatch": decision}
            print(f"{tag} {qname}: {best:.2f}s {decision}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

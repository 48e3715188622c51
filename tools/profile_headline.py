"""Headline-query cost decomposition — evidence for SCALE.md's
"headline floor" section, reproducible with one command.

For each headline query, splits an honest-warm rebuild into:
- build: Python-side DataFrame/SQL construction (Py4J round trips)
- plan:  Catalyst analyze + optimize + physical planning
         (queryExecution().executedPlan(), before any job)
- exec:  collect() — scan, shuffles, aggregation, result transfer

plus the empty-job floor (spark.range(1).collect()) as the job-
scheduling baseline. Run under the same profile bench.py times
(AQE off, 2 shuffle partitions, 2m splits).

Usage: python tools/profile_headline.py [sf_dir] [samples]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEADLINE = {
    "q1": "q01_pricing_summary",
    "q3": "q03_star_topk",
    "q5": "q05_six_table_join",
    "window": "q15_rank_running_sum",
    "json_agg": "q17_json_agg",
    "sessionize": "q16_sessionize",
    "cosine": "q12_cosine_topk",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from morphl_community_edition_spark.queries import QUERIES
    from morphl_community_edition_spark.session import get_spark

    spark = get_spark(app_name="profile")
    QUERIES["q24_exact_dedup"](spark, sf_dir).collect()  # JVM warm-up
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")

    for key in HEADLINE.values():
        QUERIES[key](spark, sf_dir).collect()  # per-query codegen warm-up

    spark.range(1).collect()
    t0 = time.perf_counter()
    spark.range(1).collect()
    print(f"empty-job floor: {(time.perf_counter() - t0) * 1000:.0f} ms")

    for tag, key in HEADLINE.items():
        rows = []
        for _ in range(samples):
            t0 = time.perf_counter()
            df = QUERIES[key](spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.collect()
            t3 = time.perf_counter()
            rows.append((t1 - t0, t2 - t1, t3 - t2, t3 - t0))
        b, p, e, tot = (min(r[i] for r in rows) for i in range(4))
        print(
            f"{tag}: build {b * 1000:.0f} ms  plan {p * 1000:.0f} ms  "
            f"exec {e * 1000:.0f} ms  total(min) {tot * 1000:.0f} ms"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

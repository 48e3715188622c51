"""Round-11 floor attack harness: interleaved A/B of candidate conf
levers on the four >2× headline queries (q1/q3/q5/json_agg) at sf0.1.

Interleaved design (drift-immune, the round-5 negative-result
protocol): for each lever, alternate A/B/A/B... per query with
best-of-3 blocks inside each arm, N rounds; report per-arm minima.
A lever only graduates into bench.py's profile if the interleaved
delta exceeds the arm spread.

Usage: python tools/profile_weak4.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WEAK = {
    "q1": "q01_pricing_summary",
    "q3": "q03_star_topk",
    "q5": "q05_six_table_join",
    "json_agg": "q17_json_agg",
}

# lever -> (conf key, A value = current bench profile, B value)
LEVERS = [
    ("splits_32m", "spark.sql.files.maxPartitionBytes", "2m", "32m"),
    ("sp1", "spark.sql.shuffle.partitions", "2", "1"),
    (
        "constraints_off",
        "spark.sql.constraintPropagation.enabled",
        "true",
        "false",
    ),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from morphl_community_edition_spark.queries import QUERIES
    from morphl_community_edition_spark.session import get_spark

    spark = get_spark(app_name="weak4")
    QUERIES["q24_exact_dedup"](spark, sf_dir).collect()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")
    for key in WEAK.values():
        QUERIES[key](spark, sf_dir).collect()

    def block(key: str) -> float:
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[key](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    for tag, conf, a_val, b_val in LEVERS:
        res: dict[str, dict[str, list[float]]] = {
            q: {"A": [], "B": []} for q in WEAK
        }
        for _ in range(rounds):
            for arm, val in (("A", a_val), ("B", b_val)):
                spark.conf.set(conf, val)
                for q, key in WEAK.items():
                    res[q][arm].append(block(key))
        spark.conf.set(conf, a_val)
        for q in WEAK:
            a, b = min(res[q]["A"]), min(res[q]["B"])
            print(
                f"{tag} {q}: A(min)={a * 1000:.0f}ms B(min)={b * 1000:.0f}ms "
                f"delta={(b - a) * 1000:+.0f}ms "
                f"(A spread {max(res[q]['A']) - a:.3f}, B spread {max(res[q]['B']) - b:.3f})"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())

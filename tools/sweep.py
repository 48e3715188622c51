"""Registry-wide warm-time sweep — the SCALE.md measurement harness.

Times every registered query at one scale factor on the engine
session: one untimed warm-up run, then best-of-N full rebuilds
(re-plan + re-execution, same semantics as bench.py's warm tier).
Emits one JSON object {query: seconds} and prints the slowest tail,
so SCALE.md's per-operator numbers are reproducible with one command.

Usage:
    python tools/sweep.py [sf_dir] [out_path] [runs]
    python tools/sweep.py /root/testdata/sf0.1 /tmp/sweep.json 3
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep.json"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from morphl_community_edition_spark.queries import QUERIES
    from morphl_community_edition_spark.session import get_spark

    spark = get_spark(app_name="sweep")
    times: dict[str, float | str] = {}
    for name, fn in QUERIES.items():
        try:
            fn(spark, sf_dir).collect()  # warm-up (also the cold plan)
            best = min(
                (lambda t0: (fn(spark, sf_dir).collect(), time.time() - t0)[1])(
                    time.time()
                )
                for _ in range(runs)
            )
            times[name] = round(best, 3)
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            times[name] = f"ERR {type(e).__name__}"
    with open(out_path, "w") as f:
        json.dump(times, f, indent=2, sort_keys=True)
    numeric = {k: v for k, v in times.items() if isinstance(v, float)}
    for k in sorted(numeric, key=numeric.get, reverse=True)[:12]:  # type: ignore[arg-type]
        print(f"{k}: {numeric[k]:.2f}s")
    errs = {k: v for k, v in times.items() if not isinstance(v, float)}
    print(f"{len(numeric)} timed, {len(errs)} errors -> {out_path}")
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())

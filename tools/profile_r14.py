"""Round-14 optimization-round measurement harness (guide §1).

For every bench-visible query (headline + extra tiers), under the
exact bench profile (AQE off, 2 shuffle partitions, 2m splits, warm
session), this captures:

- best-of-N honest-warm time (rebuild + re-plan + full re-execution,
  collect(), the bench's own action) — the "before/after" number;
- ``.explain("formatted")`` written to plans/r14/<bench_name>_<tag>.txt
  so plan-shape claims (Exchange count, join strategy, PushedFilters)
  are checkable without running Spark.

Usage: python tools/profile_r14.py <tag> [only_names...]
  tag: suffix for the plan files, e.g. "before" / "after"
  only_names: optional subset of bench names to measure

Writes one JSON line {name: best_sec} to stdout; progress to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import EXTRA, HEADLINE  # noqa: E402
from morphl_community_edition_spark.queries import QUERIES  # noqa: E402
from morphl_community_edition_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("PROFILE_RUNS", "3"))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    names = {**HEADLINE, **EXTRA}
    if only:
        names = {k: v for k, v in names.items() if k in only or v in only}

    plans_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name="morphl-profile-r14")
    # the exact bench profile (bench.py timed section)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")

    out: dict[str, float] = {}
    for name, key in names.items():
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # warm: first run builds any persisted structure / primes cache
        QUERIES[key](spark, SF_DIR).collect()
        best = 1e9
        for _ in range(RUNS):
            t0 = time.perf_counter()
            QUERIES[key](spark, SF_DIR).collect()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
        # plan capture AFTER warm runs: persisted-index queries serve
        # from the built structure, which is the steady-state plan
        df = QUERIES[key](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # a pinned_order tail hides the serve subtree behind the
        # checkpoint scan; append the pre-pin child so the dump still
        # carries the scan-level evidence (round 14)
        child = getattr(df, "_morphl_pre_pin", None)
        if child is not None:
            plan += (
                "\n\n-- pre-pin child (the serve subtree the pin "
                "executes once) --\n\n"
            )
            plan += child._sc._jvm.PythonSQLUtils.explainString(
                child._jdf.queryExecution(), "formatted"
            )
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"# {name}: {out[name]:.3f}s", file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Round-14: decompose q168 quantile_rollup — the most expensive
maintenance-family bench query (driver r13: 2.64 s) — so the residual
cost after the round-13 serve work (merged WindowExec, multi-path
state read, overlapped folds) has a name.

Stages timed (best-of-N each, bench profile, warm session; every run
folds into a FRESH rollup path so build/fold numbers are honest, not
replay-skipped):

  build   — lineitem hex1<'e' pass (14/16 of the fact): scan + md5
            split + hist_states agg + parquet write + manifest commit
  folds   — the two 1/16 delta folds, overlapped via
            fold_concurrently (the shipped shape)
  serve   — quantiles_from_hist over the committed slices (merge +
            cumulative window + rank extraction) + orderBy + collect
  full    — the registered q168 (collect), for the sum check

Usage: python tools/profile_q168.py [runs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from morphl_community_edition_spark.catalog import load_table  # noqa: E402
from morphl_community_edition_spark.queries import QUERIES  # noqa: E402
from morphl_community_edition_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_Q168_PCTS = {"p50": (1, 2), "p90": (9, 10), "p99": (99, 100)}
_Q168_SCALE = -2


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="morphl-profile-q168")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")

    from morphl_community_edition_spark.operators.incremental_agg import (
        HistSpec,
        append_hist_rollup,
        build_hist_rollup,
        fold_concurrently,
        quantiles_from_hist,
    )

    # warm-up: prime the scan cache / JIT the codegen paths once
    QUERIES["q168_quantile_rollup"](spark, SF_DIR).collect()

    li = load_table(spark, SF_DIR, "lineitem")
    hex1 = F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 1)
    spec = HistSpec(keys=("l_suppkey",), value="l_extendedprice", scale=_Q168_SCALE)

    best = {"build": 1e9, "folds": 1e9, "serve": 1e9, "full": 1e9}
    scratch_root = f"/tmp/profile_q168_{uuid.uuid4().hex[:8]}"
    try:
        for _ in range(runs):
            path = os.path.join(scratch_root, uuid.uuid4().hex[:8])

            spark.sparkContext.setJobDescription("q168-decomp:build")
            t0 = time.perf_counter()
            build_hist_rollup(li.filter(hex1 < "e"), spec, path)
            best["build"] = min(best["build"], time.perf_counter() - t0)

            spark.sparkContext.setJobDescription("q168-decomp:folds")
            t0 = time.perf_counter()
            fold_concurrently(
                lambda: append_hist_rollup(li.filter(hex1 == "e"), path, sid="batch-e"),
                lambda: append_hist_rollup(li.filter(hex1 == "f"), path, sid="batch-f"),
            )
            best["folds"] = min(best["folds"], time.perf_counter() - t0)

            spark.sparkContext.setJobDescription("q168-decomp:serve")
            t0 = time.perf_counter()
            quantiles_from_hist(spark, path, _Q168_PCTS).orderBy("l_suppkey").collect()
            best["serve"] = min(best["serve"], time.perf_counter() - t0)

            spark.sparkContext.setJobDescription("q168-decomp:full")
            t0 = time.perf_counter()
            QUERIES["q168_quantile_rollup"](spark, SF_DIR).collect()
            best["full"] = min(best["full"], time.perf_counter() - t0)
    finally:
        shutil.rmtree(scratch_root, ignore_errors=True)

    out = {k: round(v, 4) for k, v in best.items()}
    for name, sec in out.items():
        print(f"# {name}: {sec:.3f}s", file=sys.stderr, flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

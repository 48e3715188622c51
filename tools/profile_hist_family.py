"""Decade profile for the histogram-rollup family (round 13).

The family's scale claims are structural: fold cost ~ |delta|, serve
cost ~ |grid x groups| (INDEPENDENT of fact size), state rows bounded
by the quantization grid. This harness measures all three at sf0.1
and at a 10x-grown lineitem (10 copies, l_orderkey offset so rows
stay distinct; same 100-supplier key space and price distribution, so
the grid x groups bound is unchanged -- exactly the regime where the
claims are falsifiable: a serve that secretly scales with the fact
would read 10x, a state that grows with rows would 10x).

Usage: python tools/profile_hist_family.py [workdir=/tmp/hist-profile]
Prints one JSON line; results recorded in SCALE.md round-13 addendum.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
COPIES = 10


def best_of(n, fn):
    out = []
    for _ in range(n):
        t0 = time.time()
        fn()
        out.append(time.time() - t0)
    return round(min(out), 3)


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hist-profile"
    os.makedirs(workdir, exist_ok=True)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from morphl_community_edition_spark.catalog import load_table
    from morphl_community_edition_spark.operators.incremental_agg import (
        HistSpec,
        build_hist_rollup,
        quantiles_from_hist,
        read_hist,
        retract_hist_rollup,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    grown_dir = os.path.join(workdir, "grown")
    if not os.path.isdir(os.path.join(grown_dir, "lineitem.parquet")):
        os.makedirs(grown_dir, exist_ok=True)
        li = load_table(spark, SF01, "lineitem")
        parts = [
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000))
            for i in range(COPIES)
        ]
        g = parts[0]
        for p in parts[1:]:
            g = g.unionByName(p)
        g.write.mode("overwrite").parquet(os.path.join(grown_dir, "lineitem.parquet"))

    spec = HistSpec(keys=("l_suppkey",), value="l_extendedprice", scale=-2)
    pcts = {"p50": (1, 2), "p90": (9, 10), "p99": (99, 100)}
    out = {}
    for label, sf_dir in (("sf0.1", SF01), ("grown", grown_dir)):
        li = load_table(spark, sf_dir, "lineitem")
        hex2 = F.substring(F.md5(F.col("l_orderkey").cast("string")), 2, 1)
        path = os.path.join(workdir, f"hist_{label}")
        shutil.rmtree(path, ignore_errors=True)
        n_rows = li.count()
        t_build = best_of(1, lambda: build_hist_rollup(li, spec, path))
        t_retract = best_of(
            1,
            lambda: retract_hist_rollup(
                li.filter(hex2 == "0"), path, sid="corr-0"
            ),
        )
        t_serve = best_of(3, lambda: quantiles_from_hist(spark, path, pcts).collect())
        state_rows = read_hist(spark, path).count()
        out[label] = {
            "fact_rows": n_rows,
            "state_rows": state_rows,
            "build_fold_sec": t_build,
            "retract_fold_sec": t_retract,
            "serve_best3_sec": t_serve,
        }
    for k in ("build_fold_sec", "retract_fold_sec", "serve_best3_sec", "state_rows"):
        out[f"decade_ratio_{k}"] = round(out["grown"][k] / max(out["sf0.1"][k], 1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

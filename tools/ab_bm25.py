"""Interleaved A/B for round 13: pin bm25_topk_inline's dl/tfq
subtrees (referenced twice each → 4-5 corpus scan subtrees in the
plan) via eager localCheckpoint, vs the current form.

Methodology: single warm session under the bench profile, variants
interleaved A,B,A,B,... best-of per variant (the repo's round-5
drift-immune device), result equality asserted in the same run.

Usage: python tools/ab_bm25.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from morphl_community_edition_spark.catalog import load_table  # noqa: E402
from morphl_community_edition_spark.operators.text_index import (  # noqa: E402
    _bm25_score,
)
from morphl_community_edition_spark.queries.llm import (  # noqa: E402
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    fan_out_narrow_scan,
)
from morphl_community_edition_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def variant_a(spark):
    """Current bm25_topk_inline, verbatim."""
    docs = fan_out_narrow_scan(load_table(spark, SF_DIR, "documents"))
    ws = F.split(F.col("text"), " ")
    dl = docs.select("doc_id", F.size(ws).cast("bigint").alias("dl"))
    st = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sumdl"),
    )
    tfq = (
        docs.select("doc_id", F.explode(ws).alias("term"))
        .filter(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    return _bm25_score(tfq, dl, st, k=20, k1=BM25_K1, b=BM25_B)


def variant_b(spark):
    """dl and tfq pinned eagerly: each corpus-scan subtree computed
    once; st/join/dfr/co all read the pins."""
    docs = fan_out_narrow_scan(load_table(spark, SF_DIR, "documents"))
    ws = F.split(F.col("text"), " ")
    dl = docs.select("doc_id", F.size(ws).cast("bigint").alias("dl")).localCheckpoint()
    st = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sumdl"),
    )
    tfq = (
        docs.select("doc_id", F.explode(ws).alias("term"))
        .filter(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .localCheckpoint()
    )
    return _bm25_score(tfq, dl, st, k=20, k1=BM25_K1, b=BM25_B)


def variant_c(spark):
    """Only tfq pinned (dl's two references may already share the
    exchange; tfq's groupBy sits behind an explode)."""
    docs = fan_out_narrow_scan(load_table(spark, SF_DIR, "documents"))
    ws = F.split(F.col("text"), " ")
    dl = docs.select("doc_id", F.size(ws).cast("bigint").alias("dl"))
    st = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sumdl"),
    )
    tfq = (
        docs.select("doc_id", F.explode(ws).alias("term"))
        .filter(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .localCheckpoint()
    )
    return _bm25_score(tfq, dl, st, k=20, k1=BM25_K1, b=BM25_B)


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="morphl-ab-bm25")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")

    variants = {"A_current": variant_a, "B_pin_dl_tfq": variant_b, "C_pin_tfq": variant_c}
    # warm + equality
    ref = None
    for name, fn in variants.items():
        rows = [tuple(r) for r in fn(spark).collect()]
        if ref is None:
            ref = rows
        else:
            assert rows == ref, f"{name} result differs!"
        print(f"# {name}: equality ok ({len(rows)} rows)", file=sys.stderr)

    best = {k: 1e9 for k in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"ab-bm25:{name}:{r}")
            t0 = time.perf_counter()
            fn(spark).collect()
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"# round {r} {name}: {dt:.3f}s", file=sys.stderr)
    print({k: round(v, 4) for k, v in best.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())

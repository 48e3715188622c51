"""Interleaved A/B for round 13: pin the PERSISTED serve path's tfq
(the bucket-pruned postings scan) before _bm25_score, which references
it twice (df derivation + contribution join) — 2 pruned scans → 1
materialized |hits|-sized frame. The pruned scan is already small, so
this may be a wash; measured rather than assumed (the q114 lesson).

Usage: python tools/ab_bm25_serve.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from morphl_community_edition_spark.operators import manifest  # noqa: E402
from morphl_community_edition_spark.operators.text_index import (  # noqa: E402
    _bm25_score,
    _bucket_py,
    build_text_index,
)
from morphl_community_edition_spark.catalog import load_table  # noqa: E402
from morphl_community_edition_spark.queries.llm import (  # noqa: E402
    BM25_B,
    BM25_K1,
    BM25_TERMS,
)
from morphl_community_edition_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _serve(spark, path, pin: bool):
    manifest.require_commit(path, "BM25 text index")
    meta = spark.read.parquet(os.path.join(path, "meta")).collect()[0]
    n_docs, sumdl, n_buckets = meta["n_docs"], meta["sumdl"], meta["n_buckets"]
    buckets = sorted({_bucket_py(t, n_buckets) for t in BM25_TERMS})
    tfq = (
        spark.read.parquet(os.path.join(path, "postings"))
        .filter(F.col("term_bucket").isin(buckets) & F.col("term").isin(*BM25_TERMS))
        .select("doc_id", "term", "tf")
    )
    if pin:
        tfq = tfq.localCheckpoint()
    dl = spark.read.parquet(os.path.join(path, "doc_stats"))
    st = spark.createDataFrame([(int(n_docs), int(sumdl))], "n_docs long, sumdl long")
    return _bm25_score(tfq, dl, st, k=20, k1=BM25_K1, b=BM25_B)


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="morphl-ab-bm25-serve")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")

    path = "/tmp/ab_bm25_serve_index"
    if not os.path.isdir(path):
        build_text_index(load_table(spark, SF_DIR, "documents"), path)

    variants = {"A_current": lambda s: _serve(s, path, False),
                "B_pin_tfq": lambda s: _serve(s, path, True)}
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
            spark.sparkContext.setJobDescription(f"ab-bm25-serve:{name}:{r}")
            t0 = time.perf_counter()
            fn(spark).collect()
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"# round {r} {name}: {dt:.3f}s", file=sys.stderr)
    print({k: round(v, 4) for k, v in best.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Per-batch cost of the PERSISTED-index incremental dedup (q134)
vs the re-shingle-everything direct form (q114) — the measurement
that closes the round-7 q114 decomposition: the index amortizes the
corpus shingle explode (the named irreducible term) across batches.

Usage: python tools/measure_indexed.py [sf_dir] [runs]
Prints one JSON line: index build time (the once-per-corpus cost),
best-of-N per-batch classify time with the index, and q114's direct
per-batch time for the same split.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from morphl_community_edition_spark.catalog import load_table
    from morphl_community_edition_spark.operators.incremental_index import (
        build_dedup_index,
        incremental_dedup_with_index,
    )
    from morphl_community_edition_spark.queries import QUERIES
    from morphl_community_edition_spark.session import get_spark

    spark = get_spark(app_name="measure-indexed")
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    existing = docs.filter(F.col("source") != "src1").select("doc_id", "text")
    batch = docs.filter(F.col("source") == "src1").select("doc_id", "text")

    workdir = tempfile.mkdtemp(prefix="dedup-index-")
    try:
        t0 = time.perf_counter()
        build_dedup_index(existing, workdir)
        build_s = round(time.perf_counter() - t0, 3)

        # warm
        incremental_dedup_with_index(spark, workdir, batch, n_docs=n_docs).collect()
        indexed = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            incremental_dedup_with_index(spark, workdir, batch, n_docs=n_docs).collect()
            indexed = min(indexed, time.perf_counter() - t0)

        QUERIES["q114_incremental_dedup"](spark, sf_dir).collect()
        direct = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            QUERIES["q114_incremental_dedup"](spark, sf_dir).collect()
            direct = min(direct, time.perf_counter() - t0)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "index_build_s": build_s,
                "per_batch_indexed_s": round(indexed, 3),
                "per_batch_direct_q114_s": round(direct, 3),
                "speedup": round(direct / indexed, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

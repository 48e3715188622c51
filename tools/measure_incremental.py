"""Fixed-batch 10× measurement for the incremental dedup op
(verdict r5 #1: the honest scale protocol for an INCREMENTAL operator
holds the batch constant while the corpus grows — q114's registered
form grows the batch 10× alongside the corpus, conflating the two).

Classifies a FIXED-cardinality new batch (the ``batch_n``
lowest-doc_id 'src1' docs; remaining src1 docs count as existing
corpus) against each scale factor's corpus and reports best-of-N warm
rebuild seconds per sf_dir.

Usage: python tools/measure_incremental.py [batch_n] [runs] [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    batch_n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dirs = sys.argv[3:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]

    from pyspark.sql import functions as F

    from morphl_community_edition_spark.catalog import load_table
    from morphl_community_edition_spark.queries.pipeline_ops import (
        incremental_dedup_frame,
    )
    from morphl_community_edition_spark.session import get_spark

    spark = get_spark(app_name="measure-incremental")
    out: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        docs = load_table(spark, sf_dir, "documents")
        cutoff = (
            docs.filter(F.col("source") == "src1")
            .select("doc_id")
            .orderBy("doc_id")
            .limit(batch_n)
            .agg(F.max("doc_id"))
            .collect()[0][0]
        )
        is_new = (F.col("source") == "src1") & (F.col("doc_id") <= cutoff)
        n_docs = docs.count()

        def build():
            return incremental_dedup_frame(docs, is_new, n_docs=n_docs)

        build().collect()  # warm-up
        best = 1e9
        for _ in range(runs):
            t0 = time.perf_counter()
            rows = build().collect()
            best = min(best, time.perf_counter() - t0)
        out[sf_dir] = {
            "batch_n": batch_n,
            "corpus_docs": n_docs,
            "classified_rows": len(rows),
            "best_s": round(best, 3),
        }
        print(f"# {sf_dir}: {out[sf_dir]}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

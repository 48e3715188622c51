"""q114 incremental-dedup cost decomposition (round-7 verdict #4):
the valve fired in round 6 and the fixed-batch protocol still read
2.36× for a 10× corpus — name what remains.

Splits one honest-warm q114 run into its physical stages by
collecting each intermediate frame separately (same device as
tools/profile_headline.py's build/plan/exec split, applied inside
the query):

- shingle_explode: the corpus-wide 3-gram explode + distinct
  (`sh` — the frame every later stage re-derives, since nothing is
  cached: Spark re-plans it per reference);
- batch_shingles: new-batch shingle set (filter + distinct);
- stop_set: batch-probed document-frequency valve aggregation;
- valved_sizes: per-doc shingle counts over the valved space (`sz`,
  corpus-wide partial agg);
- intersection: the batch×corpus postings join + pair agg (`inter`);
- near_verify: Jaccard assembly + threshold (`near`);
- exact_probe: md5 hash anti/left probe;
- full_query: the registered q114 end to end.

The sum over stages exceeds full_query: stages share the shingle
explode, which the full plan recomputes per branch — counting it per
stage makes that re-derivation visible (scan_multiplicity below
counts how many FileScans of documents.parquet the executed plan
actually carries).

Usage: python tools/profile_q114.py [sf_dir] [runs]
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
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from morphl_community_edition_spark.catalog import load_table
    from morphl_community_edition_spark.queries import QUERIES
    from morphl_community_edition_spark.queries.pipeline_ops import (
        incremental_dedup_stages,
    )
    from morphl_community_edition_spark.session import get_spark

    spark = get_spark(app_name="profile-q114")
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    is_new = F.col("source") == "src1"

    def stages():
        # the REGISTERED pipeline's own stage builder (shared with
        # incremental_dedup_frame) — the decomposition can never
        # measure a pipeline q114 no longer runs (round-7 review)
        st = incremental_dedup_stages(docs, is_new, n_docs)
        st["exact_probe"] = st.pop("new_docs").join(
            st.pop("exact_hashes"), "h", "left"
        )
        st.pop("valved_shingles")  # interior frame; sz/inter cover it
        return st

    # warm everything once
    QUERIES["q114_incremental_dedup"](spark, sf_dir).collect()

    out: dict[str, float] = {}
    for name in list(stages()):
        best = float("inf")
        for _ in range(runs):
            frames = stages()  # rebuild per run: honest re-plan
            # force full computation WITHOUT driver transfer (collecting
            # a corpus-sized intermediate would measure Py4J row
            # shipping, not the stage): hash-of-everything aggregate
            # defeats column pruning, one row comes back
            f = frames[name]
            probe = f.agg(
                F.count(F.lit(1)).alias("c"),
                F.max(F.xxhash64(*f.columns)).alias("h"),
            )
            t0 = time.perf_counter()
            probe.collect()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"{name}: {best:.2f}s", file=sys.stderr)
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        QUERIES["q114_incremental_dedup"](spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
    out["full_query"] = round(best, 3)

    plan = (
        QUERIES["q114_incremental_dedup"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    out["scan_multiplicity"] = plan.count("FileScan parquet")
    print(json.dumps({"sf_dir": sf_dir, "stages": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Interleaved A/B for round 13: pin the SimHash signature frame
before simhash_hamming_pairs' band self-join. The self-join references
``bands`` (and therefore the whole signature aggregation — word
explode × 60 bit-votes × two aggs) on BOTH sides: the q121 before-plan
carries 4 scans of documents.parquet, i.e. the signature subtree is
computed twice. Pinning sig (|docs| rows × 2 longs — the §8
lightweight proxy, never the text) should halve the heavy part.

Methodology: single warm session under the bench profile, variants
interleaved A,B,A,B,... best-of per variant (the repo's round-5
drift-immune device), result equality asserted in the same run.

Usage: python tools/ab_simhash.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from morphl_community_edition_spark.catalog import load_table  # noqa: E402
from morphl_community_edition_spark.operators.dedup import (  # noqa: E402
    simhash_hamming_pairs,
    simhash_signatures,
)
from morphl_community_edition_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def variant_a(spark):
    """Current q121, verbatim."""
    docs = load_table(spark, SF_DIR, "documents")
    return simhash_hamming_pairs(simhash_signatures(docs)).orderBy("a_doc", "b_doc")


def variant_b(spark):
    """Signature frame pinned eagerly before the band self-join."""
    docs = load_table(spark, SF_DIR, "documents")
    sig = simhash_signatures(docs).localCheckpoint()
    return simhash_hamming_pairs(sig).orderBy("a_doc", "b_doc")


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="morphl-ab-simhash")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")

    variants = {"A_current": variant_a, "B_pin_sig": variant_b}
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
            spark.sparkContext.setJobDescription(f"ab-simhash:{name}:{r}")
            t0 = time.perf_counter()
            fn(spark).collect()
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"# round {r} {name}: {dt:.3f}s", file=sys.stderr)
    print({k: round(v, 4) for k, v in best.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())

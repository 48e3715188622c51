"""Interleaved A/B for round 14 (VERDICT r13 items 4+5): narrow the
shingle join keys from ~20-byte STRING 3-grams to 8-byte BIGINT
xxhash64 codes (guide §2.3 — narrower shuffle types), and try the
§3.2-style join-input reduction on q147's Σdf² self-join.

Targets and variants:

- q114_incremental_dedup (bench incremental_dedup, 4.18 s driver r13):
    A  — current: every shingle shuffle/agg/join keys on the STRING
    B  — hash at the explode: sh carries xxhash64(s); the df-valve
         agg, the stop anti-join, and the new×existing inverted-index
         join all key on BIGINT. Equality-only usage everywhere, so
         results are identical while xxhash64 is injective on the
         observed shingle set (oracle hash-compare is the end proof).
- q147_quality_keeper_dedup (bench quality_keeper_dedup, 4.95 s):
    A  — current postings self-join on STRING s
    B  — _post_frame hashes s after the explode (checkpoint stores
         8 B keys; both self-join exchanges carry BIGINT)
    C  — B + df>=2 reduction: a count() window over the SAME s
         partitioning drops df==1 shingles (they cannot produce an
         a<b pair) before the self-join build — the §3.2 "reduce the
         big side before the join" device, expressed as a window so
         it shares the join's own exchange instead of adding one.

Methodology (memory: bench-methodology): one warm session, bench
profile, variants interleaved with order alternating per round,
best-of per variant, result equality asserted in the same run.

Usage: python tools/ab_shinglehash.py [rounds]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import morphl_community_edition_spark.operators.dedup as dd  # noqa: E402
import morphl_community_edition_spark.queries.pipeline_ops as po  # noqa: E402
from morphl_community_edition_spark.queries import QUERIES  # noqa: E402
from morphl_community_edition_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

POST_FRAME_A = dd._post_frame
POSTINGS_PAIRS_A = dd._postings_pairs_from_post
STAGES_A = po.incremental_dedup_stages


def _post_frame_hashed(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """_post_frame with the shingle key hashed to BIGINT after the
    explode — the checkpoint and every downstream exchange carry 8 B
    keys instead of the 3-gram strings."""
    from morphl_community_edition_spark.operators.dedup import word_shingles
    from morphl_community_edition_spark.plans.hints import fan_out_narrow_scan

    shingled = word_shingles(
        fan_out_narrow_scan(docs.select(id_col, text_col)), text_col, n
    )
    return (
        shingled.select(
            F.col(id_col).alias("doc"),
            F.size("shingles").alias("n_sh"),
            F.explode("shingles").alias("s"),
        )
        .select("doc", "n_sh", F.xxhash64("s").alias("s"))
        .localCheckpoint(eager=True)
    )


def _postings_pairs_df2(sh: DataFrame, threshold: float) -> DataFrame:
    """_postings_pairs_from_post with the df>=2 input reduction."""
    from morphl_community_edition_spark.functions.rounding import crnd

    w = Window.partitionBy("s")
    shf = (
        sh.withColumn("__df", F.count(F.lit(1)).over(w))
        .filter(F.col("__df") >= 2)
        .drop("__df")
    )
    raw_j = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    inter = (
        shf.select(F.col("doc").alias("a_doc"), F.col("n_sh").alias("na"), "s")
        .join(
            shf.select(F.col("doc").alias("b_doc"), F.col("n_sh").alias("nb"), "s"),
            "s",
        )
        .filter(F.col("a_doc") < F.col("b_doc"))
        .groupBy("a_doc", "b_doc")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.min("na").alias("na"),
            F.min("nb").alias("nb"),
        )
    )
    return inter.filter(raw_j >= threshold).select(
        "a_doc", "b_doc", crnd(raw_j, 6).alias("jaccard")
    )


def stages_hashed(docs, is_new, n_docs, stop_frac=None):
    """incremental_dedup_stages with xxhash64 applied at the shingle
    explode — verbatim otherwise."""
    from morphl_community_edition_spark.operators.dedup import (
        INCR_NEAR_THRESHOLD,
        INCR_VALVE_FRAC,
        INCR_VALVE_MIN_DF,
        resolve_doc_freq_limit,
        word_shingles,
    )
    from morphl_community_edition_spark.plans.hints import fan_out_narrow_scan

    if stop_frac is None:
        stop_frac = INCR_VALVE_FRAC
    stop_df_limit = resolve_doc_freq_limit(stop_frac, n_docs, min_df=INCR_VALVE_MIN_DF)
    sh = (
        word_shingles(
            fan_out_narrow_scan(docs.select("doc_id", "source", "text")), "text", 3
        )
        .select("doc_id", "source", F.explode("shingles").alias("s"))
        .select("doc_id", "source", F.xxhash64("s").alias("s"))
    )
    batch_sh = sh.filter(is_new).select("s").distinct()
    stop = (
        sh.join(F.broadcast(batch_sh), "s")
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > stop_df_limit)
        .select("s")
    )
    shv = sh.join(F.broadcast(stop), "s", "left_anti")
    sz = shv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        shv.filter(is_new)
        .select(F.col("doc_id").alias("new_doc"), "s")
        .join(shv.filter(~is_new).select(F.col("doc_id").alias("ex_doc"), "s"), "s")
        .groupBy("new_doc", "ex_doc")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    raw_j = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    near = (
        inter.join(sz.select(F.col("doc_id").alias("new_doc"), F.col("n_sh").alias("na")), "new_doc")
        .join(sz.select(F.col("doc_id").alias("ex_doc"), F.col("n_sh").alias("nb")), "ex_doc")
        .filter(raw_j >= INCR_NEAR_THRESHOLD)
        .select("new_doc")
        .distinct()
        .withColumn("__near", F.lit(1))
    )
    ex_hashes = (
        docs.filter(~is_new)
        .select(F.md5(F.col("text").cast("binary")).alias("h"))
        .distinct()
        .withColumn("__exact", F.lit(1))
    )
    new_docs = docs.filter(is_new).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("h")
    )
    return {
        "shingle_explode": sh,
        "batch_shingles": batch_sh,
        "stop_set": stop,
        "valved_shingles": shv,
        "valved_sizes": sz,
        "intersection": inter,
        "near_verify": near,
        "exact_hashes": ex_hashes,
        "new_docs": new_docs,
    }


def run_q147(spark, variant: str):
    dd._post_frame = POST_FRAME_A if variant == "A" else _post_frame_hashed
    dd._postings_pairs_from_post = (
        _postings_pairs_df2 if variant == "C" else POSTINGS_PAIRS_A
    )
    try:
        return QUERIES["q147_quality_keeper_dedup"](spark, SF_DIR).collect()
    finally:
        dd._post_frame = POST_FRAME_A
        dd._postings_pairs_from_post = POSTINGS_PAIRS_A


def run_q114(spark, variant: str):
    po.incremental_dedup_stages = STAGES_A if variant == "A" else stages_hashed
    try:
        return QUERIES["q114_incremental_dedup"](spark, SF_DIR).collect()
    finally:
        po.incremental_dedup_stages = STAGES_A


def sha(rows) -> str:
    return hashlib.sha256(repr([tuple(r) for r in rows]).encode()).hexdigest()[:16]


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="morphl-ab-shinglehash")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")

    cases = {
        "q147": (run_q147, ("A", "B", "C")),
        "q114": (run_q114, ("A", "B")),
    }
    for case, (fn, variants) in cases.items():
        ref = None
        for v in variants:
            s = sha(fn(spark, v))
            print(f"# {case}/{v}: result sha {s}", file=sys.stderr, flush=True)
            if ref is None:
                ref = s
            else:
                assert s == ref, f"{case}/{v} result differs!"

    best: dict[str, float] = {}
    for r in range(rounds):
        for case, (fn, variants) in cases.items():
            order = variants if r % 2 == 0 else tuple(reversed(variants))
            for v in order:
                key = f"{case}:{v}"
                spark.sparkContext.setJobDescription(f"ab-shinglehash:{key}:{r}")
                t0 = time.perf_counter()
                fn(spark, v)
                dt = time.perf_counter() - t0
                best[key] = min(best.get(key, 1e9), dt)
                print(f"# round {r} {key}: {dt:.3f}s", file=sys.stderr, flush=True)
    print({k: round(v, 4) for k, v in best.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())

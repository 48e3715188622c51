"""Interleaved A/B for round 14 (VERDICT r13 item 2): resolve the
semantic_dedup question. Round 13 changed assign_cells to cluster on
the raw vectors and quantize once on the transform output (guide
§1.2); the builder's local A/B read ~noise but the driver's bench read
0.77x (2.70 -> 3.52 s). Re-measure r12-vs-r13 assign_cells interleaved
(both orders within each round), result sha asserted in-run; keep or
revert on the number.

Usage: python tools/ab_semdedup.py [rounds]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import morphl_community_edition_spark.operators.semdedup as sd  # noqa: E402
from morphl_community_edition_spark.queries import QUERIES  # noqa: E402
from morphl_community_edition_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ASSIGN_R13 = sd.assign_cells


def assign_cells_r12(
    emb: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Round-12 assign_cells verbatim (2a48bd0): quantization BELOW
    the KMeans fit lineage."""
    base = emb.select(
        F.col(id_col).alias("n_vec"),
        F.col(vec_col).cast("array<double>").alias("n_emb"),
    )
    qz = sd.quantize_embeddings_int8(base, "n_emb", out_q="__q", out_scale="__s")
    coded = qz.select(
        "n_vec",
        "n_emb",
        F.col("__q").cast("array<double>").alias("code"),
    ).withColumn("n2", sd.dot(F.col("code"), F.col("code")))
    if n_cells <= 1:
        return coded.select("n_vec", "code", "n2", F.lit(0).alias("cell"))
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = coded.withColumn("features", array_to_vector(F.col("n_emb")))
    km = KMeans(k=n_cells, seed=42, featuresCol="features", predictionCol="cell").fit(feat)
    return km.transform(feat).select("n_vec", "code", "n2", "cell")


def run(spark, variant: str):
    sd.assign_cells = ASSIGN_R13 if variant.endswith("r13") else assign_cells_r12
    try:
        return QUERIES["q129_semantic_dedup"](spark, SF_DIR).collect()
    finally:
        sd.assign_cells = ASSIGN_R13


def sha(rows) -> str:
    return hashlib.sha256(repr([tuple(r) for r in rows]).encode()).hexdigest()[:16]


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="morphl-ab-semdedup")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")

    ref = None
    for v in ("A_r12", "B_r13"):
        s = sha(run(spark, v))
        print(f"# {v}: result sha {s}", file=sys.stderr)
        if ref is None:
            ref = s
        else:
            assert s == ref, "variants disagree!"

    best = {"A_r12": 1e9, "B_r13": 1e9}
    for r in range(rounds):
        # alternate order within rounds so drift hits both variants
        order = ("A_r12", "B_r13") if r % 2 == 0 else ("B_r13", "A_r12")
        for v in order:
            spark.sparkContext.setJobDescription(f"ab-semdedup:{v}:{r}")
            t0 = time.perf_counter()
            run(spark, v)
            dt = time.perf_counter() - t0
            best[v] = min(best[v], dt)
            print(f"# round {r} {v}: {dt:.3f}s", file=sys.stderr)
    print({k: round(v, 4) for k, v in best.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())

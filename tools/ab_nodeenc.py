"""Interleaved A/B for round 14 (VERDICT r13 top item): order-preserving
BIGINT encoding of the trade-graph node ids for the LPA/PageRank
iteration shuffles.

Current (A): iterations shuffle 'c<custkey>'/'s<suppkey>' STRING node
ids — every per-iteration join/agg hashes and compares variable-length
strings (UnsafeRow: 8B offset+len + padded bytes vs 8B for a long).

Candidate (B): encode each name into a BIGINT that preserves the
names' ASCII order exactly (guide §2.3 — narrower types), iterate on
ints, decode analytically at the end:

    enc = tag * 11^17 + E(key)        tag: 'c'=0, 's'=1
    E(key) = Horner over the decimal digits d of key, each mapped to
             d+1 in base 11, right-padded with 0 to 17 positions
             == sum (d_i+1) * 11^(17-i)

Lexicographic order over digit strings (no leading zeros) maps
monotonically to E because every real digit (>=1) beats the pad (0) —
the standard fractional-base trick — so LPA's min-label tie-break
picks the same winner. Exhaustive model check in
tests/test_node_encoding.py. Requires 0 <= key < 10^17 (guarded with
raise_error in the build projection).

Methodology: single warm session under the bench profile, variants
interleaved A,B,A,B..., best-of per variant, result equality asserted
in the same run.

Usage: python tools/ab_nodeenc.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from morphl_community_edition_spark.catalog import load_table  # noqa: E402
from morphl_community_edition_spark.operators.labelprop import (  # noqa: E402
    label_propagation,
)
from morphl_community_edition_spark.operators.pagerank import (  # noqa: E402
    pagerank,
    symmetrize_edges,
)
from morphl_community_edition_spark.queries.workload import (  # noqa: E402
    LPA_ITERS,
    PR_ITERS,
)
from morphl_community_edition_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ENC_L = 11**17
# MULTS[n] = 11^(17-n): the right-pad multiplier for an n-digit key
ENC_MULTS = "array({})".format(
    ",".join(f"{11 ** (17 - n)}L" for n in range(1, 18))
)


def _node_enc(tag: int, key: str) -> F.Column:
    """Order-preserving BIGINT encoding of concat('c'|'s', key)."""
    return F.expr(
        f"CASE WHEN {key} >= 0 AND {key} < 100000000000000000 THEN "
        f"{tag}L * {ENC_L}L + aggregate("
        f"  transform(split(CAST({key} AS STRING), ''),"
        f"            c -> CAST(ascii(c) - 47 AS BIGINT)),"
        f"  struct(CAST(0 AS BIGINT) AS a, 0 AS n),"
        f"  (s, d) -> struct(s.a * 11 + d AS a, s.n + 1 AS n),"
        f"  s -> s.a * element_at({ENC_MULTS}, s.n))"
        f" ELSE raise_error(concat('node key out of encodable range "
        f"[0, 10^17): ', CAST({key} AS STRING))) END"
    )


def _node_dec(enc: str) -> F.Column:
    """Invert _node_enc analytically: tag char + decimal key string."""
    return F.expr(
        f"concat(CASE WHEN {enc} >= {ENC_L}L THEN 's' ELSE 'c' END, "
        f"CAST(aggregate(sequence(1, 17), CAST(0 AS BIGINT), "
        f"(k, i) -> CASE WHEN ({enc} % {ENC_L}L) DIV element_at({ENC_MULTS}, i) % 11 > 0 "
        f"THEN k * 10 + ({enc} % {ENC_L}L) DIV element_at({ENC_MULTS}, i) % 11 - 1 "
        f"ELSE k END) AS STRING))"
    )


def trade_graph_edges_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-13 (string node ids) edge build, verbatim — variant A is
    inlined so the A/B stays valid regardless of what workload.py
    currently ships."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .localCheckpoint(eager=True)
    )
    return symmetrize_edges(pairs)


def q143_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks = pagerank(trade_graph_edges_str(spark, sf_dir), iters=PR_ITERS)
    return (
        ranks.select("node", F.col("r").alias("rank_scaled"))
        .orderBy(F.col("rank_scaled").desc(), "node")
        .limit(30)
    )


def q145_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = label_propagation(trade_graph_edges_str(spark, sf_dir), iters=LPA_ITERS)
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("community_size")
    )
    return (
        labels.join(sizes, "label")
        .select("node", F.col("label").alias("community"), "community_size")
        .orderBy("node")
    )


def trade_graph_edges_enc(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            _node_enc(0, "o_custkey").alias("src"),
            _node_enc(1, "l_suppkey").alias("dst"),
        )
        .localCheckpoint(eager=True)
    )
    return symmetrize_edges(pairs)


def q143_enc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks = pagerank(trade_graph_edges_enc(spark, sf_dir), iters=PR_ITERS)
    return (
        ranks.select(
            _node_dec("node").alias("node"), F.col("r").alias("rank_scaled")
        )
        .orderBy(F.col("rank_scaled").desc(), "node")
        .limit(30)
    )


def q145_enc(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = label_propagation(trade_graph_edges_enc(spark, sf_dir), iters=LPA_ITERS)
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("community_size")
    )
    return (
        labels.join(sizes, "label")
        .select(
            _node_dec("node").alias("node"),
            _node_dec("label").alias("community"),
            "community_size",
        )
        .orderBy("node")
    )


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="morphl-ab-nodeenc")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")

    cases = {
        "pagerank": {
            "A_str": lambda: q143_str(spark, SF_DIR),
            "B_enc": lambda: q143_enc(spark, SF_DIR),
        },
        "lpa": {
            "A_str": lambda: q145_str(spark, SF_DIR),
            "B_enc": lambda: q145_enc(spark, SF_DIR),
        },
    }
    for case, variants in cases.items():
        ref = None
        for name, fn in variants.items():
            rows = [tuple(r) for r in fn().collect()]
            if ref is None:
                ref = rows
            else:
                assert rows == ref, f"{case}/{name} result differs!"
            print(f"# {case}/{name}: equality ok ({len(rows)} rows)", file=sys.stderr)

    best: dict[str, float] = {}
    for r in range(rounds):
        for case, variants in cases.items():
            for name, fn in variants.items():
                key = f"{case}:{name}"
                spark.sparkContext.setJobDescription(f"ab-nodeenc:{key}:{r}")
                t0 = time.perf_counter()
                fn().collect()
                dt = time.perf_counter() - t0
                best[key] = min(best.get(key, 1e9), dt)
                print(f"# round {r} {key}: {dt:.3f}s", file=sys.stderr)
    print({k: round(v, 4) for k, v in best.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())

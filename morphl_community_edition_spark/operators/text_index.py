"""Persisted BM25 text index — the production form of lexical
retrieval (round 8), completing the persisted-serving triple: dedup
(operators/incremental_index, q134), ANN (operators/ann_index, q150),
and now full-text search.

q141 re-derives postings, document lengths, and corpus stats from the
raw corpus on every query — right for a batch scoring job, wrong for
a search system. The split at the ingest/serve line:

- ``build_text_index`` (two corpus scans — lengths + the postings
  explode/agg, the irreducible cost of a search build): full postings
  (term, doc_id, tf) partitioned by ``term_bucket`` =
  md5-hash(term) mod n_buckets — a real vocabulary cannot be
  partitioned BY TERM (directory-per-distinct-term explodes), but a
  stable hash bucket gives file-level pruning with a bounded
  directory count — plus doc_stats (doc_id, dl) and 1-row meta
  (n_docs, sumdl, n_buckets).
- ``bm25_topk`` (per query): the query terms' buckets are computed
  DRIVER-SIDE (md5 is the one hash both Python and Spark spell
  identically — the sampler's cross-engine device), so the postings
  scan carries a LITERAL partition-filter: static pruning, no job,
  ~|terms|/n_buckets of the index files read. df/idf re-derive from
  the pruned postings (df of a term never depends on other terms);
  the scoring chain is q141's verbatim — integer-scaled idf, IEEE
  tf-normalization with identical parenthesization, BIGINT per-term
  contributions, (score, doc_id) ordering — so the served top-k for
  q141's workload EQUALS q141 and shares its oracle (the q114→q134
  device; q151 in queries/llm.py).

100 TB: the build pays the one corpus-wide (doc, term) shuffle a
search index always costs; serving reads only the probed buckets'
files + the doc_stats rows the tiny tf frame joins (AQE broadcasts
the tf side), and the cut is TakeOrderedAndProject.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from morphl_community_edition_spark.functions.hashing import md5_long60
from morphl_community_edition_spark.functions.rounding import crnd
from morphl_community_edition_spark.operators import manifest

N_BUCKETS = 64


def _bucket_py(term: str, n_buckets: int) -> int:
    """Python twin of the Spark-side bucket expression — byte-for-byte
    the md5_long60 device (hex prefix 15 → int → mod)."""
    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % n_buckets


def build_text_index(
    docs: DataFrame, path: str, text_col: str = "text", n_buckets: int = N_BUCKETS
) -> None:
    """Two corpus scans (doc lengths; postings) → persisted search
    index at ``path``; corpus stats re-aggregate off the tiny written
    doc_stats table, not the raw corpus. A REBUILD clears the prior
    commit marker first (round-9 review): a crash mid-rebuild must
    leave a rejected torn directory, not an old marker blessing a
    new/old table mix."""
    manifest.clear_commit(path)
    spark = docs.sparkSession
    ws = F.split(F.col(text_col), " ")
    dl = docs.select("doc_id", F.size(ws).cast("bigint").alias("dl"))
    dl.write.mode("overwrite").parquet(os.path.join(path, "doc_stats"))
    postings = (
        docs.select("doc_id", F.explode(ws).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .withColumn(
            "term_bucket", (md5_long60(F.col("term")) % F.lit(n_buckets)).cast("int")
        )
    )
    postings.write.mode("overwrite").partitionBy("term_bucket").parquet(
        os.path.join(path, "postings")
    )
    # corpus stats from the WRITTEN doc_stats table (tiny, 2 columns)
    # — aggregating over dl's lineage would re-scan the raw corpus a
    # third time (round-8 review)
    st = (
        spark.read.parquet(os.path.join(path, "doc_stats"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("dl").cast("bigint").alias("sumdl"),
        )
        .collect()[0]
    )
    spark.createDataFrame(
        [(int(st["n_docs"]), int(st["sumdl"]), int(n_buckets))],
        "n_docs long, sumdl long, n_buckets int",
    ).write.mode("overwrite").parquet(os.path.join(path, "meta"))
    # atomic commit marker, written LAST (round 9): a torn build —
    # e.g. postings written, meta missing or stale — must be rejected
    # at serve time, not scored from partial buckets
    manifest.write_commit(
        path,
        {
            "kind": "text_index",
            "n_docs": int(st["n_docs"]),
            "n_buckets": int(n_buckets),
        },
    )


def bm25_topk(
    spark: SparkSession,
    path: str,
    terms: tuple[str, ...],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Serve a BM25 top-k query from the persisted index. Same output
    contract as q141: (doc_id, n_terms, score_scaled, score)."""
    manifest.require_commit(path, "BM25 text index")
    meta = spark.read.parquet(os.path.join(path, "meta")).collect()[0]
    n_docs, sumdl, n_buckets = meta["n_docs"], meta["sumdl"], meta["n_buckets"]
    buckets = sorted({_bucket_py(t, n_buckets) for t in terms})
    tfq = (
        spark.read.parquet(os.path.join(path, "postings"))
        # literal partition filter — STATIC pruning, plan-gated
        .filter(F.col("term_bucket").isin(buckets) & F.col("term").isin(*terms))
        .select("doc_id", "term", "tf")
        # NOT pinned (round 13): _bm25_score references tfq twice →
        # 2 pruned postings scans, and tools/ab_bm25_serve.py measured
        # a pin at −16% locally — but a localCheckpoint would hide the
        # term_bucket static PartitionFilter behind a checkpoint RDD,
        # erasing the plan-gated serving contract (test_plans
        # q151/hybrid gates). Pruning evidence > the duplicated small
        # read; see OPTIMIZATION_r13.md.
    )
    dl = spark.read.parquet(os.path.join(path, "doc_stats"))
    # corpus stats re-enter as a 1-row frame of the stored BIGINTs, so
    # the shared scorer sees the SAME column-typed operands as the
    # inline path — one scoring chain, zero literal-vs-column skew
    st = spark.createDataFrame(
        [(int(n_docs), int(sumdl))], "n_docs long, sumdl long"
    )
    return _bm25_score(tfq, dl, st, k=k, k1=k1, b=b)


def bm25_topk_inline(
    docs: DataFrame,
    terms: tuple[str, ...],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """q141's one-shot in-session BM25 (postings/stats re-derived from
    the raw corpus per call), parameterized over the term set — the
    reference the persisted serve path is equality-tested against on
    ARBITRARY term sets, and the implementation q141 itself runs.
    Scoring chain documented at q141 (queries/llm.py); moved here
    verbatim in round 8 so live and persisted paths share one home.

    Round 13 (guide §7.2 duplicated subtrees, §8 lightweight proxy):
    ``tfq`` is referenced twice downstream (df derivation +
    contribution join), so the un-pinned plan re-derived the
    explode/filter/agg corpus subtree twice; it is pinned with an
    eager localCheckpoint — |hits|-sized after the term filter.
    ``dl`` is also referenced twice (st agg + length join) but is NOT
    pinned: the three-variant interleaved A/B (tools/ab_bm25.py)
    ordered pin-tfq-only < pin-both < unpinned in every round (best
    1.30 / 1.97 / 2.64 s) — materializing per-doc lengths costs a
    full corpus job while recomputing them shares the scan AQE
    already reuses. Results identical in-run; q141/q151/q155/q157
    oracle hash-green after."""
    ws = F.split(F.col("text"), " ")
    dl = docs.select("doc_id", F.size(ws).cast("bigint").alias("dl"))
    st = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sumdl"),
    )
    tfq = (
        docs.select("doc_id", F.explode(ws).alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .localCheckpoint()
    )
    return _bm25_score(tfq, dl, st, k=k, k1=k1, b=b)


def _bm25_score(
    tfq: DataFrame,
    dl: DataFrame,
    st: DataFrame,
    k: int,
    k1: float,
    b: float,
) -> DataFrame:
    """The ONE Okapi scoring chain (round-8 review: it existed twice,
    literal-vs-column, in this module) — q141's exact device: idf
    integer-scaled on the term-sized frame, IEEE tf-normalization
    with fixed parenthesization, BIGINT per-term contributions summed
    exactly, (score, doc_id) ordering. ``tfq``=(doc_id, term, tf),
    ``dl``=(doc_id, dl), ``st``=1-row (n_docs, sumdl) — from a live
    aggregate (inline path) or the index's stored meta (serve path);
    both are exact BIGINTs, so the float chain sees identical
    operands either way."""
    dfr = tfq.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    idf = dfr.crossJoin(F.broadcast(st)).select(
        "term",
        F.floor(
            F.log(
                F.lit(1)
                + (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
                / (F.col("df").cast("double") + F.lit(0.5))
            )
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("idf_slp"),
    )
    avgdl = F.col("sumdl").cast("double") / F.col("n_docs").cast("double")
    tfnorm = (F.col("tf").cast("double") * F.lit(k1 + 1)) / (
        F.col("tf").cast("double")
        + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl))
    )
    co = (
        tfq.join(dl, "doc_id")
        .join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(st))
        .select(
            "doc_id",
            F.floor(F.col("idf_slp").cast("double") * tfnorm + F.lit(0.5))
            .cast("bigint")
            .alias("contrib"),
        )
    )
    return (
        co.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum("contrib").cast("bigint").alias("score_scaled"),
        )
        .select(
            "doc_id",
            "n_terms",
            "score_scaled",
            crnd(F.col("score_scaled").cast("double") / F.lit(1e6), 6).alias("score"),
        )
        .orderBy(F.col("score_scaled").desc(), "doc_id")
        .limit(k)
    )

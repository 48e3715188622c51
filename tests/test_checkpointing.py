"""Durable-checkpoint option for driver-loop operators (round-8
verdict #5): reliable=True must produce identical results via
``DataFrame.checkpoint`` files on durable storage (the cluster
story), and must fail LOUDLY when no checkpoint dir exists instead
of silently degrading to the non-durable local path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from morphl_community_edition_spark.operators.pagerank import (
    pagerank,
    symmetrize_edges,
)


def _checkpoint_dir_set(spark) -> bool:
    return spark.sparkContext._jsc.sc().getCheckpointDir().isDefined()


def _tiny_graph(spark):
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")],
        "src string, dst string",
    )
    return symmetrize_edges(pairs)


def test_reliable_without_checkpoint_dir_fails_loudly(spark):
    """No configured checkpoint dir + reliable=True must raise Spark's
    own checkpoint error — a silent localCheckpoint fallback would
    re-introduce the durability hole the caller asked to close. (Only
    assertable while the shared context has no sticky checkpoint dir
    from an earlier test in this session.)"""
    from morphl_community_edition_spark.operators.checkpointing import (
        loop_checkpoint,
    )

    if _checkpoint_dir_set(spark):
        pytest.skip("shared SparkContext already has a checkpoint dir")
    df = spark.range(10).select(F.col("id").cast("bigint").alias("v"))
    with pytest.raises(Exception, match="[Cc]heckpoint"):
        loop_checkpoint(df, reliable=True)


def test_pagerank_reliable_checkpoint_matches_and_is_durable(spark, tmp_path):
    """reliable=True == the default path bit-for-bit, with the loop
    state actually materialized as reliable checkpoint files under the
    given dir — what survives an executor loss, unlike localCheckpoint
    blocks (which die with the executor AND have no lineage left to
    recompute from)."""
    edges = _tiny_graph(spark)
    ckpt = str(tmp_path / "ckpt")
    local = {r["node"]: r["r"] for r in pagerank(edges, iters=3).collect()}
    rel_df = pagerank(edges, iters=3, reliable=True, checkpoint_dir=ckpt)
    rel = {r["node"]: r["r"] for r in rel_df.collect()}
    assert rel == local
    # durable evidence: checkpoint files exist on the filesystem
    files = [
        os.path.join(dp, f) for dp, _, fs in os.walk(ckpt) for f in fs
    ]
    assert files, "reliable=True wrote no checkpoint files"
    # and the result frame is re-collectable purely from those files
    # even after every cached fragment is dropped (simulated loss of
    # all executor-memory state — the scenario that kills the
    # localCheckpoint path)
    spark.catalog.clearCache()
    assert {r["node"]: r["r"] for r in rel_df.collect()} == local


def test_bpe_reliable_checkpoint_matches(spark, tmp_path):
    """Same contract for the BPE trainer's k-loop: reliable=True
    reproduces the merge list and the final segmented vocabulary
    exactly."""
    from morphl_community_edition_spark.operators.bpe import bpe_learn

    docs = spark.createDataFrame(
        [("low lower lowest",), ("new newer newest",), ("low new low",)],
        ["text"],
    )
    rows_l, vocab_l = bpe_learn(docs, k=3)
    rows_r, vocab_r = bpe_learn(
        docs, k=3, reliable=True, checkpoint_dir=str(tmp_path / "bpe_ckpt")
    )
    assert rows_r == rows_l
    key = lambda df: sorted(
        (r["word"], r["freq"], tuple(r["syms"])) for r in df.collect()
    )
    assert key(vocab_r) == key(vocab_l)

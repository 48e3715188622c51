"""Loop-checkpoint policy for driver-driven iterative operators
(PageRank, BPE training) — round 8.

Driver k-loops re-checkpoint their small state frame each iteration so
plan depth stays O(1). Locally, ``localCheckpoint`` is the right tool:
it truncates lineage into executor block storage with no filesystem
round-trip. But localCheckpoint is NON-DURABLE — its blocks die with
the executor, and because lineage was truncated they are
unrecoverable, so a single executor failure at iteration k kills the
whole loop. On a real cluster the loop should pay the small
reliable-checkpoint cost (the state frames are node/vocab-sized, not
corpus-sized) and survive failures.

``loop_checkpoint`` is that policy switch in one place: callers pass
``reliable=True`` (after pointing ``sparkContext.setCheckpointDir`` at
durable storage — HDFS/S3 on a cluster, any local dir in tests; the
``ensure_checkpoint_dir`` helper wires it) and every iteration uses
``DataFrame.checkpoint`` instead. Corpus-scale frames built ONCE
before the loop (the carried-degree edge list) don't need either form:
``persist()`` keeps their lineage, so lost blocks self-heal by
recomputation — that is the durable default for them already.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_checkpoint_dir(spark: SparkSession, path: str | None) -> None:
    """Point the reliable-checkpoint store at ``path`` (no-op when
    None, or when a directory is already configured and no override
    is given).

    Cleanup (round-9 advice): each reliable loop iteration writes its
    own durable checkpoint directory, and Spark reclaims superseded
    ones only when ``spark.cleaner.referenceTracking.cleanCheckpoints``
    is true (default false) — without it a long or repeated k-loop
    leaks one directory per iteration on the cluster filesystem. The
    conf is a STATIC SparkConf entry (read by ContextCleaner at
    SparkContext construction), so it cannot be flipped here on a
    live session; set it at session build time (session.get_spark
    does) or plan an external sweep of the checkpoint root."""
    sc = spark.sparkContext
    if path is not None:
        sc.setCheckpointDir(path)


def loop_checkpoint(df: DataFrame, reliable: bool = False) -> DataFrame:
    """Truncate ``df``'s lineage for the next loop iteration.

    reliable=False (default, local/dev): ``localCheckpoint`` —
    fastest, non-durable. reliable=True (cluster): ``checkpoint`` to
    the configured checkpoint dir — survives executor loss; raises
    Spark's own error if no checkpoint dir is set, which is the
    correct loud failure (a silent localCheckpoint fallback would
    re-introduce the durability hole the caller asked to close).
    """
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)

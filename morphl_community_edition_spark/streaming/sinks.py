"""Streaming sinks (I8): memory (testing), parquet append, and the
foreachBatch keyed-upsert that mirrors the reference's daily
prediction write into Cassandra (L6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

N_BUCKETS = 64


def to_memory(df: DataFrame, name: str, output_mode: str = "complete") -> StreamingQuery:
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def foreach_batch_upsert(df: DataFrame, path: str, key_cols: list[str], output_mode: str = "update") -> StreamingQuery:
    """True keyed upsert into bucketed parquet: each micro-batch
    MERGES into the buckets it touches — existing rows for other keys
    in the same bucket are carried over, rows matching the batch's
    keys are replaced. (A bare overwrite-partition write would drop
    every co-bucketed key the batch didn't mention.)

    Scale: per batch, only touched buckets are read+rewritten —
    bounded by batch key-spread, not table size. The merged frame is
    localCheckpoint'ed before the write because it reads the same
    files the write replaces.
    """

    def bucketed(frame: DataFrame) -> DataFrame:
        return frame.withColumn("__bucket", F.pmod(F.xxhash64(*key_cols), F.lit(N_BUCKETS)))

    def upsert(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = bucketed(batch)
        touched = [r[0] for r in batch.select("__bucket").distinct().collect()]
        try:
            existing = spark.read.parquet(path).filter(F.col("__bucket").isin(touched))
            carried = existing.join(batch.select(*key_cols).distinct(), key_cols, "left_anti")
            merged = carried.unionByName(batch)
        except Exception:  # first batch: nothing to merge
            merged = batch
        # materialize before overwriting the files we just read
        merged = merged.localCheckpoint(eager=True)
        # dynamic overwrite as a per-WRITE option (only touched buckets
        # replaced) — never a session-wide conf flip
        merged.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("__bucket").parquet(path)

    return df.writeStream.foreachBatch(upsert).outputMode(output_mode).trigger(availableNow=True).start()

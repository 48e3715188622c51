"""Streaming windowed aggregations (I1-I4) with batch twins.

Watermarks bound state: at 100 TB/day the tumbling-window state store
holds only windows newer than (max event time − watermark); everything
older is finalized and evicted. The batch twins run the identical
expression tree over the same rows, so stream == batch is a hard
equality check, not a tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from morphl_community_edition_spark.functions.rounding import crnd, dsum


def tumbling_counts(events: DataFrame, width: str = "10 minutes", watermark: str | None = None) -> DataFrame:
    """I1: tumbling window count/sum per event_type."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), crnd(dsum(F.col("value")), 2).alias("sum_value"))
        .select(F.col("w.start").alias("wstart"), "event_type", "cnt", "sum_value")
    )


def sliding_counts(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes", watermark: str | None = None
) -> DataFrame:
    """I2: sliding window counts (each row lands in width/slide windows)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("wstart"), "event_type", "cnt")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str | None = None) -> DataFrame:
    """I3: session_window aggregation — the streaming twin of
    operators/sessionize.py (lag+cumsum). Both define a session as a
    maximal run with inter-event gaps < gap."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("w.start").alias("s_start"), F.col("w.end").alias("s_end"), "n")
    )

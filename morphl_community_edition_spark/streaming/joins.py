"""Stream-stream joins (I7 completion): two unbounded sides, state on
both, watermark-bounded buffering.

The canonical product-analytics use: purchase→view attribution — join
each purchase to the views that preceded it within the attribution
window. Both sides are streams (unlike the stream-static dimension
join), so Spark buffers BOTH sides' rows in the state store and the
time-range join condition + watermarks are what make that state
finite. Eviction is DERIVED, per side, from the other side's
watermark combined with the range condition — a buffered view can
only match purchases with p_ts <= v_ts + window, so once the
purchase-side watermark passes v_ts + window Spark drops it. That
holds for ANY watermark delay; the delay knob does not need to
clear the join window.

Scale notes (100 TB/day event streams):
- State size ≈ input-rate × (watermark-delay + join-window), per
  side — the window term comes from the derived eviction rule above,
  the delay term from late-data tolerance. The delay is the only
  free knob: keep it as tight as ingestion lag allows.
- The equi key (user_id) drives a state-store partition per shuffle
  partition; size spark.sql.shuffle.partitions to the key cardinality
  and use the RocksDB state store at production scale (in-memory
  HDFSBackedStateStore at test scale).
- Only APPEND output is supported for stream-stream inner joins —
  matches emit as they form; the watermark governs eviction, not
  emission, so results equal the batch join exactly (asserted in
  tests/test_streaming.py::test_s5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_purchase_attribution(
    events: DataFrame,
    window: str = "30 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Purchases joined to prior views of the same user within
    `window`. Pass watermark=None for the batch twin (same code path
    builds both sides of the S5 equivalence check).

    Any watermark delay is correctness-safe for in-order replay:
    Spark evicts a view only when the PURCHASE watermark passes
    v_ts + window (derived from the range condition), which is
    exactly when no future purchase can match it. The delay only
    buys tolerance for out-of-order arrival across micro-batches."""
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if watermark is not None:
        views = views.withWatermark("v_ts", watermark)
        purchases = purchases.withWatermark("p_ts", watermark)
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window}"))
        & (F.col("v_ts") < F.col("p_ts"))
    )
    return purchases.join(views, cond, "inner").select(
        "purchase_id", F.col("p_user").alias("user_id"), "p_ts", "view_id", "v_ts", "purchase_value"
    )

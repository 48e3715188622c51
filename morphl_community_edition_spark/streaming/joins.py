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


def asof_join_stream_static(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    ts: str,
    right_payload: list[str],
    watermark: str | None = "1 hour",
    strict: bool = True,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Streaming as-of join (stream-side C8, round 7): each stream row
    picks up the most recent dimension version at-or-before its ts
    (strict: strictly before). Returns all stream columns plus each
    payload column as ``asof_<col>`` (NULL when nothing qualifies) —
    the same output contract as operators/asof.asof_join, asserted
    equal by the S9 suite test.

    Device: the batch union+window carry cannot run stream-side
    (Structured Streaming forbids row windows over a streaming frame),
    so the STATIC side is closed into validity intervals instead —
    a lead() window on the dimension (batch side, allowed) turns
    version v into [v.ts, next.ts), and the streaming side then needs
    only a stream-static LEFT interval join: per-row predicate
    evaluation, NO streaming state beyond the watermark bound, no
    buffering of the dimension in the state store. Spark re-plans the
    static side per micro-batch, which is what makes this the
    slowly-changing-dimension shape: a dim refresh lands in the next
    batch automatically.

    Semantics matched to the batch twin, case by case:
    - strict ties (event.ts == version.ts): version interval is
      (v.ts, next.ts], so an equal-ts version is excluded — the batch
      side's side-ordering rule;
    - duplicate version timestamps in one key: orderBy(ts, payload)
      gives every non-final tie a zero-length interval, so exactly
      the MAX-payload version matches — the batch side's max-struct
      tie-break;
    - NULL keys: eqNullSafe, because the batch window's partitionBy
      groups NULL keys together (the round-6 NULL-key lesson);
    - tolerance folds into the join condition (a too-far match and no
      match both yield NULL payload under a left join — exactly the
      batch twin's post-carry null-out).

    Scale: the dimension (with intervals) broadcasts when small —
    the common case for dims — else shuffles on the equi key; stream
    state is zero, so throughput is bounded by the scan, not the
    state store. The watermark documents the late-data bound; it is
    not needed for correctness of a static right side."""
    from pyspark.sql import Window

    payload_tagged = [f"asof_{c}" for c in right_payload]
    w = Window.partitionBy(key).orderBy(
        F.col(ts).asc(), *[F.col(c).asc_nulls_first() for c in right_payload]
    )
    d = (
        dim.select(key, ts, *right_payload)
        .withColumn("__next_ts", F.lead(ts).over(w))
        .select(
            F.col(key).alias("__dkey"),
            F.col(ts).alias("__vts"),
            "__next_ts",
            *[F.col(c).alias(p) for c, p in zip(right_payload, payload_tagged)],
        )
    )
    s = stream.withWatermark(ts, watermark) if watermark else stream
    ev_ts = s[ts]
    if strict:
        cond = (ev_ts > F.col("__vts")) & (
            F.col("__next_ts").isNull() | (ev_ts <= F.col("__next_ts"))
        )
    else:
        cond = (ev_ts >= F.col("__vts")) & (
            F.col("__next_ts").isNull() | (ev_ts < F.col("__next_ts"))
        )
    if tolerance_seconds is not None:
        gap = ev_ts.cast("double") - F.col("__vts").cast("double")
        cond = cond & (F.abs(gap) <= F.lit(float(tolerance_seconds)))
    joined = s.join(d, s[key].eqNullSafe(F.col("__dkey")) & cond, "left")
    return joined.select(
        *[s[c] for c in stream.columns], *[F.col(p) for p in payload_tagged]
    )

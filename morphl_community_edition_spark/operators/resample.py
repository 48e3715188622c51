"""Time-series gap-fill / resample (the daily-rollup shape the
reference's per-day batch world implies): produce one row per
(key, day) over each key's active span, carrying the last observed
value forward.

Re-expressed relationally: per-key span aggregate → sequence(explode)
of days → left join observations → last(ignorenulls) ordered window.
One shuffle on the key; the explode multiplies rows by span length,
which is bounded (days, not events) — at 100 TB of events the
resampled frame is SMALLER than the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def daily_gapfill(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One row per (key, day) between the key's first and last active
    day: n_obs that day, last observed value carried forward (ffill).
    """
    daily = (
        events.withColumn("day", F.to_date(ts_col))
        .groupBy(key, "day")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            # deterministic "last of day": max by (ts, value) pair
            F.max(F.struct(F.col(ts_col), F.col(value_col))).alias("__last"),
        )
        .select(key, "day", "n_obs", F.col("__last." + value_col).alias("day_value"))
    )
    spans = daily.groupBy(key).agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    calendar = spans.select(
        key, F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    joined = calendar.join(daily, [key, "day"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key,
        "day",
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        F.last("day_value", ignorenulls=True).over(w).alias("ffill_value"),
    )

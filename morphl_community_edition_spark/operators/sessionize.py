"""Sessionization (L4): assign gap-based session ids per user.

The reference's GA preprocessing works on daily session exports; the
classic re-expression over a raw event stream is the lag + cumulative
sum trick: a row starts a new session when its gap to the previous
event of the same user exceeds the threshold; the running count of
session-starts is the session id.

Scale: one shuffle on user_id (high cardinality → even), both windows
share the same partitioning + ordering so Catalyst plans a single
sort. This is the batch twin of streaming session_window (S2 checks
they agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Add a ``sess`` column: 1-based session index per user.

    Gap comparison is done in integer microseconds (exact; no float
    or interval round-off). The boundary is half-open to match
    streaming ``session_window`` exactly: a session's window is
    [first_ts, last_ts + gap), so an event arriving at EXACTLY
    prev + gap starts a NEW session (>= break, not >).
    """
    # NULLS LAST to mirror DuckDB's default ORDER BY (round-9 review:
    # Spark's ascending NULLS FIRST made every NULL-ts row a leading
    # session break while the oracle folded the first one into the
    # final session). With the identical lag/brk expression on both
    # engines the NULL-ts tail then behaves the same everywhere: the
    # first NULL-ts row joins the previous session (gap is unknowable,
    # no break), each later one starts a new session (its lag ts is
    # NULL). Deterministic, mirrored, documented.
    order_cols = [F.col(ts_col).asc_nulls_last()] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    )
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    gap_us = gap_minutes * 60 * 1_000_000
    ts_us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(ts_us).over(w)
    brk = F.when(prev_us.isNull() | ((ts_us - prev_us) >= gap_us), 1).otherwise(0)
    return events.withColumn("sess", F.sum(brk).over(w))

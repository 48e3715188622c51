"""As-of join (C8): for each left row, the most recent right row with
``right.ts < left.ts`` (strict) or ``<=`` within the same key group.

Spark has no native ASOF JOIN. A nested-loop theta join would be
O(n·m) per key; instead we re-express it as UNION + ordered window —
one shuffle on (key), one sort, linear scan:

    1. tag both inputs and union them on a common schema;
    2. sort per key by (ts, side) — for strict '<' the LEFT rows sort
       BEFORE right rows at equal ts, so an equal-ts right row is
       excluded from the left row's frame; for '<=' they sort after;
    3. ``last(right_value, ignorenulls=True)`` over rows UNBOUNDED
       PRECEDING..CURRENT ROW carries the latest right payload forward;
    4. keep the left rows.

Scale: cost = sort within key partitions (no per-pair work), exactly
the plan you want at 100 TB; skewed keys are handled by AQE, or salt
the key and run per-salt asof then merge (the gap between salt splits
is repaired by a second pass) — not needed at fixture scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_payload: list[str],
    strict: bool = True,
) -> DataFrame:
    """Left as-of join. Returns all ``left`` columns plus each
    ``right_payload`` column (renamed ``asof_<col>``), NULL when no
    right row precedes the left row."""
    left_cols = [c for c in left.columns]
    payload_tagged = [f"asof_{c}" for c in right_payload]

    l_tag = left.select(
        F.col(key).alias("__key"),
        F.col(ts).alias("__ts"),
        # strict '<': left sorts first at ties (side=0) so same-ts right rows are excluded
        F.lit(0 if strict else 1).alias("__side"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(p) for c, p in zip(right_payload, payload_tagged)],
    )
    r_tag = right.select(
        F.col(key).alias("__key"),
        F.col(ts).alias("__ts"),
        F.lit(1 if strict else 0).alias("__side"),
        F.lit(None).cast(l_tag.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(p) for c, p in zip(right_payload, payload_tagged)],
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__left",
        *[F.last(p, ignorenulls=True).over(w).alias(p) for p in payload_tagged],
    )
    return carried.filter(F.col("__left").isNotNull()).select(
        *[F.col(f"__left.{c}").alias(c) for c in left_cols], *payload_tagged
    )

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
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """Can ORDER BY sort this type? (MapType cannot, anywhere in the
    tree — Spark raises EXPRESSION_TYPE_IS_NOT_ORDERABLE.)"""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def _r_struct_type(
    right: DataFrame, ts: str, right_payload: list[str], payload_tagged: list[str]
) -> T.StructType:
    """The __r carry-struct type, built as a DataType (never via a DDL
    string round-trip)."""
    return T.StructType(
        [T.StructField("__match_ts", right.schema[ts].dataType)]
        + [
            T.StructField(p, right.schema[c].dataType)
            for c, p in zip(right_payload, payload_tagged)
        ]
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_payload: list[str],
    strict: bool = True,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join. Returns all ``left`` columns plus each
    ``right_payload`` column (renamed ``asof_<col>``), NULL when no
    right row qualifies.

    ``direction``: 'backward' (default) matches the most recent right
    row at-or-before the left row; 'forward' the earliest right row
    at-or-after it (``strict`` excludes equal-ts matches either way).
    Forward is the SAME one-sort window plan traversed in descending
    ts order — no second algorithm.

    ``tolerance_seconds``: pandas-merge_asof-style gap cap — a match
    farther than this from the left ts is nulled out (payload AND
    match metadata), applied as a pure projection after the carry.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    # SQL comparison semantics: a right row with NULL ts satisfies
    # neither ts < left.ts nor ts > left.ts, so it can never be the
    # as-of match — but the ascending window order sorts NULLS FIRST,
    # where last(__r, ignorenulls) would carry it as a spurious match
    # for left rows with no qualifying right row (round-8 review).
    # Drop such rows up front. (A left row with NULL ts keeps its
    # row and gets a NULL match: no defined order, no match.)
    right = right.filter(F.col(ts).isNotNull())
    left_cols = [c for c in left.columns]
    payload_tagged = [f"asof_{c}" for c in right_payload]

    # The whole right row rides in ONE struct (__r), null only on left
    # rows: last(__r, ignorenulls) therefore lands on the true as-of
    # right row even when that row's payload VALUES are null — carrying
    # payload columns individually would skip a null-payload match and
    # smuggle in a farther row's value (and the tolerance check would
    # then validate the gap against the wrong row's timestamp).
    l_tag = left.select(
        F.col(key).alias("__key"),
        F.col(ts).alias("__ts"),
        # strict: left sorts first at ties (side=0) so same-ts right
        # rows fall outside the left row's frame (both directions)
        F.lit(0 if strict else 1).alias("__side"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__left"),
        # typed-DataType cast (NOT a DDL string — simpleString() output
        # is unparseable for field names that need quoting). Must stay
        # a NULL struct, not a struct of null fields: the ignorenulls
        # carry keys off __r itself being null on left rows.
        F.lit(None).cast(_r_struct_type(right, ts, right_payload, payload_tagged)).alias("__r"),
    )
    r_tag = right.select(
        F.col(key).alias("__key"),
        F.col(ts).alias("__ts"),
        F.lit(1 if strict else 0).alias("__side"),
        F.lit(None).cast(l_tag.schema["__left"].dataType).alias("__left"),
        F.struct(
            F.col(ts).alias("__match_ts"),
            *[F.col(c).alias(p) for c, p in zip(right_payload, payload_tagged)],
        ).alias("__r"),
    )
    unioned = l_tag.unionByName(r_tag)
    # NULL-ts LEFT rows must see an EMPTY frame in both directions
    # (no defined order -> no match). Ascending order gives that for
    # free (NULLS FIRST); descending defaults to NULLS LAST, where a
    # NULL-ts left row would sort after every right row and last(__r)
    # would hand it the minimum-ts right row (round-9 review) —
    # desc_nulls_first restores the empty-frame invariant.
    ts_order = (
        F.col("__ts").asc()
        if direction == "backward"
        else F.col("__ts").desc_nulls_first()
    )
    # A deterministic tie-break over right-rows tied on (ts, side)
    # (repo rule: no last() without a total order); left rows all carry
    # null __r, so their relative order is inert. When every payload
    # type is orderable the whole __r struct is the cheapest total
    # order; otherwise (MapType anywhere in the payload would make
    # ORDER BY raise) sort by __match_ts + the orderable payload
    # fields + a JSON rendering of the full struct as the last resort.
    r_type = l_tag.schema["__r"].dataType
    if _orderable(r_type):
        tie = [F.col("__r").asc_nulls_first()]
    else:
        tie = [F.col("__r").getField("__match_ts").asc_nulls_first()]
        tie += [
            F.col("__r").getField(f.name).asc_nulls_first()
            for f in r_type.fields
            if f.name != "__match_ts" and _orderable(f.dataType)
        ]
        tie.append(F.to_json(F.col("__r")).asc_nulls_first())
    w = (
        Window.partitionBy("__key")
        .orderBy(ts_order, F.col("__side").asc(), *tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__left",
        F.col("__ts").alias("__lts"),
        F.last("__r", ignorenulls=True).over(w).alias("__m"),
    ).filter(F.col("__left").isNotNull())
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("__lts").cast("double") - F.col("__m").getField("__match_ts").cast("double")
        )
        in_tol = F.col("__m").isNotNull() & (gap <= F.lit(float(tolerance_seconds)))
        carried = carried.select("__left", F.when(in_tol, F.col("__m")).alias("__m"))
    # getField (not dotted-path strings): payload/left column names are
    # user-supplied and may need quoting
    return carried.select(
        *[F.col("__left").getField(c).alias(c) for c in left_cols],
        *[F.col("__m").getField(p).alias(p) for p in payload_tagged],
    )

"""Pure range (interval) join — C7's scale path when there is NO equi
key: point-in-interval matching via time-bucketization.

Without an equi column, Catalyst's only native plan for
`l.ts BETWEEN r.lo AND r.hi` is BroadcastNestedLoopJoin — O(|L|·|R|)
and driver-memory-bound on the broadcast side. The standard rewrite:

1. pick a bucket width W (≈ the typical interval length);
2. each right interval EXPLODES into the buckets it covers
   (floor(lo/W) … floor(hi/W) — expansion factor ≈ len/W + 1);
3. each left point maps to its single bucket floor(ts/W);
4. equi-join on the bucket id (shuffle- or broadcast-hash — Catalyst
   picks), then REFINE with the exact predicate.

Each (point, interval) pair meets in exactly one bucket (the point's),
so no post-join dedup is needed. Cost: one shuffle on bucket id +
|R|·(len/W) expansion instead of |L|·|R| pairs. W trades expansion
(small W) against bucket fan-in (large W); skewed hot buckets fall to
AQE's skew split like any other equi join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__ij_bucket"


def _b(col: Column, width_s: int) -> Column:
    return F.floor(F.unix_timestamp(col) / F.lit(width_s)).cast("long")


def range_join_bucketized(
    points: DataFrame,
    intervals: DataFrame,
    ts: str,
    lo: str,
    hi: str,
    bucket_width_s: int,
    half_open: bool = True,
    broadcast_points: bool = False,
) -> DataFrame:
    """points ⋈ intervals on lo <= ts < hi (or <= hi when
    half_open=False), no equi key required. Columns from both inputs
    survive; the helper bucket column does not. Inputs must have
    DISJOINT column sets (enforced) — shared names would make the
    refine predicate ambiguous after the join.

    ``broadcast_points``: the bucket-id shuffle join concentrates all
    match volume in the handful of buckets the points span — with a
    narrow point range (q86: one month) only 2-5 shuffle partitions
    carry data and the downstream refine+aggregation runs on that many
    cores, however wide the cluster. When the POINTS side is known
    small (callers gate on source bytes, as with broadcast hints), set
    True: points broadcast, the intervals side keeps its scan
    partitioning (fanned out if the input is a narrow single-row-group
    scan), and the match volume is spread across interval partitions
    with map-side partial aggregation downstream — no hot-bucket
    skew possible. Measured 10.4 s -> ~1 s on q86 at sf0.1."""
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"range_join_bucketized requires disjoint schemas; shared columns: {sorted(overlap)}"
        )
    if _BUCKET in points.columns or _BUCKET in intervals.columns:
        raise ValueError(f"reserved column name {_BUCKET} present in an input")
    pts = points.withColumn(_BUCKET, _b(F.col(ts), bucket_width_s))
    if broadcast_points:
        # fan out the RAW intervals BEFORE the bucket explode (ADVICE
        # r5): the repartition then moves only the narrow pre-explode
        # rows — fanning out after the explode would shuffle ~len/W+1
        # copies of every interval, contradicting the helper's contract
        from morphl_community_edition_spark.plans.hints import fan_out_narrow_scan

        intervals = fan_out_narrow_scan(intervals)
    ivs = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(_b(F.col(lo), bucket_width_s), _b(F.col(hi), bucket_width_s))
        ),
    )
    upper = F.col(ts) < F.col(hi) if half_open else F.col(ts) <= F.col(hi)
    if broadcast_points:
        joined = ivs.join(F.broadcast(pts), _BUCKET)
    else:
        joined = pts.join(ivs, _BUCKET)
    return joined.filter((F.col(ts) >= F.col(lo)) & upper).drop(_BUCKET)

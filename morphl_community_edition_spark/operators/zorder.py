"""Z-order (Morton) multi-dimensional data clustering.

At 100 TB the dominant cost of a selective query is HOW MUCH of the
table the scan can skip. Partitioning/sorting by ONE key gives file
skipping on that key and none on any other; interleaving the bits of
two keys into a Morton code and clustering files by code ranges gives
BOTH keys locality at once — a filter on either dimension touches
O(selectivity^(1/2)) of the z-buckets instead of all of them (the
curse-of-one-sort-order fix Delta/Iceberg expose as OPTIMIZE ZORDER;
Morton 1966, and Orenstein-Merrett's range-decomposition analysis).

The code here keeps the engine honest about what z-ordering IS: a
pure per-row integer projection (no shuffle beyond the layout write's
own partitioning), computed with the classic mask-multiply bit-spread
— five shift/mask ops per dimension, expressible identically in ANSI
SQL, so the projection itself is DuckDB-hash-certifiable (q164).
Layout write = partitionBy(zbucket): a coarse prefix of the code
(top ``bucket_bits`` bits) becomes the partition directory, so
Spark's ordinary static partition pruning — no new reader machinery —
delivers the multi-dimensional skipping; within a partition,
sortWithinPartitions(z) additionally orders row groups for parquet
min/max skipping on the fine bits.

Serving has two pruning tiers:

- bucket-level: a driver-computed literal ``zbucket IN (...)`` list
  (zbuckets_for_x_range for one-dimensional predicates) — static
  partition pruning, whose skip factor the locality property test
  measures empirically (tests/test_maintenance_ops.py,
  test_zorder_layout_skips_on_both_dimensions);
- row-group-level (round 12): z_ranges_for_rect decomposes a full
  rectangular predicate into a small set of half-open z intervals by
  quadtree descent — the Orenstein-Merrett range decomposition whose
  per-interval endpoints are exactly the BIGMIN/LITMAX values of
  Tropf-Herzog (1981). The intervals become ``z BETWEEN`` disjuncts
  that parquet row-group min/max stats can evaluate (the layout sorts
  by z within every partition), so a selective 2-d rectangle skips
  I/O *below* the bucket level with no new reader machinery.

The layout write persists its ``bucket_bits`` in a ``_zlayout.json``
sidecar; serve paths read it back (layout_bucket_bits) instead of
trusting a caller-supplied constant — a mismatched constant would
silently drop rows (round-11 advice item).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# bit-spread masks for 16 -> 32-bit interleave (BIGINT-safe everywhere)
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)

ZBITS = 16  # per-dimension input width; z-value uses 2*ZBITS bits


def _spread_bits(c: Column) -> Column:
    """Spread a 16-bit non-negative int so its bits occupy the even
    positions of a 32-bit word: b15..b0 -> 0b15 0b14 ... 0b0."""
    out = c
    for sh, mask in _SPREAD:
        out = (out.bitwiseOR(F.shiftleft(out, sh))).bitwiseAND(F.lit(mask))
    return out


def sql_spread_bits(expr: str) -> str:
    """DuckDB twin of _spread_bits — textually the same shift/mask
    chain on BIGINT."""
    out = f"CAST({expr} AS BIGINT)"
    for sh, mask in _SPREAD:
        out = f"(({out} | ({out} << {sh})) & {mask})"
    return out


def z_value(x: Column, y: Column) -> Column:
    """Morton code of two 16-bit non-negative ints (callers clamp
    their dimensions into range with pmod/datediff first): x takes
    the odd bit positions, y the even."""
    return F.shiftleft(_spread_bits(x.cast("long")), 1).bitwiseOR(
        _spread_bits(y.cast("long"))
    )


def sql_z_value(x_expr: str, y_expr: str) -> str:
    return f"(({sql_spread_bits(x_expr)} << 1) | {sql_spread_bits(y_expr)})"


def _check_bucket_bits(bucket_bits: int) -> None:
    """Even-ness is load-bearing: zbuckets_for_x_range's superset
    proof interleaves k = bucket_bits/2 bits of EACH dimension — an
    odd value silently breaks the proof (and thus drops rows), so it
    is rejected everywhere instead."""
    if bucket_bits % 2 != 0 or not (2 <= bucket_bits <= 2 * ZBITS):
        raise ValueError(
            f"bucket_bits must be even and in [2, {2 * ZBITS}], got {bucket_bits}"
        )


def zbucket(z: Column, bucket_bits: int) -> Column:
    """The coarse layout key: top ``bucket_bits`` bits of the 32-bit
    z-value — 2**bucket_bits partition directories."""
    _check_bucket_bits(bucket_bits)
    return F.shiftright(z, 2 * ZBITS - bucket_bits).cast("int")


def _py_spread(v: int) -> int:
    """Driver-side twin of _spread_bits (same mask chain — Python int
    ops are exact, so the twin cannot drift from the Column version)."""
    for sh, mask in _SPREAD:
        v = (v | (v << sh)) & mask
    return v


def zbuckets_for_x_range(
    x_lo: int, x_hi_excl: int, bucket_bits: int
) -> list[int]:
    """Every z-bucket that COULD contain a row with x in
    [x_lo, x_hi_excl) — the driver-computed literal partition filter
    (the point_lookup/BM25 static-pruning device: no DPP subquery,
    the bucket list is pure integer math on the predicate bounds).

    ``bucket_bits`` has NO default (advice r12 #5): a constant that
    disagrees with the layout's persisted sidecar silently drops
    rows, so callers must pass ``layout_bucket_bits(path)``.

    Provably a superset: with bucket_bits=2k, the bucket is the
    interleave of x's and y's top k bits (x>>(16-k), y>>(16-k));
    the x side ranges over the predicate's possible high bits, the
    y side over all 2^k values (y is unconstrained). A range query
    on ONE dimension therefore touches |x_hi_set|·2^k of the 2^2k
    buckets — the √-decay that makes the layout pay on either axis.

    ``bucket_bits`` MUST equal the value the layout was written with
    (read it back with layout_bucket_bits) — a different value is not
    a superset and silently drops rows."""
    _check_bucket_bits(bucket_bits)
    k = bucket_bits // 2
    drop = ZBITS - k
    xs = range(x_lo >> drop, ((x_hi_excl - 1) >> drop) + 1)
    return sorted(
        (_py_spread(xh) << 1) | _py_spread(yh)
        for xh in xs
        for yh in range(1 << k)
    )


def zorder_layout(
    df: DataFrame, x: Column, y: Column, path: str, bucket_bits: int = 6
) -> None:
    """Write ``df`` z-clustered at ``path``: partition dirs by the
    coarse z-bucket (static pruning unit), rows within each partition
    sorted by the full z-value (parquet row-group min/max unit). One
    key-ranged shuffle total — the same cost as any CLUSTER BY write.

    The layout's ``bucket_bits`` is persisted in a ``_zlayout.json``
    sidecar (after the parquet write — overwrite mode clears the dir)
    so serve paths cannot prune with a mismatched constant."""
    from morphl_community_edition_spark.operators import manifest

    _check_bucket_bits(bucket_bits)
    zc = z_value(x, y)
    (
        df.withColumn("z", zc)
        .withColumn("zbucket", zbucket(zc, bucket_bits))
        .repartition("zbucket")
        # (zbucket, z), not plain z: FileFormatWriter demands its input
        # sorted by the partitionBy columns, and a child ordered only
        # by z doesn't satisfy that (Spark can't see zbucket = z >> s),
        # so it would insert its own NON-STABLE sort on zbucket and
        # destroy the z clustering inside every file — measured in
        # round 12: every row group spanned the full bucket range.
        # Leading with zbucket makes the writer's requirement a prefix
        # of the existing ordering, so no extra sort is inserted and
        # the z order survives into the row groups.
        .sortWithinPartitions("zbucket", "z")
        .write.mode("overwrite")
        .partitionBy("zbucket")
        .parquet(path)
    )
    manifest.write_json_record(
        os.path.join(path, "_zlayout.json"),
        {"bucket_bits": bucket_bits, "zbits": ZBITS},
        root=path,
    )


def layout_bucket_bits(path: str) -> int:
    """The ``bucket_bits`` a layout was written with, from its sidecar.
    Pre-round-12 layouts have no sidecar — fail loudly rather than
    guess (a wrong value is silent row loss, not an error)."""
    from morphl_community_edition_spark.operators import manifest

    rec = manifest.read_json_record(os.path.join(path, "_zlayout.json"))
    if rec is None or "bucket_bits" not in rec:
        raise ValueError(
            f"no _zlayout.json sidecar at {path} — rewrite the layout with "
            "zorder_layout (round-12+) before serving from it"
        )
    bits = int(rec["bucket_bits"])
    _check_bucket_bits(bits)
    return bits


def z_ranges_for_rect(
    x_lo: int,
    x_hi_excl: int,
    y_lo: int,
    y_hi_excl: int,
    max_depth: int = 24,
    max_ranges: int = 64,
) -> list[tuple[int, int]]:
    """Decompose the rectangle [x_lo, x_hi) × [y_lo, y_hi) into a
    sorted list of disjoint half-open z-value intervals covering every
    Morton code whose decoded point lies inside — quadtree descent in
    z order (Orenstein & Merrett 1984; each emitted interval's
    endpoints are the BIGMIN/LITMAX jump values of Tropf-Herzog 1981,
    reached here by descent instead of bit surgery).

    Driver-side pure integer math (the zbuckets_for_x_range device,
    generalized to two constrained dimensions). Supersets are allowed
    — callers re-apply the exact x/y predicate — and are introduced
    only by the two tightness valves:

    - ``max_depth``: descent stops at cells of 2^(32-max_depth) codes;
      a boundary cell is accepted whole. Bounds recursion to
      O(perimeter · 2^(max_depth/2)) cells instead of 2^ZBITS for
      thin full-width rectangles.
    - ``max_ranges``: adjacent intervals are merged smallest-gap-first
      until the list fits; the scan cost of a swallowed gap is bounded
      by the gap size, which the greedy merge minimizes.

    The output is what a parquet scan can use directly: each interval
    becomes a ``z BETWEEN lo AND hi-1`` disjunct evaluated against
    row-group min/max stats (the layout sorts by z inside every
    bucket), i.e. I/O skipping BELOW the bucket level."""
    top = 1 << ZBITS
    if not (0 <= x_lo < x_hi_excl <= top and 0 <= y_lo < y_hi_excl <= top):
        raise ValueError(
            f"rectangle out of the {ZBITS}-bit domain: "
            f"x[{x_lo},{x_hi_excl}) y[{y_lo},{y_hi_excl})"
        )
    if not (0 <= max_depth <= 2 * ZBITS):
        raise ValueError(f"max_depth must be in [0, {2 * ZBITS}], got {max_depth}")
    out: list[tuple[int, int]] = []

    # iterative DFS, low-z child pushed last => out is emitted sorted
    stack = [(0, 0, 0, 0)]  # (z_base, depth, cell_x_lo, cell_y_lo)
    while stack:
        zb, d, cx, cy = stack.pop()
        xb, yb = (d + 1) // 2, d // 2  # dimension bits fixed at depth d
        wx, wy = 1 << (ZBITS - xb), 1 << (ZBITS - yb)
        if cx >= x_hi_excl or cx + wx <= x_lo or cy >= y_hi_excl or cy + wy <= y_lo:
            continue  # disjoint from the rectangle
        size = 1 << (2 * ZBITS - d)
        inside = (
            x_lo <= cx and cx + wx <= x_hi_excl and y_lo <= cy and cy + wy <= y_hi_excl
        )
        if inside or d >= max_depth:
            if out and out[-1][1] == zb:  # adjacent => extend in place
                out[-1] = (out[-1][0], zb + size)
            else:
                out.append((zb, zb + size))
            continue
        half = size >> 1
        if d % 2 == 0:  # this split fixes x's next bit
            nwx = wx >> 1
            stack.append((zb + half, d + 1, cx + nwx, cy))
            stack.append((zb, d + 1, cx, cy))
        else:  # y's next bit
            nwy = wy >> 1
            stack.append((zb + half, d + 1, cx, cy + nwy))
            stack.append((zb, d + 1, cx, cy))

    # coalesce to the range budget: swallow the smallest gaps first
    while len(out) > max_ranges:
        gaps = sorted(
            range(1, len(out)), key=lambda i: out[i][0] - out[i - 1][1]
        )[: len(out) - max_ranges]
        keep: list[tuple[int, int]] = []
        drop = set(gaps)
        for i, r in enumerate(out):
            if i in drop and keep:
                keep[-1] = (keep[-1][0], r[1])
            else:
                keep.append(r)
        out = keep
    return out


def zbuckets_for_ranges(
    ranges: list[tuple[int, int]], bucket_bits: int
) -> list[int]:
    """The partition-directory filter implied by a z-interval list:
    every bucket (= top ``bucket_bits`` bits of z) any interval
    touches. Exact w.r.t. the intervals — the two tiers prune the
    same codes at different granularities."""
    _check_bucket_bits(bucket_bits)
    sh = 2 * ZBITS - bucket_bits
    buckets: set[int] = set()
    for lo, hi_excl in ranges:
        buckets.update(range(lo >> sh, ((hi_excl - 1) >> sh) + 1))
    return sorted(buckets)


def z_range_predicate(ranges: list[tuple[int, int]], z: Column) -> Column:
    """OR-of-BETWEEN column for a z-interval list — shaped so the
    parquet data source converts every disjunct to row-group-stat
    filters (Or(And(GreaterThanOrEqual, LessThanOrEqual), ...))."""
    if not ranges:
        return F.lit(False)
    pred = None
    for lo, hi_excl in ranges:
        term = (z >= F.lit(lo)) & (z <= F.lit(hi_excl - 1))
        pred = term if pred is None else (pred | term)
    return pred

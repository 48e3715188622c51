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

Scope honesty: full rectangular-predicate → minimal-z-range
decomposition (BIGMIN/LITMAX) is deliberately NOT implemented; the
serving pattern here is bucket-level pruning, whose skip factor the
locality property test measures empirically (tests/test_smoke_
operators.py) rather than asserts theoretically.
"""

from __future__ import annotations

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


def zbucket(z: Column, bucket_bits: int = 6) -> Column:
    """The coarse layout key: top ``bucket_bits`` bits of the 32-bit
    z-value — 2**bucket_bits partition directories."""
    return F.shiftright(z, 2 * ZBITS - bucket_bits).cast("int")


def _py_spread(v: int) -> int:
    """Driver-side twin of _spread_bits (same mask chain — Python int
    ops are exact, so the twin cannot drift from the Column version)."""
    for sh, mask in _SPREAD:
        v = (v | (v << sh)) & mask
    return v


def zbuckets_for_x_range(
    x_lo: int, x_hi_excl: int, bucket_bits: int = 14
) -> list[int]:
    """Every z-bucket that COULD contain a row with x in
    [x_lo, x_hi_excl) — the driver-computed literal partition filter
    (the point_lookup/BM25 static-pruning device: no DPP subquery,
    the bucket list is pure integer math on the predicate bounds).

    Provably a superset: with bucket_bits=2k, the bucket is the
    interleave of x's and y's top k bits (x>>(16-k), y>>(16-k));
    the x side ranges over the predicate's possible high bits, the
    y side over all 2^k values (y is unconstrained). A range query
    on ONE dimension therefore touches |x_hi_set|·2^k of the 2^2k
    buckets — the √-decay that makes the layout pay on either axis."""
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
    key-ranged shuffle total — the same cost as any CLUSTER BY write."""
    zc = z_value(x, y)
    (
        df.withColumn("z", zc)
        .withColumn("zbucket", zbucket(zc, bucket_bits))
        .repartition("zbucket")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .partitionBy("zbucket")
        .parquet(path)
    )

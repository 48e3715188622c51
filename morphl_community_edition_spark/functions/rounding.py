"""Cross-engine deterministic rounding + exact decimal accumulation.

Two failure classes make naive round(sum(double)) diverge between
engines (observed at sf0.01, SURVEY.md §7 risk register):

1. **Rounding semantics.** Spark's round() goes through
   BigDecimal.valueOf(shortest-repr) HALF_UP; DuckDB's multiplies and
   rounds the double. On a value whose shortest decimal form is an
   exact half at the target digit (e.g. 51.8346875 → 6 digits) they
   disagree. Fix: canonical round = floor(x·10ⁿ + 0.5) / 10ⁿ — the
   same three IEEE-754 double ops on both engines → bit-identical.

2. **Accumulation order.** sum(double) is order-dependent;
   Spark's partial aggregation and DuckDB's parallel scan sum in
   different orders, so the two engines can produce doubles 1 ulp
   apart straddling a rounding boundary. Fix for k-decimal data
   (all money/value fixture columns are 2-decimal): recover the exact
   integer `floor(x·10ᵏ + 0.5)` per row, sum *integers* (exact,
   order-independent), divide once at the end. Products stay exact in
   integer space (cents × basis-points), with 10¹⁷ ≪ 2⁶³ headroom.

Every oracle-checked query uses these helpers on BOTH sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def crnd(col: Column, n: int) -> Column:
    """Canonical round-half-up(-toward-+inf): floor(x·10ⁿ + 0.5)/10ⁿ.

    Domain: |x|·10ⁿ < 2⁶³ (Spark's floor(double) yields BIGINT; DuckDB's
    stays DOUBLE). Every engine output is ≤ ~10¹⁷ after scaling —
    money sums at 100 TB included — so the bound never binds in
    contract queries; verified by tests/test_rounding.py."""
    p = F.lit(float(10**n))
    return F.floor(col * p + F.lit(0.5)) / p


def sql_crnd(expr: str, n: int) -> str:
    """DuckDB twin of crnd — textually the same double ops."""
    return f"floor(({expr}) * 1e{n} + 0.5) / 1e{n}"


def to_scaled_long(col: Column, k: int = 2) -> Column:
    """Exact integer of a k-decimal double column (e.g. cents)."""
    return F.floor(col * F.lit(float(10**k)) + F.lit(0.5)).cast("long")


def sql_scaled_long(expr: str, k: int = 2) -> str:
    return f"CAST(floor(({expr}) * 1e{k} + 0.5) AS BIGINT)"


def dsum(col: Column, k: int = 2) -> Column:
    """Order-independent exact sum of a k-decimal double column,
    returned as double (sum of scaled longs / 10ᵏ)."""
    return F.sum(to_scaled_long(col, k)).cast("double") / F.lit(float(10**k))


def sql_dsum(expr: str, k: int = 2) -> str:
    # DuckDB sums BIGINT into HUGEINT; cast back before the scale-down
    # so both engines do the same double division.
    return f"CAST(sum({sql_scaled_long(expr, k)}) AS DOUBLE) / 1e{k}"


def davg(col: Column, k: int = 2) -> Column:
    """Exact-sum average: (Σ scaled) / 10ᵏ / n — identical op order
    on both engines. n counts NON-NULL values of the column (sum
    skips nulls, so dividing by count(*) would deflate the average
    on nullable data)."""
    return (
        F.sum(to_scaled_long(col, k)).cast("double")
        / F.lit(float(10**k))
        / F.count(col).cast("double")
    )


def sql_davg(expr: str, k: int = 2) -> str:
    return f"CAST(sum({sql_scaled_long(expr, k)}) AS DOUBLE) / 1e{k} / CAST(count({expr}) AS DOUBLE)"


# --- expr-text twins -------------------------------------------------
# Building deep Column trees in Python costs one Py4J round trip per
# node (~0.2-0.3s per rebuild for a 7-aggregate query — measured, see
# bench.py). These helpers hand Spark the SAME canonical SQL text the
# DuckDB oracle runs: one round trip total, parsed JVM-side, and zero
# possibility of drift between the two engines' expression forms.
# Spark-vs-DuckDB note: the CAST(... AS BIGINT)/(AS DOUBLE) casts in
# the shared text are exact no-ops on the Spark side (floor(double) is
# already BIGINT; sum(BIGINT) is BIGINT where DuckDB widens to
# HUGEINT), so both engines execute the identical arithmetic.


def xdsum(expr: str, k: int = 2, n: int = 2) -> Column:
    """Exact k-decimal sum, canonically rounded to n digits — built
    from the oracle's own SQL text."""
    return F.expr(sql_crnd(sql_dsum(expr, k), n))


def xdavg(expr: str, k: int = 2, n: int = 6) -> Column:
    """Exact-sum average, canonically rounded — from the oracle text."""
    return F.expr(sql_crnd(sql_davg(expr, k), n))


def xcrnd(expr: str, n: int) -> Column:
    """Canonical round of an arbitrary SQL expression text."""
    return F.expr(sql_crnd(expr, n))

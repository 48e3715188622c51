"""Deterministic cross-engine hashing helpers.

Spark's xxhash64/hash and DuckDB's hash() are different algorithms, so
oracle-checked fingerprints derive integers from md5 hex instead —
md5 is identical everywhere:

    Spark : CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)
    DuckDB: CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)

15 hex chars = 60 bits → always a non-negative BIGINT on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long60(col: Column) -> Column:
    """60-bit non-negative integer hash of a string column."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def word_hash_expr(word_col: str = "word") -> str:
    """SQL-expression form of md5_long60 for use inside F.expr lambdas."""
    return f"CAST(conv(substring(md5(CAST({word_col} AS BINARY)), 1, 15), 16, 10) AS BIGINT)"

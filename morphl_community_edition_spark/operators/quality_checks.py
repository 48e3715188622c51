"""Dataset profiling + expectation checks (Deequ-lite): the
validation gate a training-data pipeline runs before trusting a new
drop of data.

profile() computes per-column stats in ONE pass (a single wide
aggregation — no per-column scans); expectations evaluate against the
profile on the driver, so a 100 TB check costs one aggregation job.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format per-column profile: nulls, distinct count, min/max
    (stringified so mixed column types share one schema)."""
    total = F.count(F.lit(1))
    aggs = [total.alias("__n")]
    for c in cols:
        aggs += [
            (total - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    rows = None
    for c in cols:
        row = wide.select(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_s"),
            F.col(f"{c}__max").alias("max_s"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


@dataclass
class Expectation:
    col: str
    max_null_ratio: float = 0.0
    min_distinct: int = 1
    unique: bool = False


def check_expectations(df: DataFrame, expectations: list[Expectation]) -> list[str]:
    """Evaluate expectations against one profiling pass; returns the
    list of violation messages (empty = clean)."""
    prof = {r["col_name"]: r for r in profile(df, [e.col for e in expectations]).collect()}
    violations: list[str] = []
    for e in expectations:
        p = prof[e.col]
        null_ratio = p["n_nulls"] / p["n_rows"] if p["n_rows"] else 0.0
        if null_ratio > e.max_null_ratio:
            violations.append(f"{e.col}: null ratio {null_ratio:.4f} > {e.max_null_ratio}")
        if p["n_distinct"] < e.min_distinct:
            violations.append(f"{e.col}: {p['n_distinct']} distinct < {e.min_distinct}")
        if e.unique and p["n_distinct"] + p["n_nulls"] < p["n_rows"]:
            violations.append(f"{e.col}: not unique ({p['n_distinct']} distinct of {p['n_rows']})")
    return violations

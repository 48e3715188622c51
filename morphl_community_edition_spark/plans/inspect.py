"""Helpers over ``df._jdf...executedPlan`` / explain output."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Union of columns actually read by parquet scans (column pruning
    check: should be ⊆ what the query needs, not the full table)."""
    plan = formatted_plan(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", plan):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_partial_aggregate(df: DataFrame) -> bool:
    """Two-phase aggregation: a partial_ function marker (map-side
    combine) must appear before the final HashAggregate."""
    return "partial_" in formatted_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of distinct Exchange (shuffle) nodes in the plan —
    formatted output lists every operator twice (tree + detail), so
    count unique node ids."""
    plan = formatted_plan(df)
    return len(set(re.findall(r"\((\d+)\) Exchange", plan)))


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees — wider/fewer is better."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))))

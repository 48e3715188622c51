"""Plan inspection (SURVEY.md §5.1-5.2): the engine introduces no
custom IR — Catalyst's plans ARE the IR — so its scale guarantees are
plan-shape properties. This module turns them into assertions:
filters reach the parquet scan, projections prune the read schema,
dim joins broadcast, aggregates run partial+final inside whole-stage
codegen.
"""

from morphl_community_edition_spark.plans.inspect import (
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    has_partial_aggregate,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_spans,
)

__all__ = [
    "count_exchanges",
    "formatted_plan",
    "has_broadcast_join",
    "has_partial_aggregate",
    "pushed_filters",
    "read_schema_columns",
    "wholestage_codegen_spans",
]

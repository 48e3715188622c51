"""Engine facade: the user-facing entry point.

Mirrors the reference's three entry points (SURVEY.md §4.2) in
idiomatic Spark:

- ``engine.table("lineitem")`` → DataFrame DSL → Catalyst
- ``engine.sql("SELECT ...")``  → Spark's ANTLR SQL front end (we do
  not write a parser; Spark SQL *is* the query language)
- ``engine.stream("events")``   → Structured Streaming micro-batches

No custom IR: Catalyst's LogicalPlan is the IR (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from morphl_community_edition_spark import catalog
from morphl_community_edition_spark.session import get_spark


class Engine:
    def __init__(self, spark: SparkSession | None = None, sf_dir: str | None = None):
        self.spark = spark or get_spark()
        self.sf_dir = sf_dir or catalog.DEFAULT_SF_DIR
        self._views_registered = False

    def table(self, name: str) -> DataFrame:
        return catalog.load_table(self.spark, self.sf_dir, name)

    def sql(self, query: str) -> DataFrame:
        if not self._views_registered:
            catalog.register_views(self.spark, self.sf_dir)
            self._views_registered = True
        return self.spark.sql(query)

    def stream(self, name: str, max_files_per_trigger: int = 1) -> DataFrame:
        """Streaming read of a fixture table (file micro-batch source)."""
        from morphl_community_edition_spark.sources.stream import read_table_stream

        return read_table_stream(self.spark, self.sf_dir, name, max_files_per_trigger)

    def run(self, query_name: str) -> DataFrame:
        """Run a registered contract query by name (see
        morphl_community_edition_spark.queries.QUERIES for the list)."""
        from morphl_community_edition_spark.queries import QUERIES

        if query_name not in QUERIES:
            raise KeyError(f"unknown query {query_name!r}; registered: {sorted(QUERIES)[:8]}...")
        return QUERIES[query_name](self.spark, self.sf_dir)

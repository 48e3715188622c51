"""morphl_community_edition_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of Morphl-AI/MorphL-Community-Edition
(an ML user-behavior prediction platform: Cassandra + PySpark +
Airflow; see SURVEY.md §1), extended with the LLM-training-data
pipeline operators (dedup, similarity search, multimodal columns,
text analysis) and designed for 100 TB scale.

Design stance (SURVEY.md §1, §4): the reference delegates all query
planning/execution to Spark already, so this engine is a thin,
idiomatic layer over Spark SQL / Catalyst — a curated operator
library plus a declared-query registry, never a custom executor.

Layout:
    session.py    SparkSession factory (AQE, Arrow, UTC, ns-parquet fix)
    catalog.py    fixture-table catalog (schemas, events ts repair)
    queries/      the declared query contract (SURVEY.md §3) as
                  DataFrame-API functions + DuckDB oracle SQL
    operators/    reusable composite operators (as-of join, range join,
                  sessionize, dedup family, similarity search, text stats)
    functions/    column-expression helpers (vector math, json, hashing)
    sources/      batch + streaming readers/writers
    streaming/    Structured Streaming surface (windows, state, sinks)
    ml/           MLlib pipeline surface (churn model, clustering)
    plans/        plan-inspection helpers (pushdown/broadcast assertions)
"""

from morphl_community_edition_spark.session import get_spark
from morphl_community_edition_spark.catalog import TABLES, load_table, register_views
from morphl_community_edition_spark.engine import Engine

__all__ = ["get_spark", "TABLES", "load_table", "register_views", "Engine"]
__version__ = "0.1.0"

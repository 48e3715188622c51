"""A2 JSON ingestion, oracle-checked end-to-end (SURVEY.md §3 A2,
§4.1 step 1).

The reference's entry point is GA Reporting API JSON landed raw and
parsed by PySpark (SURVEY.md §1, [PUBLIC]). This module closes the A2
contract gap: it materializes an events-as-JSONL staging directory
from the parquet fixture, ingests it with
``spark.read.schema(...).json`` (schema DECLARED, never inferred — a
100 TB inference scan is both slow and a correctness hazard), and
aggregates it.

Oracle design: the DuckDB twin computes the same aggregate straight
from the ``events`` parquet view — it does NOT read the staged files.
A hash match therefore proves the whole Spark-side
serialize→land→parse→aggregate loop is lossless against the original
table, which is a *stronger* check than having both engines read the
staged files (that variant goes green even if the staging step
corrupts data, since both sides would read the same corruption) — and
it removes any dependence on staging-path state: no fixed /tmp path,
no cross-run race, no stale-file hazard. Staging goes to one
``mkdtemp`` directory per (process, sf_dir), overwritten in place on
repeat invocations so a bench loop doesn't accumulate table-sized
JSONL copies.

Determinism across the JSON boundary:

- ``ts`` is exported as ``ts_us`` (epoch microseconds, BIGINT) — a
  timestamp-as-ISO-string round trip would re-open the ns/µs and
  timezone-format can of worms the catalog already closed.
- ``value`` is exported as ``value_cents`` (exact scaled BIGINT per
  functions/rounding.py) — JSON double shortest-repr parsing is not
  canonical cross-engine; integers are.

Scale note: staging is a fixture-side test helper — production
ingestion reads JSON landed by the upstream connector directly, with
the same declared schema, and never coalesces.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from morphl_community_edition_spark.catalog import load_table
from morphl_community_edition_spark.functions.rounding import (
    sql_scaled_long,
    to_scaled_long,
)
from morphl_community_edition_spark.queries import query

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


# One staging dir per (process, sf_dir): isolates concurrent PROCESSES
# (mkdtemp) without accumulating a new table-sized JSONL copy on every
# invocation within a process — repeat calls overwrite in place. Keyed
# by sf_dir so a sweep across scale factors can't serve stale files.
_STAGE_DIRS: dict[str, str] = {}


def _memo_tmpdir(memo: dict[str, str], sf_dir: str, prefix: str) -> str:
    """One mkdtemp per (process, sf_dir), removed at process exit
    (ADVICE r5: un-reclaimed staging/sink dirs leaked a table-sized
    copy per process otherwise)."""
    d = memo.get(sf_dir)
    if d is None:
        d = tempfile.mkdtemp(prefix=prefix)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        memo[sf_dir] = d
    return d


def _stage_dir_for(sf_dir: str) -> str:
    return _memo_tmpdir(_STAGE_DIRS, sf_dir, "morphl_a2_json_stage_")


def stage_events_jsonl(spark: SparkSession, sf_dir: str, out_dir: str | None = None) -> str:
    """Export the events fixture as JSONL (one object per line) into
    this process's private staging dir for ``sf_dir`` (or ``out_dir``
    if given), overwriting any previous staging. Written with normal
    write parallelism (no coalesce); readers glob ``part-*.json``."""
    if out_dir is None:
        out_dir = _stage_dir_for(sf_dir)
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


def read_events_jsonl(spark: SparkSession, in_dir: str) -> DataFrame:
    """A2: ingest landed JSONL with the declared schema."""
    return spark.read.schema(EVENTS_JSONL_SCHEMA).json(os.path.join(in_dir, "part-*.json"))


@query(
    "q91_json_ingest",
    oracle=f"""
    SELECT event_type,
           count(*) AS cnt,
           CAST(count(DISTINCT user_id) AS BIGINT) AS users,
           CAST(sum({sql_scaled_long("value", 2)}) AS DOUBLE) / 1e2 AS sum_value,
           CAST(min(epoch_us(ts)) AS BIGINT) AS min_ts_us,
           CAST(max(epoch_us(ts)) AS BIGINT) AS max_ts_us,
           CAST(sum(CAST(props LIKE '%"k"%' AS INTEGER)) AS BIGINT) AS with_k
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def q91_json_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 end-to-end: parquet → JSONL staging (per-process private
    dir) → spark.read.json with declared schema → aggregate. The
    DuckDB twin aggregates the original parquet directly, so a hash
    match proves the serialize→parse round trip lost nothing."""
    stage_dir = stage_events_jsonl(spark, sf_dir)
    ev = read_events_jsonl(spark, stage_dir)
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


# ---- A5/F3: partitioned parquet sink, oracle-checked end-to-end ----

_SINK_DIRS: dict[str, str] = {}


def _sink_dir_for(sf_dir: str) -> str:
    return _memo_tmpdir(_SINK_DIRS, sf_dir, "morphl_a5_parquet_sink_")


@query(
    "q115_partitioned_sink_roundtrip",
    oracle="""
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM documents
    WHERE source IN ('src1', 'src2', 'src3')
    GROUP BY source
    ORDER BY source
    """,
)
def q115_partitioned_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/F3 end-to-end, same oracle design as q91: write ``documents``
    as a source-partitioned parquet table (``sortWithinPartitions``
    on doc_id — F3's stats-friendly layout), then DYNAMICALLY
    overwrite one partition with its own rows (the daily-rerun shape:
    must replace only that partition, never truncate the table), read
    the table back with a partition-column filter, and aggregate. The
    DuckDB twin aggregates the ORIGINAL fixture — a hash match proves
    the write→overwrite→prune→read loop lossless, which a both-sides-
    read-the-sink variant could not (shared corruption goes green).
    The read-back filter prunes to 3 of the source= directories at
    scan planning, so the check also covers partition pruning on the
    engine's own layout."""
    from morphl_community_edition_spark.sources.batch import write_parquet_partitioned

    docs = load_table(spark, sf_dir, "documents")
    out = _sink_dir_for(sf_dir)
    write_parquet_partitioned(
        docs, out, partition_by=["source"], sort_within=["doc_id"]
    )
    # dynamic overwrite of ONE partition with identical content: the
    # result must be unchanged — and the other partitions must survive
    write_parquet_partitioned(
        docs.filter(F.col("source") == "src2"), out, partition_by=["source"]
    )
    back = spark.read.parquet(out)
    return (
        back.filter(F.col("source").isin("src1", "src2", "src3"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
        .orderBy("source")
    )


# ---- A2 widening: XML ingestion (Spark 4 built-in XML source) ----

DOCS_XML_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_XML_STAGE_DIRS: dict[str, str] = {}


def stage_documents_xml(spark: SparkSession, sf_dir: str) -> str:
    """Export the documents fixture as XML (rowTag <doc>) into this
    process's private staging dir, overwriting on repeat calls —
    q91's staging device applied to the XML source."""
    out_dir = _memo_tmpdir(_XML_STAGE_DIRS, sf_dir, "morphl_a2_xml_stage_")
    docs = load_table(spark, sf_dir, "documents")
    (
        docs.select("doc_id", "text", "lang", "source", F.col("n_chars").cast("long"))
        .write.mode("overwrite")
        .option("rootTag", "docs")
        .option("rowTag", "doc")
        .format("xml")
        .save(out_dir)
    )
    return out_dir


@query(
    "q125_xml_ingest",
    oracle="""
    SELECT source, lang, count(*) AS cnt,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM documents
    GROUP BY source, lang ORDER BY source, lang
    """,
)
def q125_xml_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 XML ingestion e2e (round 6; Spark 4's built-in XML source):
    serialize the documents fixture to XML, re-ingest it with a
    DECLARED schema (rowTag parse, no inference scan), and aggregate.
    The oracle reads the ORIGINAL parquet — q91's design — so a hash
    match proves the whole serialize→land→parse→aggregate loop is
    lossless, including text content (sum_text_len would catch any
    entity-escaping or whitespace-trim corruption the XML boundary
    might introduce)."""
    staged = stage_documents_xml(spark, sf_dir)
    docs = (
        spark.read.schema(DOCS_XML_SCHEMA)
        .option("rowTag", "doc")
        .format("xml")
        .load(staged)
    )
    return (
        docs.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.sum(F.length("text")).cast("bigint").alias("sum_text_len"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
        .orderBy("source", "lang")
    )

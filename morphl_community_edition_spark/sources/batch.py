"""Batch sources/sinks (A1-A5).

The reference lands GA API JSON into Cassandra and writes predictions
back daily [PUBLIC, SURVEY.md §1]. Our equivalents: schema-declared
CSV/JSON/Parquet readers (never inferSchema — a 100 TB inference pass
is a bug) and a partitioned, overwrite-by-partition parquet sink
(the idempotent daily-upsert pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType, header: bool = True) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.parquet(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC source (A2 breadth): Spark's other vectorized columnar
    format — same pushdown/pruning behavior as parquet. Schema is
    optional because ORC carries its own; pass one to pin it."""
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw media ingestion (K5 entry point): Spark's `binaryFile`
    source yields (path, modificationTime, length, content BINARY) —
    the natural landing format for image/audio/video corpora before
    attach_media-style pointer structs take over.

    Scale notes (100 TB of media):
    - files larger than spark.sql.files.maxPartitionBytes are NOT
      split (a binary payload can't be chopped) — one task per large
      file; set maxPartitionBytes high enough that small files still
      pack several-per-task (the source coalesces by size).
    - millions of tiny files make the DRIVER's file listing the
      bottleneck — land media in packed archive rows (this module's
      parquet path) or bump spark.sql.sources.parallelPartitionDiscovery
      thresholds so listing fans out to executors.
    - pushdown: only `length` and `path` filters prune before read
      (e.g. filter(length < 10MB) skips oversized payloads without
      fetching bytes)."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_cassandra(spark: SparkSession, keyspace: str, table: str) -> DataFrame:
    """A4 parity shim: the reference's store is Cassandra (wide rows
    keyed by client_id [PUBLIC, SURVEY.md §1]); this engine's canonical
    store is partitioned parquet. If a deployment really needs the
    Cassandra path, the spark-cassandra-connector package provides it —
    not bundled here, so this raises with the exact recipe instead of
    failing obscurely."""
    try:
        return (
            spark.read.format("org.apache.spark.sql.cassandra")
            .options(keyspace=keyspace, table=table)
            .load()
        )
    except Exception as exc:  # connector jar absent in this environment
        raise NotImplementedError(
            "Cassandra source requires --packages com.datastax.spark:"
            "spark-cassandra-connector_2.13 and spark.cassandra.connection.host; "
            "the engine's native store is partitioned parquet (see write_parquet_partitioned)"
        ) from exc


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    dynamic: bool = True,
    sort_within: list[str] | None = None,
) -> None:
    """Partitioned parquet sink. With dynamic partition overwrite only
    the partitions present in ``df`` are replaced — the scalable form
    of the reference's daily prediction upsert (L6): re-running a day
    replaces that day, never truncates the table.

    ``sort_within`` (F3) sorts rows inside each task before writing —
    no extra shuffle, but parquet min/max row-group stats become
    selective on those columns, so later range filters skip row groups
    at scan time (the cheap half of a Z-order)."""
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    writer = df.write.mode(mode)
    if dynamic:
        # per-WRITE option, not a session conf flip: setting the
        # session-wide partitionOverwriteMode here would silently
        # change overwrite semantics for every OTHER writer in the
        # session for the rest of its lifetime
        writer = writer.option("partitionOverwriteMode", "dynamic")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_text_lines(spark: SparkSession, path: str, wholetext: bool = False) -> DataFrame:
    """Raw text corpus ingestion (A2 breadth): one row per line
    (`value` string), or one row per FILE with wholetext=True — the
    landing shape for line-delimited corpora before schema-on-read
    parsing. Same pushdown story as binaryFile: only pathGlobFilter /
    modifiedAfter prune before read; real filtering happens after
    parse, so land into parquet early."""
    return spark.read.text(path, wholetext=wholetext)

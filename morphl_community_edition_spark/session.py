"""SparkSession factory with the engine's standard configuration.

Every knob here is load-bearing:

- ``spark.sql.adaptive.enabled``: AQE re-plans at runtime (shuffle
  coalescing, skew-join splitting, dynamic join strategy). At 100 TB
  this is what turns a static 32-partition plan into a right-sized one.
- ``spark.sql.execution.arrow.pyspark.enabled``: Arrow batch transfer
  for pandas UDFs / toPandas — the only acceptable Python exchange path.
- ``spark.sql.session.timeZone=UTC``: fixture timestamps are naive
  (parquet isAdjustedToUTC=false); pinning UTC makes year()/datediff()
  and toPandas() deterministic and identical to DuckDB's naive reads.
- ``spark.sql.legacy.parquet.nanosAsLong``: events.parquet has
  shipped with INT64 TIMESTAMP(NANOS), which pyspark 4.x refuses to
  read by default (PARQUET_TYPE_ILLEGAL). With this flag a ns file's
  column arrives as a long and catalog.load_table() rebuilds a proper
  microsecond timestamp; for µs/ms fixture generations the flag is
  inert and the catalog reads TimestampType natively (footer-sniffed
  per file — see catalog.py).
- ``spark.sql.shuffle.partitions``: sized for the local test harness
  (32 cores); on a real cluster this is set per-job to ~2-3× total
  cores, and AQE coalesces down after each shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

APP_NAME = "morphl-community-edition-spark"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)


def get_spark(app_name: str = APP_NAME, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Idempotent: if a session already exists it is reused and the
    runtime-settable confs are (re)applied, so the engine works even
    when a harness hands us a session it created itself.
    """
    cpus = default_parallelism()
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # CBO + join reordering pick up table/column stats when the
        # deployment runs ANALYZE TABLE on its managed tables
        # (SURVEY.md §5.1); no-ops without stats, so always-on is safe.
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # Fixture files are single ~5-20MB parquets; the 128MB default
        # split puts a whole table in ONE scan task and serializes the
        # partial aggregation. 2MB splits fan the scan out across the
        # local cores. On a real cluster with TB-scale inputs leave
        # this at the default — there the files outnumber the cores.
        .config("spark.sql.files.maxPartitionBytes", os.environ.get("SPARK_GRAFT_SPLIT", "2m"))
        .config("spark.sql.files.openCostInBytes", "524288")
        # static conf: managed-table location for the bucketing path
        # (bucketBy requires saveAsTable); keep it out of the repo tree
        .config("spark.sql.warehouse.dir", os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/morphl_spark_warehouse"))
        # static conf: reclaim superseded reliable loop checkpoints
        # (loop_checkpoint(reliable=True) writes one durable dir per
        # iteration; without this ContextCleaner never deletes them
        # and long k-loops leak checkpoint storage — round-9 advice)
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    spark = builder.getOrCreate()
    apply_runtime_conf(spark)
    return spark


def apply_runtime_conf(spark: SparkSession) -> None:
    """(Re)apply the confs that are safe to set on a live session.

    Called defensively from catalog.load_table too, because the driver
    harness may construct its own SparkSession without our builder —
    most critically the nanosAsLong flag, without which a
    ns-generation events.parquet is unreadable.
    """
    for key, value in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        # pin to the value the whole oracle contract was validated
        # under (Spark 4 default) — a harness session that flips it
        # would change cast/overflow semantics mid-contract
        ("spark.sql.ansi.enabled", "true"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - read-only conf on some builds
            pass

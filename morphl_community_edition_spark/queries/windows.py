"""Window functions + sessionization: Q15, Q16, Q21, Q22.

Covers SURVEY.md §3 group E (E1-E5) and L4 (the reference's
sessionization — the 30-minute-gap session assignment its GA
preprocessing implies).

Scale notes: every window here partitions by a high-cardinality key
(o_custkey / user_id), so the single shuffle distributes evenly; no
global-order window is ever used on an unbounded frame (a
PARTITION-BY-nothing window would serialize onto one task at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from morphl_community_edition_spark.catalog import load_table
from morphl_community_edition_spark.functions.rounding import crnd, sql_crnd, to_scaled_long
from morphl_community_edition_spark.operators.sessionize import sessionize
from morphl_community_edition_spark.queries import query

# All oracle queries over `events` cast ts to µs first — DuckDB reads
# the column as TIMESTAMP_NS while Spark (post-repair) holds µs; the
# CAST makes gap/frame arithmetic identical on both engines.
EVENTS_US = "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"


@query(
    "q15_rank_running_sum",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk,
           {sql_crnd('''CAST(sum(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e2''', 2)} AS run
    FROM orders
    ORDER BY o_custkey, o_orderkey
    LIMIT 1000
    """,
)
def q15_rank_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w_rank = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.rank().over(w_rank).alias("rk"),
            crnd(F.sum(to_scaled_long(F.col("o_totalprice"))).over(w_run).cast("double") / F.lit(1e2), 2).alias("run"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(1000)
    )


@query(
    "q16_sessionize",
    oracle=f"""
    WITH e AS (SELECT * FROM {EVENTS_US}),
    g AS (SELECT user_id, ts, event_id,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT user_id, ts,
            CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS sess
          FROM g)
    SELECT user_id, sess, count(*) AS n,
           date_trunc('millisecond', min(ts)) AS s_start,
           date_trunc('millisecond', max(ts)) AS s_end
    FROM s GROUP BY user_id, sess
    ORDER BY user_id, sess
    LIMIT 2000
    """,
)
def q16_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization; the >= break matches streaming
    session_window's half-open [start, last+gap) semantics exactly."""
    ev = load_table(spark, sf_dir, "events")
    sessions = sessionize(ev, user_col="user_id", ts_col="ts", gap_minutes=30, order_tiebreak="event_id")
    return (
        sessions.groupBy("user_id", "sess")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.date_trunc("millisecond", F.min("ts")).alias("s_start"),
            F.date_trunc("millisecond", F.max("ts")).alias("s_end"),
        )
        .orderBy("user_id", "sess")
        .limit(2000)
    )


@query(
    "q21_range_frame",
    oracle=f"""
    SELECT event_id, user_id,
           {sql_crnd('''CAST(sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT)) OVER w AS DOUBLE) / 1e2
                 / CAST(count(*) OVER w AS DOUBLE)''', 6)} AS avg_1h
    FROM {EVENTS_US} e
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    LIMIT 1000
    """,
)
def q21_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over the last hour, keyed on epoch-microseconds.

    The ordering key is integer µs on both engines (Spark unix_micros,
    DuckDB epoch_us) so the frame boundary is exact integer math — a
    float seconds key would risk boundary flips at round-off.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    avg_1h = crnd(
        F.sum(to_scaled_long(F.col("value"))).over(w).cast("double")
        / F.lit(1e2)
        / F.count(F.lit(1)).over(w).cast("double"),
        6,
    )
    return (
        ev.select("event_id", "user_id", avg_1h.alias("avg_1h"))
        .orderBy("event_id")
        .limit(1000)
    )


@query(
    "q22_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      FROM orders) t
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    LIMIT 1000
    """,
)
def q22_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
        .limit(1000)
    )

"""Window-function breadth (E1/E2 completion): dense_rank, ntile,
lead, first/last-in-frame — q43; map-typed JSON access (H5) — q44.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from morphl_community_edition_spark.catalog import load_table
from morphl_community_edition_spark.functions.rounding import crnd, sql_crnd
from morphl_community_edition_spark.queries import query
from morphl_community_edition_spark.queries.windows import EVENTS_US


@query(
    "q43_window_gauntlet",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(dense_rank() OVER w_price AS INTEGER)      AS drk,
           CAST(ntile(4) OVER w_price AS INTEGER)          AS quartile,
           lead(o_orderkey) OVER w_time                    AS next_order,
           lag(o_orderkey)  OVER w_time                    AS prev_order,
           first_value(o_orderkey) OVER w_time             AS first_order,
           last_value(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
    FROM orders
    WINDOW w_price AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
           w_time  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    LIMIT 1000
    """,
)
def q43_window_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w_price = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    w_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w_time.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.dense_rank().over(w_price).alias("drk"),
            F.ntile(4).over(w_price).alias("quartile"),
            F.lead("o_orderkey").over(w_time).alias("next_order"),
            F.lag("o_orderkey").over(w_time).alias("prev_order"),
            F.first("o_orderkey").over(w_time).alias("first_order"),
            F.last("o_orderkey").over(w_full).alias("last_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(1000)
    )


@query(
    "q44_map_functions",
    oracle=f"""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS prop_keys,
           CAST(json_extract(props, '$.k') AS INT) AS k_val,
           CAST(len(json_keys(props)) AS INTEGER)  AS n_keys
    FROM {EVENTS_US} e
    ORDER BY event_id
    LIMIT 1000
    """,
)
def q44_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5/A3: from_json into a typed MapType + map_keys/element_at/size
    (the schema-on-read path for the reference's raw GA JSON blobs)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), T.MapType(T.StringType(), T.IntegerType()))
    return (
        ev.select(
            "event_id",
            F.array_join(F.map_keys(m), ",").alias("prop_keys"),
            # try_element_at: under the session's pinned ANSI mode a plain
            # element_at THROWS on a props object missing 'k', where the
            # oracle's json_extract yields NULL (round-9 review; the
            # round-7 memory rule)
            F.try_element_at(m, F.lit("k")).alias("k_val"),
            F.size(F.map_keys(m)).alias("n_keys"),
        )
        .orderBy("event_id")
        .limit(1000)
    )


@query(
    "q74_rank_distributions",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           CAST(ntile(4) OVER w AS INTEGER) AS price_quartile,
           floor((percent_rank() OVER w) * 1e6 + 0.5) / 1e6 AS pr,
           floor((cume_dist() OVER w) * 1e6 + 0.5) / 1e6 AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderpriority, o_orderkey
    LIMIT 1000
    """,
)
def q74_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 completion: ntile / percent_rank / cume_dist. The window
    orders by (o_totalprice, o_orderkey) — the unique key suffix makes
    ntile's row numbering (and thus every output) deterministic; both
    engines compute percent_rank as (rank-1)/(n-1) and cume_dist as
    rank_from_end/n, so after canonical round-6 they hash-match."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).cast("int").alias("price_quartile"),
            crnd(F.percent_rank().over(w), 6).alias("pr"),
            crnd(F.cume_dist().over(w), 6).alias("cd"),
        )
        .orderBy("o_orderpriority", "o_orderkey")
        .limit(1000)
    )

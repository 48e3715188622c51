"""Subquery family (SURVEY.md §5.1 "subquery decorrelation"): scalar,
correlated-scalar, NOT IN, and the classic conditional-aggregation /
multi-nation join shapes built on them — q48-q52.

The DataFrame forms ARE the decorrelated plans (broadcast 1-row or
per-group aggregates + joins); the oracle SQL uses real subqueries, so
the pair also checks that Spark's own decorrelation (when the SQL
front end is used instead) and our hand-decorrelated plans agree with
DuckDB's.

Scalar thresholds compare against EXACT integer averages
(functions/rounding.py) — a raw avg(double) threshold could flip a
boundary row between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from morphl_community_edition_spark.catalog import load_table
from morphl_community_edition_spark.functions.rounding import crnd, davg, sql_crnd, sql_davg
from morphl_community_edition_spark.queries import query
from morphl_community_edition_spark.queries.relational import SQL_DISC_PRICE_SUM, disc_price_scaled


def _exact_avg(col: str):
    return davg(F.col(col))


@query(
    "q48_scalar_subquery",
    oracle=f"""
    SELECT count(*) AS cnt, min(o_orderkey) AS first_key
    FROM orders
    WHERE o_totalprice > (SELECT {sql_davg("o_totalprice")} FROM orders)
    """,
)
def q48_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery → broadcast 1-row aggregate +
    cross join (what Catalyst's RewriteCorrelatedScalarSubquery
    produces for the SQL form)."""
    orders = load_table(spark, sf_dir, "orders")
    threshold = orders.agg(_exact_avg("o_totalprice").alias("avg_price"))
    return (
        orders.crossJoin(F.broadcast(threshold))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("o_orderkey").alias("first_key"))
    )


@query(
    "q49_correlated_scalar",
    oracle=f"""
    SELECT c_custkey, c_nationkey FROM customer c
    WHERE c_acctbal > (SELECT {sql_davg("c2.c_acctbal")}
                       FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
    ORDER BY c_custkey
    LIMIT 500
    """,
)
def q49_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery → decorrelate: per-nation aggregate,
    broadcast, equi-join back. One shuffle-free pass at any scale
    (the aggregate side is |nations| rows)."""
    cust = load_table(spark, sf_dir, "customer")
    per_nation = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        _exact_avg("c_acctbal").alias("nation_avg")
    )
    return (
        cust.join(F.broadcast(per_nation), F.col("c_nationkey") == F.col("nk"))
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_nationkey")
        .orderBy("c_custkey")
        .limit(500)
    )


@query(
    "q50_not_in_subquery",
    oracle="""
    SELECT p_partkey FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
    ORDER BY p_partkey
    LIMIT 200
    """,
)
def q50_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a null-free key column ≡ anti join (with nullable
    columns NOT IN needs the null-aware form — fixtures are null-free,
    FIXTURES.md §2)."""
    part = load_table(spark, sf_dir, "part")
    heavy = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45).select("l_partkey")
    return (
        part.join(heavy, F.col("p_partkey") == F.col("l_partkey"), "left_anti")
        .select("p_partkey")
        .orderBy("p_partkey")
        .limit(200)
    )


@query(
    "q51_conditional_shipmode",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q51_conditional_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q52_nation_volume",
    oracle=f"""
    SELECT sn, cn, yr, {sql_crnd(SQL_DISC_PRICE_SUM, 2)} AS rev FROM (
      SELECT ns.n_name AS sn, nc.n_name AS cn,
             CAST(year(l_shipdate) AS INTEGER) AS yr,
             l_extendedprice, l_discount
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ns ON ns.n_nationkey = s_nationkey
      JOIN nation nc ON nc.n_nationkey = c_nationkey
      WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
          OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))) t
    GROUP BY sn, cn, yr
    ORDER BY sn, cn, yr
    """,
)
def q52_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two-nation shipping volume by year — the same
    nation dim joined twice under different roles. Only the TWO-ROW
    nation sides carry broadcast hints; the round-9 review removed the
    ungated fact-side broadcasts (orders x customer and supplier all
    grow with SF — the exact round-1-q03 hazard hints.py documents)
    and pushed the pair predicate down as nation pre-filters (Catalyst
    cannot infer them through the OR-of-ANDs, so without this every
    nation's lineitem rows flow through four joins before ~all are
    discarded — TPC-H Q7's standard plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    ns = nation.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("sn"))
    nc = nation.select(F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cn"))
    pair = ((F.col("sn") == "NATION_1") & (F.col("cn") == "NATION_2")) | (
        (F.col("sn") == "NATION_2") & (F.col("cn") == "NATION_1")
    )
    return (
        li.join(orders.join(cust, F.col("c_custkey") == F.col("o_custkey")),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(pair)
        .withColumn("yr", F.year("l_shipdate"))
        .groupBy("sn", "cn", "yr")
        .agg(crnd(F.sum(disc_price_scaled()).cast("double") / F.lit(1e4), 2).alias("rev"))
        .orderBy("sn", "cn", "yr")
    )

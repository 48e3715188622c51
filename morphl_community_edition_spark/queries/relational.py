"""Relational core: scans, predicates, joins, aggregation, set ops.

Covers SURVEY.md §3 groups A (A1), B (B1-B5), C (C1-C5), D (D1-D3,
D5), F, G and K1 — queries Q01-Q11, Q23, Q24.

All money aggregates use exact integer accumulation + canonical
rounding (functions/rounding.py) so results are bit-identical to the
DuckDB oracle regardless of either engine's summation order.

Scale notes (100 TB):
- Dimension sides (region/nation/supplier/customer) are explicitly
  ``broadcast()`` — at TPC-H ratios they stay KB-MB while facts grow,
  so the star joins never shuffle the fact table on the dim key.
- Fact-fact joins (Q09) are left to Catalyst: sort-merge with AQE skew
  splitting is the right call at scale and local[32] alike.
- Aggregations use built-in functions only → partial (map-side)
  aggregation + whole-stage codegen for free; the scaled-long columns
  are plain bigint arithmetic inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from morphl_community_edition_spark.catalog import load_table
from morphl_community_edition_spark.functions.rounding import (
    crnd,
    dsum,
    sql_crnd,
    sql_davg,
    sql_dsum,
    to_scaled_long,
    xcrnd,
    xdavg,
    xdsum,
)
from morphl_community_edition_spark.queries import query


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# exact integer forms of the TPC-H money expressions:
#   cents(ext) · (100 − bp(disc))            → scale 1e4
#   cents(ext) · (100 − bp(disc)) · (100 + bp(tax)) → scale 1e6
_EXT_C = "CAST(floor((l_extendedprice) * 1e2 + 0.5) AS BIGINT)"
_DISC_B = "CAST(floor((l_discount) * 1e2 + 0.5) AS BIGINT)"
_TAX_B = "CAST(floor((l_tax) * 1e2 + 0.5) AS BIGINT)"
SQL_DISC_PRICE_SUM = f"CAST(sum({_EXT_C} * (100 - {_DISC_B})) AS DOUBLE) / 1e4"
SQL_CHARGE_SUM = f"CAST(sum({_EXT_C} * (100 - {_DISC_B}) * (100 + {_TAX_B})) AS DOUBLE) / 1e6"


def disc_price_scaled() -> F.Column:
    """lineitem revenue in exact 1e-4 units (bigint). Column-tree twin
    of SQL_DISC_PRICE_SUM's per-row term, for call sites that compose
    it inside conditionals (q63's CASE, q66's promo share)."""
    return to_scaled_long(F.col("l_extendedprice")) * (
        F.lit(100) - to_scaled_long(F.col("l_discount"))
    )


# One SQL body, two engines: the canonical-rounding expression text is
# dialect-portable, so the DuckDB oracle and the Spark build share it
# verbatim (only the table name differs). Handing Spark the whole
# statement in ONE spark.sql call replaces a ~30-operator DataFrame
# composition — one Py4J round trip + one analysis pass instead of one
# per operator; measured build 65 ms → 21 ms and ~150 ms off the
# honest-warm rebuild at sf0.1 (round-4 advice: the re-plan floor).
_Q01_BODY = f"""
    SELECT l_returnflag, l_linestatus,
           {sql_crnd(sql_dsum("l_quantity"), 2)}       AS sum_qty,
           {sql_crnd(sql_dsum("l_extendedprice"), 2)}  AS sum_base_price,
           {sql_crnd(SQL_DISC_PRICE_SUM, 2)}           AS sum_disc_price,
           {sql_crnd(SQL_CHARGE_SUM, 2)}               AS sum_charge,
           {sql_crnd(sql_davg("l_quantity"), 6)}       AS avg_qty,
           {sql_crnd(sql_davg("l_discount"), 6)}       AS avg_disc,
           count(*)                                    AS count_order
    FROM {{li}}
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""


@query("q01_pricing_summary", oracle=_Q01_BODY.format(li="lineitem"))
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from morphl_community_edition_spark.catalog import ensure_views

    sfx = ensure_views(spark, sf_dir)
    return spark.sql(_Q01_BODY.format(li=f"lineitem_{sfx}"))


@query(
    "q02_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_size BETWEEN 5 AND 20
      AND p_type NOT IN ('ECONOMY', 'PROMO')
      AND (p_name LIKE '%red%' OR p_brand = 'Brand#3')
    ORDER BY p_partkey
    """,
)
def q02_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_size").between(5, 20))
        .filter(~F.col("p_type").isin("ECONOMY", "PROMO"))
        .filter(F.col("p_name").like("%red%") | (F.col("p_brand") == "Brand#3"))
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


@query(
    "q03_star_topk",
    oracle=f"""
    SELECT l_orderkey,
           {sql_crnd(SQL_DISC_PRICE_SUM, 2)} AS rev,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY rev DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q03_star_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape, single-statement spark.sql build (see _Q01_BODY
    note). The orders⋈customer product entering the lineitem join is a
    filtered FACT-side table, so its BROADCAST hint is size-gated on
    orders' on-disk bytes (plans/hints.py rationale): hinted at
    fixture scale (where it demonstrably fits and beats the no-stats
    SMJ estimate), no hint past the gate so AQE's runtime stats pick —
    and can demote — the strategy at 100×. Customer stays hinted
    unconditionally: it is a true dimension."""
    from morphl_community_edition_spark.catalog import ensure_views, table_path
    from morphl_community_edition_spark.plans.hints import (
        DEFAULT_BROADCAST_FILE_LIMIT,
        dataset_file_bytes,
    )

    sfx = ensure_views(spark, sf_dir)
    gate = dataset_file_bytes(table_path(sf_dir, "orders")) <= DEFAULT_BROADCAST_FILE_LIMIT
    hint = "/*+ BROADCAST(b) */ " if gate else ""
    return spark.sql(f"""
        SELECT {hint}l_orderkey,
               {sql_crnd(SQL_DISC_PRICE_SUM, 2)} AS rev,
               o_orderdate
        FROM lineitem_{sfx}
        JOIN (SELECT /*+ BROADCAST(c) */ o_orderkey, o_orderdate
              FROM orders_{sfx} o
              JOIN customer_{sfx} c ON c_custkey = o_custkey
              WHERE c_mktsegment = 'BUILDING'
                AND o_orderdate < TIMESTAMP '1998-03-15') b
          ON l_orderkey = o_orderkey
        GROUP BY l_orderkey, o_orderdate
        ORDER BY rev DESC, o_orderdate, l_orderkey
        LIMIT 10""")


@query(
    "q04_case_when",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS big,
           {sql_crnd(sql_dsum("greatest(o_totalprice, 1000)"), 2)} AS sum_greatest,
           {sql_crnd(sql_dsum("least(o_totalprice, 1000)"), 2)}    AS sum_least
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q04_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("o_totalprice") > 100000, 1).otherwise(0)).alias("big"),
            crnd(dsum(F.greatest(F.col("o_totalprice"), F.lit(1000.0))), 2).alias("sum_greatest"),
            crnd(dsum(F.least(F.col("o_totalprice"), F.lit(1000.0))), 2).alias("sum_least"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q05_six_table_join",
    oracle=f"""
    SELECT n_name, {sql_crnd(SQL_DISC_PRICE_SUM, 2)} AS rev
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY rev DESC, n_name
    """,
)
def q05_six_table_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape, single-statement spark.sql build (see _Q01_BODY
    note). supplier⋈nation⋈region is a true dimension subtree —
    hinted unconditionally; the orders⋈customer product is fact-side
    and size-gated exactly as in q03 (previously it was broadcast
    unconditionally — the q03 round-1 scale caveat applied here too)."""
    from morphl_community_edition_spark.catalog import ensure_views, table_path
    from morphl_community_edition_spark.plans.hints import (
        DEFAULT_BROADCAST_FILE_LIMIT,
        dataset_file_bytes,
    )

    sfx = ensure_views(spark, sf_dir)
    gate = dataset_file_bytes(table_path(sf_dir, "orders")) <= DEFAULT_BROADCAST_FILE_LIMIT
    oc_hint = "BROADCAST(oc), " if gate else ""
    return spark.sql(f"""
        SELECT /*+ {oc_hint}BROADCAST(sn) */ n_name,
               {sql_crnd(SQL_DISC_PRICE_SUM, 2)} AS rev
        FROM lineitem_{sfx}
        JOIN (SELECT /*+ BROADCAST(c) */ o_orderkey
              FROM orders_{sfx} o
              JOIN customer_{sfx} c ON c_custkey = o_custkey) oc
          ON l_orderkey = o_orderkey
        JOIN (SELECT /*+ BROADCAST(n), BROADCAST(r) */ s_suppkey, n_name
              FROM supplier_{sfx} s
              JOIN nation_{sfx} n ON s_nationkey = n_nationkey
              JOIN region_{sfx} r ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA') sn
          ON l_suppkey = s_suppkey
        GROUP BY n_name
        ORDER BY rev DESC, n_name""")


_ROLLUP_ORACLE = f"""
    SELECT coalesce(l_returnflag, 'ALL') AS rflag,
           coalesce(l_linestatus, 'ALL') AS lstatus,
           CAST(grouping(l_returnflag) + grouping(l_linestatus) AS INTEGER) AS lvl,
           {sql_crnd(sql_dsum("l_extendedprice"), 2)} AS sum_price,
           count(*) AS cnt
    FROM lineitem
    GROUP BY {{grouping_op}}(l_returnflag, l_linestatus)
    ORDER BY rflag, lstatus, lvl
"""


def _grouping_sets(spark: SparkSession, sf_dir: str, op: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    grouped = li.rollup("l_returnflag", "l_linestatus") if op == "rollup" else li.cube("l_returnflag", "l_linestatus")
    return (
        grouped.agg(
            (F.grouping("l_returnflag") + F.grouping("l_linestatus")).cast("int").alias("lvl"),
            crnd(dsum(F.col("l_extendedprice")), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("rflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("lstatus"),
            "lvl",
            "sum_price",
            "cnt",
        )
        .orderBy("rflag", "lstatus", "lvl")
    )


@query("q06_rollup", oracle=_ROLLUP_ORACLE.format(grouping_op="ROLLUP"))
def q06_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _grouping_sets(spark, sf_dir, "rollup")


@query(
    "q60_grouping_sets",
    oracle=f"""
    SELECT coalesce(l_returnflag, 'ALL') AS rflag,
           coalesce(l_linestatus, 'ALL') AS lstatus,
           {sql_crnd(sql_dsum("l_extendedprice"), 2)} AS sum_price,
           count(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    ORDER BY rflag, lstatus
    """,
)
def q60_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (D5 beyond rollup/cube): one pass, two
    disjoint grouping shapes — Spark 4's DataFrame.groupingSets."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [[F.col("l_returnflag")], [F.col("l_linestatus")]],
            F.col("l_returnflag"),
            F.col("l_linestatus"),
        )
        .agg(
            crnd(dsum(F.col("l_extendedprice")), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("rflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("lstatus"),
            "sum_price",
            "cnt",
        )
        .orderBy("rflag", "lstatus")
    )


@query(
    "q61_regex_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE regexp_matches(p_name, '^(red|green|blue) ')
      AND NOT regexp_matches(p_type, 'PROMO|ECONOMY')
    ORDER BY p_partkey
    LIMIT 300
    """,
)
def q61_regex_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rlike predicate breadth (B2/H1): anchored alternation +
    negated match, pushed to the scan as much as Catalyst allows."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").rlike("^(red|green|blue) "))
        .filter(~F.col("p_type").rlike("PROMO|ECONOMY"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
        .limit(300)
    )


@query("q07_cube", oracle=_ROLLUP_ORACLE.format(grouping_op="CUBE"))
def q07_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _grouping_sets(spark, sf_dir, "cube")


@query(
    "q08_outer_join_nulls",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS cnt,
           CASE WHEN max(o_orderdate) IS NULL THEN 'never' ELSE 'active' END AS status
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey AND o_orderdate >= TIMESTAMP '2001-01-01'
    GROUP BY c_custkey
    ORDER BY cnt DESC, c_custkey
    LIMIT 200
    """,
)
def q08_outer_join_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_orderdate") >= _ts("2001-01-01")),
        "left",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("cnt"),
            F.when(F.max("o_orderdate").isNull(), "never").otherwise("active").alias("status"),
        )
        .orderBy(F.col("cnt").desc(), "c_custkey")
        .limit(200)
    )


@query(
    "q09_fact_fact_join",
    oracle=f"""
    SELECT o_orderstatus, count(*) AS cnt, {sql_crnd(sql_dsum("l_quantity"), 2)} AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q09_fact_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"), crnd(dsum(F.col("l_quantity")), 2).alias("sum_qty"))
        .orderBy("o_orderstatus")
    )


@query(
    "q10_semi_join",
    oracle="""
    SELECT count(*) AS cnt FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000)
    """,
)
def q10_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return cust.join(big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@query(
    "q11_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    ORDER BY c_custkey
    LIMIT 100
    """,
)
def q11_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        cust.join(big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .limit(100)
    )


@query(
    "q23_set_ops",
    oracle="""
    WITH cust_n AS (SELECT n_nationkey AS nk FROM customer JOIN nation ON c_nationkey = n_nationkey),
         supp_n AS (SELECT n_nationkey AS nk FROM supplier JOIN nation ON s_nationkey = n_nationkey),
         both_n AS (SELECT nk FROM cust_n INTERSECT SELECT nk FROM supp_n),
         only_c AS (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey AS nk FROM supplier)
    SELECT nk FROM both_n UNION ALL SELECT nk FROM only_c ORDER BY nk
    """,
)
def q23_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cust_n = cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")).select(
        F.col("n_nationkey").alias("nk")
    )
    supp_n = supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")).select(
        F.col("n_nationkey").alias("nk")
    )
    both_n = cust_n.intersect(supp_n)  # set INTERSECT (distinct)
    only_c = cust.select(F.col("c_nationkey").alias("nk")).subtract(
        supp.select(F.col("s_nationkey").alias("nk"))
    )  # set EXCEPT (distinct)
    return both_n.unionByName(only_c).orderBy("nk")


@query(
    "q24_exact_dedup",
    oracle="""
    SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS dups
    FROM documents
    GROUP BY md5(text)
    ORDER BY keeper
    LIMIT 500
    """,
)
def q24_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (K1): content-hash groupBy with deterministic keeper.

    Never ``dropDuplicates`` — its surviving row is partition-order
    dependent; ``min(doc_id)`` is a total, deterministic choice.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("dups"))
        .orderBy("keeper")
        .limit(500)
    )

"""Classic TPC-H query shapes beyond the ones already in the registry
(Q1/Q3/Q5 are the headline q01/q03/q05 in relational.py; the Q7/Q12
shapes are q52/q51 in subqueries.py). With this module's q62-q71 and
q78-q84, ALL 22 classic shapes have an adapted, oracle-checked form.

The fixtures are TPC-H-ish but reduced (TESTDATA.md; FIXTURES.md): no
partsupp table, and lineitem/orders/customer lack commitdate,
receiptdate, shipmode, phone, container, comment. Each adaptation
preserves the join/agg/subquery SHAPE and moves predicates to
existing columns (noted per query); the partsupp-dependent queries
(Q2/Q9/Q11/Q16/Q20) substitute lineitem/part columns for the missing
supply-cost/availqty ones — q81/q79/q82/q83/q84.

Determinism: every money aggregate uses exact scaled-integer
accumulation (functions/rounding.py), ratios divide the exact scaled
sums so both engines perform the identical two IEEE-double ops, and
every query ends in a total ORDER BY.

Scale notes (100 TB). Broadcast-hint policy: a hint is FORCED only
for sides that stay small at any SF — nation/region (fixed 25/5
rows), 1-row scalar aggregates (q67's max, q71's avg), and
HAVING-tail sets that are tiny by construction (q69). part /
supplier / customer / filtered-orders sides grow with SF (part is
SF·200k rows), so they carry NO hint: Catalyst auto-broadcasts them
below spark.sql.autoBroadcastJoinThreshold at test scale, and AQE
picks shuffle strategies when they outgrow it — a forced broadcast
there would be a guaranteed OOM at the 100 TB design point. The
Q17-shape per-part average is a map-side-combinable agg joined on
l_partkey (shuffle at scale, auto-broadcast locally) — never a
per-row correlated rescan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from morphl_community_edition_spark.catalog import load_table
from morphl_community_edition_spark.functions.rounding import (
    crnd,
    dsum,
    xcrnd,
    sql_crnd,
    sql_dsum,
    sql_scaled_long,
    to_scaled_long,
)
from morphl_community_edition_spark.queries import query
from morphl_community_edition_spark.queries.relational import (
    SQL_DISC_PRICE_SUM,
    disc_price_scaled,
)


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# revenue = extendedprice * discount, exact: cents * basis-points / 1e4
_SQL_DISC_REV_SUM = (
    "CAST(sum(CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)"
    " * CAST(floor(l_discount * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) / 1e4"
)


def _disc_rev_scaled() -> F.Column:
    return to_scaled_long(F.col("l_extendedprice")) * to_scaled_long(F.col("l_discount"))


@query(
    "q62_tpch_q6",
    oracle=f"""
    SELECT {sql_crnd(_SQL_DISC_REV_SUM, 2)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q62_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): pure scan + filter + single
    exact aggregate — the canonical predicate-pushdown probe; all four
    predicates reach the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(crnd(F.sum(_disc_rev_scaled()).cast("double") / F.lit(1e4), 2).alias("revenue"))
    )


@query(
    "q63_tpch_q8",
    oracle=f"""
    SELECT o_year,
           {sql_crnd("CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0 END) AS DOUBLE)"
                     " / CAST(sum(vol) AS DOUBLE)", 6)} AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {sql_scaled_long("l_extendedprice")} * (100 - {sql_scaled_long("l_discount")}) AS vol,
             n2.n_name AS supp_nation
      FROM part, supplier, lineitem, orders, customer,
           nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND s_nationkey = n2.n_nationkey
        AND r_name = 'ASIA' AND p_type = 'STANDARD'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q63_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): 8-way join with the nation dim
    joined twice under different roles; the market-share ratio divides
    the two exact scaled-long sums (scale cancels), so both engines do
    one identical double division."""
    t = {n: load_table(spark, sf_dir, n) for n in ("part", "supplier", "lineitem", "orders", "customer", "nation", "region")}
    asia_cust = (
        t["customer"]
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    orders = (
        t["orders"]
        .filter(F.col("o_orderdate").between(_ts("1996-01-01"), _ts("1997-12-31")))
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year("o_orderdate").cast("int").alias("o_year"))
    )
    supp_nation = t["supplier"].join(
        F.broadcast(t["nation"].select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "supp_nation")
    vol = F.sum(disc_price_scaled())
    nation_vol = F.sum(F.when(F.col("supp_nation") == "NATION_3", disc_price_scaled()).otherwise(F.lit(0)))
    return (
        t["lineitem"]
        .join(t["part"].filter(F.col("p_type") == "STANDARD").select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("o_year")
        .agg(crnd(nation_vol.cast("double") / vol.cast("double"), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "q64_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, {sql_crnd(SQL_DISC_PRICE_SUM, 2)} AS rev, c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY rev DESC, c_custkey
    LIMIT 20
    """,
)
def q64_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): quarter of orders, returned
    lines only, revenue per customer, top 20.

    Scale shape: lineitem⋈orders is fact-fact (a quarter of orders is
    still fact-scale at 100 TB) — left to Catalyst/AQE, never a forced
    broadcast. Revenue is aggregated down to per-customer BEFORE the
    customer join (c_custkey → name/acctbal/nation is a functional
    dependency, so joining after the agg is equivalent and moves only
    |customer|-bounded rows); only the nation dim gets a hint."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev_per_cust = (
        li.join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(xcrnd(SQL_DISC_PRICE_SUM, 2).alias("rev"))
    )
    return (
        rev_per_cust.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "rev", "c_acctbal", "n_name")
        .orderBy(F.col("rev").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q65_tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q65_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): outer join with a
    filter in the ON clause, then a two-level aggregation. Adapted: the
    original excludes orders by o_comment pattern (column absent) — the
    exclusion predicate moves to o_orderpriority, same join shape."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q66_tpch_q14",
    oracle=f"""
    SELECT {sql_crnd(
        "CAST(100 * sum(CASE WHEN p_type = 'PROMO' THEN "
        f"{sql_scaled_long('l_extendedprice')} * (100 - {sql_scaled_long('l_discount')})"
        " ELSE 0 END) AS DOUBLE) / CAST(sum("
        f"{sql_scaled_long('l_extendedprice')} * (100 - {sql_scaled_long('l_discount')})"
        ") AS DOUBLE)", 6)} AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q66_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional revenue share for one
    ship month. Adapted: p_type LIKE 'PROMO%%' → p_type = 'PROMO' (the
    fixture's types are single words). Ratio of exact scaled sums."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01")) & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", disc_price_scaled()).otherwise(F.lit(0)))
    total = F.sum(disc_price_scaled())
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(crnd((promo * F.lit(100)).cast("double") / total.cast("double"), 6).alias("promo_revenue"))
    )


@query(
    "q67_tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum({sql_scaled_long("l_extendedprice")} * (100 - {sql_scaled_long("l_discount")})) AS total_rev_scaled
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           {sql_crnd("CAST(total_rev_scaled AS DOUBLE) / 1e4", 2)} AS total_rev
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev_scaled = (SELECT max(total_rev_scaled) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q67_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): revenue view + scalar-max subquery.
    The max-equality comparison runs on the exact scaled longs, so the
    tie semantics are bit-identical across engines; the double
    conversion happens only in the projected output."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(disc_price_scaled()).alias("total_rev_scaled")
    )
    max_rev = revenue.agg(F.max("total_rev_scaled").alias("max_rev"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_rev_scaled") == F.col("max_rev"))
        .join(supp, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            crnd(F.col("total_rev_scaled").cast("double") / F.lit(1e4), 2).alias("total_rev"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q68_tpch_q17",
    oracle=f"""
    SELECT {sql_crnd("CAST(sum(CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) / 1e2 / 7.0", 6)}
           AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_type = 'MEDIUM'
      AND l_quantity < (
        SELECT 0.2 * (CAST(sum({sql_scaled_long("l_quantity")}) AS DOUBLE) / 1e2
                      / CAST(count(*) AS DOUBLE))
        FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey
      )
    """,
)
def q68_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): correlated average
    subquery per part. Adapted: p_container (absent) → p_type.
    Decorrelated Spark plan: one map-side-combinable per-part average
    over the full fact, broadcast back — no per-row rescan. The
    average itself is exact (scaled-long sum / count)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "MEDIUM")
    )
    per_part_avg = li.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (
            F.sum(to_scaled_long(F.col("l_quantity"))).cast("double")
            / F.lit(1e2)
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_qty")
    )
    return (
        li.join(part.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part_avg, F.col("l_partkey") == F.col("avg_pk"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            crnd(
                F.sum(to_scaled_long(F.col("l_extendedprice"))).cast("double") / F.lit(1e2) / F.lit(7.0),
                6,
            ).alias("avg_yearly")
        )
    )


@query(
    "q69_tpch_q18",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           {sql_crnd(sql_dsum("l_quantity"), 2)} AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum({sql_scaled_long("l_quantity")}) > 220 * 100
      )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q69_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): HAVING-filtered IN-subquery
    on the fact's own aggregate (threshold on the exact scaled sum).

    Scale shape: the qualifying-orderkey set is tiny by construction
    (the HAVING threshold sits in the distribution tail), so it IS
    broadcast — but the unfiltered orders/customer tables are NOT: the
    per-order quantity sum is computed on the semi-joined lineitem
    (tiny), and that small aggregate side is broadcast into the
    orders and customer joins, keeping both facts shuffle-free."""
    li = load_table(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(to_scaled_long(F.col("l_quantity"))).alias("qty_scaled"))
        .filter(F.col("qty_scaled") > 220 * 100)
        .select(F.col("l_orderkey").alias("big_ok"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    qty_per_big_order = (
        li.join(F.broadcast(big_orders), F.col("l_orderkey") == F.col("big_ok"), "left_semi")
        .groupBy("l_orderkey")
        .agg(crnd(dsum(F.col("l_quantity")), 2).alias("sum_qty"))
    )
    big_order_side = orders.join(
        F.broadcast(qty_per_big_order), F.col("o_orderkey") == F.col("l_orderkey")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "sum_qty")
    return (
        cust.join(F.broadcast(big_order_side), F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "q70_tpch_q19",
    oracle=f"""
    SELECT {sql_crnd(SQL_DISC_PRICE_SUM, 2)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q70_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): three
    OR'd brand/size/quantity groups across the join. Adapted:
    p_container + l_shipmode predicates (columns absent) dropped; the
    disjunction-across-a-join shape is the point. Catalyst extracts
    the common p_brand IN (...) / bounds as join-side filters."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 50) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(xcrnd(SQL_DISC_PRICE_SUM, 2).alias("revenue"))
    )


@query(
    "q71_tpch_q22",
    oracle=f"""
    WITH avg_bal AS (
      SELECT CAST(sum({sql_scaled_long("c_acctbal")}) AS DOUBLE) / 1e2
             / CAST(count(*) AS DOUBLE) AS a
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey AS cntrycode,
           count(*) AS numcust,
           {sql_crnd(sql_dsum("c_acctbal"), 2)} AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c_nationkey
    ORDER BY cntrycode
    """,
)
def q71_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers with no orders. Adapted: the phone-prefix country code
    (column absent) → c_nationkey, and "no orders" → "no orders since
    2001" (every fixture customer has some order, which would make the
    literal form vacuously empty). Shape preserved: uncorrelated
    scalar average (exact), NOT EXISTS anti join, final aggregate."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(to_scaled_long(F.col("c_acctbal"))).cast("double")
                / F.lit(1e2)
                / F.count(F.lit(1)).cast("double")
            ).alias("a")
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            orders.filter(F.col("o_orderdate") >= _ts("2001-01-01")).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            crnd(dsum(F.col("c_acctbal")), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "q78_tpch_q21",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q78_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): the double
    correlated EXISTS / NOT EXISTS. Adapted: no commit/receipt dates
    in the fixture, so "late" = shipped > 60 days after order date;
    no s_nationkey filter (keeps all 25 nations' suppliers).

    Spark-first shape: the two correlated subqueries collapse into ONE
    per-order aggregate — n_supp = countDistinct(supplier) and
    n_late_supp = countDistinct(supplier | late). A late l1 qualifies
    iff n_supp > 1 (the EXISTS) and n_late_supp = 1 (the NOT EXISTS:
    l1's supplier is late, so if only one supplier is late it must be
    l1's). One groupBy on l_orderkey + one join back on l_orderkey —
    both co-partitioned on the same key (a single shuffle boundary at
    scale, AQE-coalesced) — instead of two correlated rescans of the
    fact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")

    li_dated = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).withColumn(
        "is_late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    per_order = li_dated.groupBy(F.col("l_orderkey").alias("po_ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    return (
        li_dated.filter(F.col("is_late"))
        .join(per_order, F.col("l_orderkey") == F.col("po_ok"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        # no hint on supplier: SF-growing side, AQE broadcasts it locally
        # and falls back to shuffle at scale (module-header policy;
        # round-8 review removed a forced broadcast here)
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@query(
    "q79_tpch_q9",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(sum({sql_scaled_long('l_extendedprice')} * (100 - {sql_scaled_long('l_discount')})
                    - {sql_scaled_long('p_retailprice')} * {sql_scaled_long('l_quantity')}) AS DOUBLE) / 1e4
               AS sum_profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def q79_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): 5-table join, profit per
    supplier-nation per year. Adapted: no partsupp in the fixtures →
    unit cost = p_retailprice (profit = revenue − retailprice·qty,
    exact in 1e-4 integer units on both engines). The part pattern is
    '%red%' (~13% of parts at every SF) — the classic '%<digit>%'
    matches nothing in this fixture's adjective-noun part names, which
    made the hash check vacuous (round-1 verdict "What's wrong" #1).

    Scale shape: lineitem joins part and supplier on ITS OWN keys
    (auto-broadcast locally, shuffle at SF where they outgrow the
    threshold — no forced hint, same policy as the module header),
    nation (25 rows) is forced-broadcast onto supplier, and the
    orders join is the one genuine fact-fact shuffle on l_orderkey."""
    t = {n: load_table(spark, sf_dir, n) for n in ("lineitem", "part", "supplier", "nation", "orders")}
    profit = disc_price_scaled() - to_scaled_long(F.col("p_retailprice")) * to_scaled_long(
        F.col("l_quantity")
    )
    return (
        t["lineitem"]
        .join(t["part"].filter(F.col("p_name").like("%red%")).select("p_partkey", "p_retailprice"),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t["supplier"].join(F.broadcast(t["nation"]),
                                 F.col("s_nationkey") == F.col("n_nationkey"))
              .select("s_suppkey", "n_name"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"].select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("int").alias("o_year"))
        .agg((F.sum(profit).cast("double") / F.lit(1e4)).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q80_tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q80_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): correlated EXISTS → left
    semi join. Adapted: no commit/receipt dates → "a lineitem shipped
    more than 30 days after the order date". The semi join carries
    the correlated date predicate as a join-condition residual, so
    the probe side is the (year-filtered) orders table and lineitem
    is never widened — one shuffle pair on the order key at scale."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q81_tpch_q2",
    oracle="""
    SELECT DISTINCT p_partkey, p_name, s_name, l_shipdate AS first_ship
    FROM lineitem l1
    JOIN part ON p_partkey = l1.l_partkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE p_size < 10
      AND l1.l_shipdate = (SELECT min(l2.l_shipdate) FROM lineitem l2
                           WHERE l2.l_partkey = l1.l_partkey)
    ORDER BY p_partkey, s_name
    LIMIT 200
    """,
)
def q81_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): the correlated scalar-min
    subquery joined back to the outer row. Adapted: no partsupp →
    "the supplier(s) who shipped each small part EARLIEST" (min
    l_shipdate per part instead of min ps_supplycost per part).

    Decorrelated Spark shape: one map-side-combinable min-agg per
    partkey over the fact, then an equi-join back on
    (partkey, shipdate) — the per-part aggregate is |part|-sized
    (broadcastable locally, shuffle-on-partkey at SF); never a
    per-row rescan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_shipdate")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10).select("p_partkey", "p_name")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    first = li.groupBy(F.col("l_partkey").alias("m_pk")).agg(F.min("l_shipdate").alias("min_ship"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(first, (F.col("l_partkey") == F.col("m_pk")) & (F.col("l_shipdate") == F.col("min_ship")))
        # no hint on supplier (module-header policy; round-8 review)
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", F.col("l_shipdate").alias("first_ship"))
        .distinct()
        .orderBy("p_partkey", "s_name")
        .limit(200)
    )


@query(
    "q82_tpch_q11",
    oracle=f"""
    WITH t AS (SELECT l_partkey,
                      CAST(sum({sql_scaled_long('l_extendedprice')}) AS BIGINT) AS val
               FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, CAST(val AS DOUBLE) / 1e2 AS part_value
    FROM (SELECT l_partkey, val,
                 CAST(sum(val) OVER () AS BIGINT) AS s,
                 CAST(count(*) OVER () AS BIGINT) AS cnt
          FROM t) z
    WHERE CAST(val AS DOUBLE) > CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE)
    ORDER BY part_value DESC, l_partkey
    """,
)
def q82_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): per-key value share vs a global
    scalar. Adapted: no partsupp → per-partkey lineitem revenue vs
    the AVERAGE per-part revenue. The compare is double-vs-double
    (val > s/cnt, the same two IEEE casts + one divide on both
    engines — deterministic cross-engine) rather than the integer form
    val·cnt > s, which overflows BIGINT under ANSI mode once
    val·cnt crosses 2⁶³ at extreme scale (round-3 review). Above-
    average is sf-invariant: the fixed 0.1%-of-total cut selected
    nothing at sf0.01 (round-1 verdict — a 0-row hash match verifies
    nothing), while above-average parts exist at every SF.

    Scale shape: ONE aggregation of the fact produces the per-part
    values; the global total is an unpartitioned window sum over THAT
    (|part|-sized) frame. Why a window and not `t.agg(...)` + cross
    join: referencing t twice builds two independent plan subtrees
    and Spark does NOT reuse the exchange (verified: 2 lineitem scans
    in the executed plan) — the window form scans the fact exactly
    once. The unpartitioned window coalesces the |part|-sized frame
    to one task; at SF where that bites, replace with a broadcast of
    a localCheckpoint'ed total — never with a fact rescan."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    t = li.groupBy("l_partkey").agg(
        F.sum(to_scaled_long(F.col("l_extendedprice"))).alias("val")
    )
    w = Window.partitionBy()
    t = t.withColumn("s", F.sum("val").over(w)).withColumn("cnt", F.count(F.lit(1)).over(w))
    return (
        t.filter(F.col("val").cast("double") > F.col("s").cast("double") / F.col("cnt").cast("double"))
        .select("l_partkey", (F.col("val").cast("double") / F.lit(1e2)).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@query(
    "q83_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%')
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 100
    """,
)
def q83_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): NOT IN exclusion +
    count(DISTINCT) per attribute class. Adapted: no partsupp → count
    distinct SHIPPING suppliers per (brand, type, size); the excluded
    set is name-pattern suppliers (no comment column). The NOT IN set
    is null-free by construction (keys), so anti join is exactly
    equivalent (the null-poisoning caveat in q50 doesn't bite); it is
    tiny → broadcast anti join, fact never reshuffled for it."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7%"))
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(100)
    )


@query(
    "q84_tpch_q20",
    oracle=f"""
    SELECT s_name, CAST(total_qty AS DOUBLE) / 1e2 AS shipped_qty
    FROM supplier
    JOIN (SELECT l_suppkey, total_qty
          FROM (SELECT l_suppkey, total_qty,
                       CAST(sum(total_qty) OVER () AS BIGINT) AS s,
                       CAST(count(*) OVER () AS BIGINT) AS cnt
                FROM (SELECT l_suppkey,
                             CAST(sum({sql_scaled_long('l_quantity')}) AS BIGINT) AS total_qty
                      FROM lineitem
                      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
                        AND l_shipdate >= TIMESTAMP '1997-01-01'
                      GROUP BY l_suppkey) a) z
          WHERE CAST(total_qty AS DOUBLE) > CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE)) q
      ON q.l_suppkey = s_suppkey
    ORDER BY s_name
    """,
)
def q84_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): nested IN-subquery chain
    — suppliers who moved above-average volume of pattern-matched
    parts in the window. Adapted: no partsupp availqty → above-average
    shipped quantity (double compare, same IEEE ops both engines — the
    integer val·cnt form overflows BIGINT under ANSI at extreme
    scale), '%red%' part pattern. Both replace fixed cuts that
    selected nothing at sf0.01 (round-1 verdict: 0-row hash matches
    verify nothing; '%<digit>%' matches no adjective-noun part name at
    ANY fixture SF).

    Scale shape: the part-pattern set semi-joins the fact (broadcast
    locally, shuffle at SF — no hint), the per-supplier agg is
    map-side combinable and |supplier|-sized, the above-average cut is
    a window over that tiny frame, and the supplier join happens after
    the HAVING-style filter."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") >= _ts("1997-01-01"))
    promo_parts = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy()
    qty = (
        li.join(promo_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(to_scaled_long(F.col("l_quantity"))).alias("total_qty"))
        .withColumn("s", F.sum("total_qty").over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .filter(
            F.col("total_qty").cast("double")
            > F.col("s").cast("double") / F.col("cnt").cast("double")
        )
        .select("l_suppkey", "total_qty")
    )
    return (
        # qty is ~an SF-growing fraction of supplier, not tiny-by-
        # construction: no forced hint (round-8 review), AQE decides
        supp.join(qty, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", (F.col("total_qty").cast("double") / F.lit(1e2)).alias("shipped_qty"))
        .orderBy("s_name")
    )

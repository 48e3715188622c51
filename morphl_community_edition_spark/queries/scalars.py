"""Scalar-function breadth + JSON + stats + pandas-UDF parity:
Q17, Q19, Q20, Q25, Q26, Q27.

Covers SURVEY.md §3 groups H (H1-H7), D3/D6/D7 and J1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from morphl_community_edition_spark.catalog import load_table
from morphl_community_edition_spark.functions.rounding import (
    crnd,
    dsum,
    sql_crnd,
    sql_dsum,
    sql_scaled_long,
    to_scaled_long,
)
from morphl_community_edition_spark.queries import query
from morphl_community_edition_spark.queries.windows import EVENTS_US


@query(
    "q17_json_agg",
    oracle=f"""
    SELECT event_type, count(*) AS cnt, {sql_crnd(sql_dsum("value"), 2)} AS sum_value,
           count(DISTINCT user_id) AS users,
           {sql_crnd("CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 6)} AS avg_k
    FROM {EVENTS_US} e
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q17_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-statement spark.sql build over the memoized temp views
    (see relational._Q01_BODY note): identical aggregation semantics
    to the former DataFrame chain; the rounding text is shared.

    Parse path (round-10 measurement, SCALE.md): the '$.k' probe runs
    through Spark 4's VARIANT type — ``try_variant_get(parse_json(
    props), '$.k', 'int')`` — which reads 18% faster than
    ``get_json_object`` on this query at sf0.1 (0.337 vs 0.413 s;
    from_json struct/map tied with get_json_object, a regexp scan was
    2× faster still but is not a JSON parser and diverges on nested/
    quoted keys). Semantics parity with the oracle's
    ``CAST(json_extract(...) AS INT)``: strict parse (malformed JSON
    errors in BOTH engines — get_json_object's silent NULL was
    actually the outlier), try_ on the GET so a props object without
    'k' yields NULL, 'int' typed extraction on the numeric payload."""
    from morphl_community_edition_spark.catalog import ensure_views

    sfx = ensure_views(spark, sf_dir)
    avg_k = sql_crnd(
        "CAST(sum(try_variant_get(parse_json(props), '$.k', 'int')) AS DOUBLE)"
        " / CAST(count(*) AS DOUBLE)",
        6,
    )
    return spark.sql(f"""
        SELECT event_type, count(*) AS cnt,
               {sql_crnd(sql_dsum("value"), 2)} AS sum_value,
               count(DISTINCT user_id) AS users,
               {avg_k} AS avg_k
        FROM events_{sfx}
        GROUP BY event_type
        ORDER BY event_type""")


@query(
    "q19_sorted_list_agg",
    oracle="""
    SELECT l_orderkey, array_to_string(list(l_linenumber ORDER BY l_linenumber), ',') AS lines
    FROM lineitem
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    LIMIT 500
    """,
)
def q19_sorted_list_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list is order-nondeterministic → always array_sort before
    exposing (SURVEY.md §5.3 rule 5); string-joined so the comparator
    sees a scalar column on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    lines = F.array_join(
        F.transform(F.array_sort(F.collect_list("l_linenumber")), lambda x: x.cast("string")), ","
    )
    return (
        li.groupBy("l_orderkey")
        .agg(lines.alias("lines"))
        .orderBy("l_orderkey")
        .limit(500)
    )


# Exact-moment formulations of stddev/var/corr (D7): per-group integer
# sums of scaled values (exact, order-independent), combined with the
# SAME double expression on both engines — so the usual cross-engine
# drift of streaming variance algorithms cannot appear. Scales cancel:
# var(x) = var(x_scaled)/10^(2k), corr is scale-invariant.
_SQL_Q20 = f"""
    WITH m AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(floor(l_quantity * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) AS sq,
             CAST(sum(CAST(floor(l_quantity * 1e2 + 0.5) AS BIGINT) * CAST(floor(l_quantity * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) AS sq2,
             CAST(sum(CAST(floor(l_discount * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) AS sd,
             CAST(sum(CAST(floor(l_discount * 1e2 + 0.5) AS BIGINT) * CAST(floor(l_discount * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) AS sd2,
             CAST(sum(CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) AS sp,
             CAST(sum(CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT) * CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) AS sp2,
             CAST(sum(CAST(floor(l_quantity * 1e2 + 0.5) AS BIGINT) * CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) AS sqp,
             {sql_crnd("quantile_cont(l_extendedprice, 0.5)", 6)} AS median_price
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           {sql_crnd("sqrt((n * sq2 - sq * sq) / (n * (n - 1))) / 1e2", 6)} AS sd_qty,
           {sql_crnd("((n * sd2 - sd * sd) / (n * (n - 1))) / 1e4", 6)} AS var_disc,
           {sql_crnd("(n * sqp - sq * sp) / (sqrt(n * sq2 - sq * sq) * sqrt(n * sp2 - sp * sp))", 6)} AS corr_qp,
           median_price
    FROM m ORDER BY l_returnflag
"""


@query("q20_stats", oracle=_SQL_Q20)
def q20_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qs = to_scaled_long(F.col("l_quantity"))
    ds = to_scaled_long(F.col("l_discount"))
    ps = to_scaled_long(F.col("l_extendedprice"))
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(qs).cast("double").alias("sq"),
        F.sum(qs * qs).cast("double").alias("sq2"),
        F.sum(ds).cast("double").alias("sd"),
        F.sum(ds * ds).cast("double").alias("sd2"),
        F.sum(ps).cast("double").alias("sp"),
        F.sum(ps * ps).cast("double").alias("sp2"),
        F.sum(qs * ps).cast("double").alias("sqp"),
        crnd(F.percentile("l_extendedprice", 0.5), 6).alias("median_price"),
    )
    n, sq, sq2, sd, sd2, sp, sp2, sqp = (F.col(c) for c in ("n", "sq", "sq2", "sd", "sd2", "sp", "sp2", "sqp"))
    return m.select(
        "l_returnflag",
        crnd(F.sqrt((n * sq2 - sq * sq) / (n * (n - 1))) / F.lit(1e2), 6).alias("sd_qty"),
        crnd(((n * sd2 - sd * sd) / (n * (n - 1))) / F.lit(1e4), 6).alias("var_disc"),
        crnd((n * sqp - sq * sp) / (F.sqrt(n * sq2 - sq * sq) * F.sqrt(n * sp2 - sp * sp)), 6).alias("corr_qp"),
        "median_price",
    ).orderBy("l_returnflag")


@query(
    "q25_string_gauntlet",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                            AS up_name,
           substring(p_name, 1, 4)                  AS sub4,
           CAST(length(p_name) AS INTEGER)          AS name_len,
           regexp_extract(p_type, '^([A-Z]+)', 1)   AS type_word,
           split_part(p_name, ' ', 1)               AS w0,
           concat(p_brand, '/', p_type)             AS brand_type,
           replace(p_name, ' ', '_')                AS underscored
    FROM part
    ORDER BY p_partkey
    LIMIT 500
    """,
)
def q25_string_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.upper("p_name").alias("up_name"),
            F.substring("p_name", 1, 4).alias("sub4"),
            F.length("p_name").alias("name_len"),
            F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("type_word"),
            F.split(F.col("p_name"), " ").getItem(0).alias("w0"),
            F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
            F.regexp_replace("p_name", " ", "_").alias("underscored"),
        )
        .orderBy("p_partkey")
        .limit(500)
    )


@query(
    "q26_date_gauntlet",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)  AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mth,
           CAST(day(o_orderdate) AS INTEGER)   AS dy,
           date_trunc('month', o_orderdate)    AS mon_start,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INTEGER) AS days_to_2002
    FROM orders
    ORDER BY o_orderkey
    LIMIT 1000
    """,
)
def q26_date_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mth"),
            F.dayofmonth("o_orderdate").alias("dy"),
            F.date_trunc("month", F.col("o_orderdate")).alias("mon_start"),
            F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
                "days_to_2002"
            ),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@pandas_udf(DoubleType())
def _f_engagement(v: pd.Series) -> pd.Series:
    # Arrow-vectorized (J1): numpy runs over whole batches; a
    # row-at-a-time Python UDF here would be ~50× slower at scale.
    return v * 2 + np.log(v + 1)


@query(
    "q27_pandas_udf",
    oracle=f"""
    SELECT event_id, {sql_crnd("value * 2 + ln(value + 1)", 6)} AS fval
    FROM {EVENTS_US} e
    ORDER BY event_id
    LIMIT 2000
    """,
)
def q27_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", crnd(_f_engagement(F.col("value")), 6).alias("fval"))
        .orderBy("event_id")
        .limit(2000)
    )


@query(
    "q72_percentiles",
    oracle=f"""
    SELECT l_returnflag,
           {sql_crnd(f"quantile_cont({sql_scaled_long('l_quantity')}, 0.25) / 1e2", 6)} AS p25,
           {sql_crnd(f"quantile_cont({sql_scaled_long('l_quantity')}, 0.5) / 1e2", 6)}  AS p50,
           {sql_crnd(f"quantile_cont({sql_scaled_long('l_quantity')}, 0.9) / 1e2", 6)}  AS p90,
           {sql_crnd(f"quantile_cont({sql_scaled_long('l_extendedprice')}, 0.5) / 1e2", 6)} AS price_median,
           count(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q72_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (D7), computed over the exact
    scaled-long form of each 2-decimal column so both engines
    interpolate between identical integers (arbitrary-double inputs
    would reintroduce the cross-engine 1-ulp hazard rounding.py
    exists to kill). Residual risk: Spark interpolates lo+(hi-lo)·f
    where DuckDB may use lo·(1-f)+hi·f — algebraically equal, up to
    1 ulp apart in IEEE; on integer inputs with the fixture's group
    sizes the results are bit-identical (verified at sf0.01/0.001),
    and the canonical round-6 sits far from any boundary. This is the
    exact (sort-based) path — the sketch-based scale path is
    q73_approx_percentile."""
    li = load_table(spark, sf_dir, "lineitem")

    def pct(col: str, p: float):
        return crnd(
            F.expr(f"percentile({sql_scaled_long(col)}, {p})") / F.lit(1e2), 6
        )

    return (
        li.groupBy("l_returnflag")
        .agg(
            pct("l_quantity", 0.25).alias("p25"),
            pct("l_quantity", 0.5).alias("p50"),
            pct("l_quantity", 0.9).alias("p90"),
            pct("l_extendedprice", 0.5).alias("price_median"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag")
    )


@query("q73_approx_percentile")  # no oracle: t-digest/GK sketches are engine-specific by design
def q73_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (D7 scale path): Greenwald-Khanna sketch,
    single pass, mergeable across partitions — at 100 TB the exact
    percentile's global sort is the bottleneck; the sketch is O(1/eps)
    memory per group. Accuracy vs the exact twin is asserted in
    tests/test_approx.py (rank error well inside 1/accuracy)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("approx_median"),
            F.expr("approx_percentile(l_extendedprice, 0.99, 10000)").alias("approx_p99"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q99_value_histogram",
    oracle="""
    SELECT event_type,
           CAST(least(floor(value / 50.0), 9) AS INTEGER) AS bin,
           count(*) AS cnt,
           CAST(sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) / 1e2 AS bin_sum
    FROM events
    GROUP BY event_type, least(floor(value / 50.0), 9)
    ORDER BY event_type, bin
    """,
)
def q99_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (data-profiling staple): 50-unit bins
    with a clamped overflow bucket, bin id from pure floor math (no
    width_bucket — DuckDB lacks it; floor((x)/w) is identical IEEE on
    both engines), per-bin count + exact scaled sum. One map-side-
    combinable aggregation keyed by (event_type, bin) — at 100 TB the
    profile costs one shuffle of ~|types|·|bins| partial rows."""
    ev = load_table(spark, sf_dir, "events")
    bin_id = F.least(F.floor(F.col("value") / F.lit(50.0)), F.lit(9)).cast("int")
    return (
        ev.groupBy("event_type", bin_id.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(to_scaled_long(F.col("value"))).cast("double") / F.lit(1e2)).alias("bin_sum"),
        )
        .orderBy("event_type", "bin")
    )


@query(
    "q116_udtf_shingles",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
               WHERE doc_id < 200),
    g AS (SELECT doc_id, array_to_string(ws[gs:gs+2], ' ') AS s
          FROM w, LATERAL unnest(generate_series(1, len(ws) - 2)) AS t(gs))
    SELECT doc_id, count(*) AS n_shingles,
           CAST(count(DISTINCT s) AS BIGINT) AS n_distinct,
           min(s) AS first_shingle
    FROM g
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def q116_udtf_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 with oracle-grade evidence: the Python UDTF's lateral
    expansion (positions KEPT, duplicates and all) hash-compared
    against DuckDB's generate_series shingling. Bounded to doc_id <
    200 on both sides because a UDTF is row-at-a-time Python — the
    documented slow path (functions/udtfs.py); the engine's real
    shingle operators are the explode()-based JVM ones, and this query
    exists to pin the UDTF surface's CORRECTNESS, not to recommend
    it."""
    from morphl_community_edition_spark.catalog import ensure_views
    from morphl_community_edition_spark.functions.udtfs import ShingleUDTF

    spark.udtf.register("shingles", ShingleUDTF)
    sfx = ensure_views(spark, sf_dir)
    return spark.sql(f"""
        SELECT doc_id, count(*) AS n_shingles,
               count(DISTINCT s.shingle) AS n_distinct,
               min(s.shingle) AS first_shingle
        FROM documents_{sfx}, LATERAL shingles(text, 3) s
        WHERE doc_id < 200
        GROUP BY doc_id
        ORDER BY doc_id""")

"""Warehouse-maintenance and dataset-monitoring operators (round 11
continuation): incremental materialized-rollup maintenance, mergeable
distinct-count sketch rollups, and distribution-drift detection (PSI)
— the jobs that run BESIDE a 100 TB training-data pipeline to keep its
aggregates, cardinality dashboards, and input-drift alarms current
without re-reading the fact tables.

All splits of the fixture into "initial corpus" vs "delta batches"
use the md5-hex-digit device of q75 (pipeline_ops): membership is a
pure function of the row key, identical on both engines, so the
oracle can replay the same split exactly.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from morphl_community_edition_spark.catalog import index_root, load_table
from morphl_community_edition_spark.functions.rounding import (
    dsum,
    sql_davg,
    sql_dsum,
)
from morphl_community_edition_spark.queries import query


def _per_app_path(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Per-application scratch root for a persisted structure (the
    q134 device: two concurrent runs on one host must never overwrite
    each other's index mid-read)."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return os.path.join(
        index_root(spark), name, spark.sparkContext.applicationId, tag
    )


# ---------------------------------------------------------------------------
# q159: incremental materialized rollup — fold two delta batches into a
# persisted partial-state table; serving it must hash-match a
# from-scratch aggregate over the full fact table.
# ---------------------------------------------------------------------------

@query(
    "q159_incremental_rollup",
    oracle=f"""
    SELECT l_suppkey,
           CAST(count(*) AS BIGINT) AS n_rows,
           {sql_dsum('l_quantity')} AS qty_sum,
           {sql_davg('l_quantity')} AS qty_avg,
           {sql_dsum('l_extendedprice')} AS price_sum,
           {sql_davg('l_extendedprice')} AS price_avg,
           min(l_shipdate) AS ship_min,
           max(l_shipdate) AS ship_max
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY l_suppkey
    """,
)
def q159_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-level sales rollup maintained INCREMENTALLY
    (operators/incremental_agg): the fact table is split by
    md5(l_orderkey) into an initial build (14/16 of orders) plus two
    delta folds ('e' and 'f' buckets); each fold aggregates only its
    delta into persisted monoid states (exact scaled-integer sums,
    counts, extrema) and the serve-time read merges the committed
    slices. The oracle aggregates the FULL fact table from scratch —
    hash-equality proves fold-merge == recompute, the materialized-
    view-maintenance contract.

    Scale shape: at 100 TB the build is one fact pass (partial+final
    hash agg, |groups|-sized shuffle); every later fold costs only its
    batch; the serve merge unions |groups|-sized state slices. The
    fact table is never re-read after ingest."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        RollupSpec,
        append_rollup,
        build_rollup,
        fold_concurrently,
        read_rollup,
    )

    li = load_table(spark, sf_dir, "lineitem")
    hex1 = F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 1)
    spec = RollupSpec(
        keys=("l_suppkey",),
        measures={"l_quantity": 2, "l_extendedprice": 2},
        extrema=("l_shipdate",),
    )
    path = _per_app_path(spark, sf_dir, "morphl_rollup")
    build_rollup(li.filter(hex1 < "e"), spec, path)
    # the two delta folds are independent (distinct sids, disjoint
    # slice dirs) — overlap them so the second fold's scan back-fills
    # the first's stage tail (guide §2.6; round 13)
    fold_concurrently(
        lambda: append_rollup(li.filter(hex1 == "e"), path, sid="batch-e"),
        lambda: append_rollup(li.filter(hex1 == "f"), path, sid="batch-f"),
    )
    served = read_rollup(spark, path)
    # pinned_order A/B'd here and NOT kept: the summary serve's
    # post-shuffle segment is one |groups|-sized final agg, so the
    # sampling re-execution the pin removes is already cheap —
    # measured wash/loss both runs (tools/ab_pinsort.py, round 14)
    return served.select(
        "l_suppkey",
        "n_rows",
        F.col("l_quantity_sum").alias("qty_sum"),
        F.col("l_quantity_avg").alias("qty_avg"),
        F.col("l_extendedprice_sum").alias("price_sum"),
        F.col("l_extendedprice_avg").alias("price_avg"),
        F.col("l_shipdate_min").alias("ship_min"),
        F.col("l_shipdate_max").alias("ship_max"),
    ).orderBy("l_suppkey")


# ---------------------------------------------------------------------------
# q160/q161: mergeable distinct-count sketch rollup. Daily HLL sketches
# are MATERIALIZED (binary column in parquet — the round-trip is part
# of the query), then re-aggregated to the period level with
# hll_union_agg. Distinct counts are NOT summable across days; sketches
# are — that is the entire point of sketch materialization at 100 TB:
# the cardinality dashboard re-reads |days × groups| sketch rows, never
# the event log. q161 is the exact twin (one full count-distinct pass),
# DuckDB-hash-certified; q160's estimate is tolerance-checked against
# it in tests/test_approx.py (the q18/q17 pattern).
# ---------------------------------------------------------------------------


@query("q160_hll_sketch_rollup")
def q160_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user estimate served FROM persisted
    daily HLL sketches (Datasketches HllSketch, lgK=14 ≈ 0.5% rse):
    one event-log pass builds |days × types| sketch rows, written to
    parquet (binary sketch column survives the round-trip); the serve
    query unions the daily sketches per type — no event re-read, and
    the union is exact over sketch state (HLL union is lossless at
    equal lgK), so daily materialization costs no accuracy vs a
    one-shot sketch."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg(F.col("user_id"), F.lit(14)).alias("sk"))
    path = _per_app_path(spark, sf_dir, "morphl_hll_daily")
    daily.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
            F.count(F.lit(1)).cast("bigint").alias("n_daily_sketches"),
        )
        .orderBy("event_type")
    )


@query(
    "q161_exact_distinct_rollup",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q161_exact_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q160's exact twin: per-event-type distinct users (and active
    days) computed from scratch — the expensive full-pass answer the
    sketch rollup approximates. Registered with a DuckDB oracle so the
    pair gives the driver one hash-exact row and one tolerance row for
    the same question (the q17/q18 device)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.countDistinct(F.to_date("ts")).cast("bigint").alias("n_days"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q162: PSI input-drift detection between two corpus epochs — the alarm
# a production training pipeline keeps on its document length (or any
# feature) distribution. Epoch membership is md5(doc_id) parity (pure
# per-row function, engine-identical); the ln of the share ratio is
# integer-scaled at 1e-6 (the q138 NLL device), so the per-bin PSI
# contributions hash-match DuckDB exactly.
# ---------------------------------------------------------------------------

_PSI_BIN_W = 50  # n_chars 48..553 at sf0.01 → ~11 populated bins


@query(
    "q162_psi_drift",
    oracle=f"""
    WITH e AS (SELECT CAST(floor(n_chars / {_PSI_BIN_W}.0) AS BIGINT) AS bin,
                      CAST(md5(CAST(doc_id AS VARCHAR)) AS VARCHAR) AS h
               FROM documents),
    t AS (SELECT bin,
                 CAST(count(*) FILTER (WHERE ascii(substr(h, 32, 1)) % 2 = 0) AS BIGINT) AS cnt_a,
                 CAST(count(*) FILTER (WHERE ascii(substr(h, 32, 1)) % 2 = 1) AS BIGINT) AS cnt_b
          FROM e GROUP BY bin),
    tot AS (SELECT CAST(sum(cnt_a) + count(*) AS BIGINT) AS ta,
                   CAST(sum(cnt_b) + count(*) AS BIGINT) AS tb
            FROM t),
    s AS (SELECT bin, cnt_a, cnt_b,
                 (cnt_a + 1) / CAST(ta AS DOUBLE) AS pa,
                 (cnt_b + 1) / CAST(tb AS DOUBLE) AS pb
          FROM t, tot)
    SELECT bin, cnt_a, cnt_b,
           floor(((pa - pb) * CAST(floor(ln(pa / pb) * 1e6 + 0.5) AS BIGINT) / 1e6)
                 * 1e8 + 0.5) / 1e8 AS psi_contrib
    FROM s ORDER BY bin
    """,
)
def q162_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift between two document epochs
    (epoch A = even last-md5-hex-digit of doc_id, B = odd): n_chars is
    binned at width 50, per-bin shares are Laplace-smoothed (+1 per
    bin, the standard zero-bin guard), and each bin contributes
    (pa−pb)·ln(pa/pb). Per-bin contributions are emitted (the
    actionable output — WHICH lengths drifted), rounded at 1e-8 with
    the ln integer-scaled at 1e-6 so both engines do identical double
    ops.

    Scale shape: two map-side-combined hash aggs (bin counts are
    |bins|-sized immediately) + a 1-row total broadcast — one corpus
    scan, no shuffle wider than |bins|."""
    docs = load_table(spark, sf_dir, "documents")
    hexlast = F.substring(F.md5(F.col("doc_id").cast("string")), 32, 1)
    epoch_b = F.ascii(hexlast) % 2  # 0 → epoch A, 1 → epoch B
    t = (
        docs.select(
            F.floor(F.col("n_chars") / F.lit(float(_PSI_BIN_W))).cast("bigint").alias("bin"),
            epoch_b.alias("eb"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.when(F.col("eb") == 0, 1)).cast("bigint").alias("cnt_a"),
            F.count(F.when(F.col("eb") == 1, 1)).cast("bigint").alias("cnt_b"),
        )
    )
    tot = t.agg(
        (F.sum("cnt_a") + F.count(F.lit(1))).cast("bigint").alias("ta"),
        (F.sum("cnt_b") + F.count(F.lit(1))).cast("bigint").alias("tb"),
    )
    pa = (F.col("cnt_a") + 1) / F.col("ta").cast("double")
    pb = (F.col("cnt_b") + 1) / F.col("tb").cast("double")
    slp = F.floor(F.log(pa / pb) * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    contrib = (pa - pb) * slp / F.lit(1e6)
    # pinned_order A/B'd here and NOT kept: the |bins|-sized tail
    # above the sort is one broadcast-join projection — measured
    # wash/loss in the clean run (tools/ab_pinsort.py, round 14)
    return (
        t.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "cnt_a",
            "cnt_b",
            (F.floor(contrib * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)).alias("psi_contrib"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q164: z-order (Morton) layout key — the multi-dimensional clustering
# projection behind OPTIMIZE ZORDER, hash-certified bit-for-bit. The
# layout write + both-dimension skip-factor property live in
# operators/zorder.py and tests/test_maintenance_ops.py; the contract
# query certifies the projection arithmetic itself (5 shift/mask ops
# per dimension — identical BIGINT chains on both engines).
# ---------------------------------------------------------------------------

_Z_EPOCH = "1995-01-01"  # orders span 1995..2001 → day number < 2^16


def _zorder_oracle() -> str:
    from morphl_community_edition_spark.operators.zorder import sql_z_value

    zv = sql_z_value("x", "y")
    return f"""
    WITH z AS (
      SELECT o_custkey % 65536 AS x,
             date_diff('day', DATE '{_Z_EPOCH}', CAST(o_orderdate AS DATE)) % 65536 AS y,
             o_custkey, o_totalprice
      FROM orders),
    m AS (SELECT {zv} AS zval, o_custkey, o_totalprice FROM z)
    SELECT CAST(zval >> 18 AS INTEGER) AS zbucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(zval) AS BIGINT) AS z_min,
           CAST(max(zval) AS BIGINT) AS z_max,
           CAST(min(o_custkey) AS BIGINT) AS cust_min,
           CAST(max(o_custkey) AS BIGINT) AS cust_max,
           {sql_dsum('o_totalprice')} AS price_sum
    FROM m GROUP BY 1 ORDER BY zbucket
    """


@query("q164_zorder_histogram", oracle=_zorder_oracle())
def q164_zorder_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-code layout histogram over orders, clustering (customer,
    order-day): per coarse z-bucket (top 14 bits — fine enough to stay
    non-degenerate on fixtures whose dimensions populate only the low
    z bits, while |buckets| stays <= 2^14) the row count, fine
    z-range, customer range, and exact money sum. The customer range
    per bucket is the point of the layout: buckets slice BOTH the
    customer axis and the date axis at once, so either dimension's
    predicate prunes most buckets (measured as a property test, not
    assumed).

    Scale shape: pure per-row integer projection + one |buckets|-sized
    hash agg — map-side combined, no join, no window; at 100 TB this
    is the same single pass the layout write itself performs."""
    from morphl_community_edition_spark.operators.zorder import z_value, zbucket

    o = load_table(spark, sf_dir, "orders")
    x = F.pmod(F.col("o_custkey"), F.lit(65536))
    y = F.pmod(
        F.datediff(F.col("o_orderdate").cast("date"), F.lit(_Z_EPOCH).cast("date")),
        F.lit(65536),
    )
    z = z_value(x, y)
    # pinned_order A/B'd here and NOT kept: the |buckets|-sized tail
    # above the sort is one hash agg — contradictory small swings
    # across two clean sessions = wash (tools/ab_pinsort.py, round 14)
    return (
        o.select(
            zbucket(z, 14).alias("zbucket"),
            z.alias("zval"),
            "o_custkey",
            "o_totalprice",
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("zval").cast("bigint").alias("z_min"),
            F.max("zval").cast("bigint").alias("z_max"),
            F.min("o_custkey").cast("bigint").alias("cust_min"),
            F.max("o_custkey").cast("bigint").alias("cust_max"),
            dsum(F.col("o_totalprice")).alias("price_sum"),
        )
        .orderBy("zbucket")
    )


@query("q165_compacted_rollup")
def q165_compacted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q159's serve after COMPACTION (the q153 device: same pipeline,
    the maintenance operation inserted mid-stream, certified by the
    same oracle): build + two folds, compact_rollup collapses the
    slice census to one, a third fold lands beside the compacted
    slice, and the serve must still hash-match the from-scratch
    full-fact aggregate. Registered with q159's exact oracle below —
    equal by construction is the claim, the shared hash is the proof.

    The split differs from q159 only in where the third batch ends:
    build <'d', folds 'd','e' → compact → fold 'f'."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        RollupSpec,
        append_rollup,
        build_rollup,
        compact_rollup,
        fold_concurrently,
        read_rollup,
    )

    li = load_table(spark, sf_dir, "lineitem")
    hex1 = F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 1)
    spec = RollupSpec(
        keys=("l_suppkey",),
        measures={"l_quantity": 2, "l_extendedprice": 2},
        extrema=("l_shipdate",),
    )
    path = _per_app_path(spark, sf_dir, "morphl_rollup_compact")
    build_rollup(li.filter(hex1 < "d"), spec, path)
    # independent delta folds overlapped (guide §2.6; round 13); the
    # compaction waits for both commits
    fold_concurrently(
        lambda: append_rollup(li.filter(hex1 == "d"), path, sid="batch-d"),
        lambda: append_rollup(li.filter(hex1 == "e"), path, sid="batch-e"),
    )
    compact_rollup(spark, path)
    append_rollup(li.filter(hex1 == "f"), path, sid="batch-f")
    served = read_rollup(spark, path)
    # pinned_order A/B'd here and NOT kept: repeat in-session
    # invocations of the build+compact+append pipeline are too
    # unstable to measure the tail (3-43 s swings), and the summary
    # serve's post-shuffle segment is one |groups|-sized final agg
    # anyway (same reason as q159; tools/ab_pinsort.py, round 14)
    return served.select(
        "l_suppkey",
        "n_rows",
        F.col("l_quantity_sum").alias("qty_sum"),
        F.col("l_quantity_avg").alias("qty_avg"),
        F.col("l_extendedprice_sum").alias("price_sum"),
        F.col("l_extendedprice_avg").alias("price_avg"),
        F.col("l_shipdate_min").alias("ship_min"),
        F.col("l_shipdate_max").alias("ship_max"),
    ).orderBy("l_suppkey")


# equal by construction => q159's oracle certifies the compacted form
from morphl_community_edition_spark.queries import ORACLE_SQL as _ORACLE_SQL  # noqa: E402

_ORACLE_SQL["q165_compacted_rollup"] = _ORACLE_SQL["q159_incremental_rollup"]


def _zorder_orders_layout(spark: SparkSession, sf_dir: str) -> str:
    """Build-if-missing the z-clustered orders layout shared by the
    z-order serve queries (q166/q167): clustered on (customer,
    order-day), memoized per (session, sf_dir) like every persisted
    structure. bucket_bits lives in the layout's sidecar from here on."""
    import os as _os

    from morphl_community_edition_spark.operators.zorder import zorder_layout

    path = _per_app_path(spark, sf_dir, "morphl_zorder_orders")
    if not _os.path.isdir(path):
        o = load_table(spark, sf_dir, "orders")
        zorder_layout(
            o,
            F.pmod(F.col("o_custkey"), F.lit(65536)),
            F.pmod(
                F.datediff(
                    F.col("o_orderdate").cast("date"), F.lit(_Z_EPOCH).cast("date")
                ),
                F.lit(65536),
            ),
            path,
            bucket_bits=14,
        )
    return path


@query(
    "q166_zorder_serve",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           {sql_dsum('o_totalprice')} AS price_sum,
           min(CAST(o_orderdate AS DATE)) AS d_min,
           max(CAST(o_orderdate AS DATE)) AS d_max
    FROM orders
    WHERE o_custkey >= 100 AND o_custkey < 200
    """,
)
def q166_zorder_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The z-order layout ROUND-TRIP (q164 certifies the projection;
    this serves FROM the layout): orders written once z-clustered on
    (customer, order-day) — memoized per (session, sf_dir) like every
    persisted structure — then a customer-range query runs against
    the layout and must hash-match the same predicate over the raw
    table. The customer range maps to a minority of z-buckets
    (operators/zorder locality), so the scan's partition filter
    prunes most directories; the plan gate in tests/test_plans.py
    asserts the pruning, this oracle certifies the values.

    Scale shape: serve = one pruned scan + hash agg; the layout write
    (one key-ranged shuffle) is the amortized ingest cost, exactly
    like the q134/q150/q151 index builds."""
    from morphl_community_edition_spark.operators.zorder import (
        layout_bucket_bits,
        zbuckets_for_x_range,
    )

    path = _zorder_orders_layout(spark, sf_dir)
    back = spark.read.parquet(path)
    # driver-computed LITERAL bucket list (the point_lookup/BM25
    # static-pruning device): a provable superset of the buckets any
    # custkey in [100, 200) can land in — the partition filter prunes
    # the other directories at plan time, no DPP subquery. bucket_bits
    # comes from the layout's sidecar, never a caller constant — a
    # mismatched constant is silent row loss (r11 advice item)
    buckets = zbuckets_for_x_range(100, 200, bucket_bits=layout_bucket_bits(path))
    return (
        back.filter(
            F.col("zbucket").isin(buckets)
            & (F.col("o_custkey") >= 100)
            & (F.col("o_custkey") < 200)
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_custs"),
            dsum(F.col("o_totalprice")).alias("price_sum"),
            F.min(F.col("o_orderdate").cast("date")).alias("d_min"),
            F.max(F.col("o_orderdate").cast("date")).alias("d_max"),
        )
    )


# q167 rectangle: customers [100, 1000) × order-days [1996-01-01,
# 1997-01-01) — selective on BOTH dimensions, so bucket pruning alone
# leaves row groups on the table and the z-range tier has work to do.
_Q167_X = (100, 1000)
_Q167_DATES = ("1996-01-01", "1997-01-01")


@query(
    "q167_zorder_rect_serve",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           {sql_dsum('o_totalprice')} AS price_sum,
           min(CAST(o_orderdate AS DATE)) AS d_min,
           max(CAST(o_orderdate AS DATE)) AS d_max
    FROM orders
    WHERE o_custkey >= {_Q167_X[0]} AND o_custkey < {_Q167_X[1]}
      AND CAST(o_orderdate AS DATE) >= DATE '{_Q167_DATES[0]}'
      AND CAST(o_orderdate AS DATE) <  DATE '{_Q167_DATES[1]}'
    """,
)
def q167_zorder_rect_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rectangular-predicate serving from the z-order layout — the
    round-11 verdict's one named skip-factor gap (#8), closed: the
    2-d rectangle (customer range × order-date range) is decomposed
    driver-side into z-value intervals (operators/zorder.
    z_ranges_for_rect — Orenstein-Merrett descent, BIGMIN/LITMAX
    endpoints), which prune at BOTH tiers with zero new reader
    machinery:

    - bucket tier: ``zbucket IN (...)`` literal list derived from the
      intervals → static partition pruning (directories never listed);
    - row-group tier: ``z BETWEEN`` disjuncts → parquet min/max stat
      skipping inside surviving buckets (the layout sorts by z within
      every partition, so row-group z-spans are tight).

    The exact x/y predicate is re-applied on top (the interval list
    may be a superset under the max_depth/max_ranges valves), and the
    oracle certifies the values against the raw table. The plan gate
    + footer-level row-group skip measurement live in
    tests/test_maintenance_ops.py (test_zorder_rect_* family).

    Scale shape: serve cost is O(selected bytes) — the rectangle's
    selectivity in EACH dimension multiplies, which is the entire
    point of the multi-dimensional layout at 100 TB."""
    from datetime import date as _date

    from morphl_community_edition_spark.operators.zorder import (
        layout_bucket_bits,
        z_range_predicate,
        z_ranges_for_rect,
        zbuckets_for_ranges,
    )

    path = _zorder_orders_layout(spark, sf_dir)
    epoch = _date.fromisoformat(_Z_EPOCH)
    y_lo = (_date.fromisoformat(_Q167_DATES[0]) - epoch).days
    y_hi = (_date.fromisoformat(_Q167_DATES[1]) - epoch).days
    ranges = z_ranges_for_rect(_Q167_X[0], _Q167_X[1], y_lo, y_hi)
    buckets = zbuckets_for_ranges(ranges, layout_bucket_bits(path))
    back = spark.read.parquet(path)
    od = F.col("o_orderdate").cast("date")
    return (
        back.filter(
            F.col("zbucket").isin(buckets)
            & z_range_predicate(ranges, F.col("z"))
            & (F.col("o_custkey") >= _Q167_X[0])
            & (F.col("o_custkey") < _Q167_X[1])
            & (od >= F.lit(_Q167_DATES[0]).cast("date"))
            & (od < F.lit(_Q167_DATES[1]).cast("date"))
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_custs"),
            dsum(F.col("o_totalprice")).alias("price_sum"),
            F.min(od).alias("d_min"),
            F.max(od).alias("d_max"),
        )
    )


# ---------------------------------------------------------------------------
# q168: mergeable-quantile (histogram) rollup — the quantile member of
# the sketch-rollup family (q160 covers distinct counts; quantiles
# need their own mergeable state). The state is an exact value
# histogram over a QUANTIZED domain (the PSI-bin device as the
# bounded-state valve), so unlike KLL/t-digest the served percentile
# is hash-exact against DuckDB's quantile_disc over the identically
# quantized value.
# ---------------------------------------------------------------------------

_Q168_PCTS = {"p50": (1, 2), "p90": (9, 10), "p99": (99, 100)}
_Q168_SCALE = -2  # hundred-dollar price grid: bounded histogram state


def _q168_oracle() -> str:
    from morphl_community_edition_spark.functions.rounding import sql_scaled_long

    v = sql_scaled_long("l_extendedprice", _Q168_SCALE)
    cols = ",\n           ".join(
        f"CAST(quantile_disc({v}, {num}/{den}) AS BIGINT) AS {name}"
        for name, (num, den) in _Q168_PCTS.items()
    )
    return f"""
    SELECT l_suppkey,
           CAST(count(*) AS BIGINT) AS n_rows,
           {cols}
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY l_suppkey
    """


@query("q168_quantile_rollup", oracle=_q168_oracle())
def q168_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier price percentiles served from a persisted
    MERGEABLE-QUANTILE rollup (round 12): the fact table is split by
    md5(l_orderkey) into an initial build plus two delta folds (the
    q159 replay device); each fold persists an exact value-histogram
    slice over the hundred-dollar price grid
    (operators/incremental_agg.HistSpec, scale −2 — the quantization
    valve that bounds state for a continuous domain); the serve
    merges committed slices and extracts p50/p90/p99 by exact integer
    rank arithmetic (rank = ceil(p·n), percentile_disc semantics).
    The oracle computes quantile_disc over the identically quantized
    value on the FULL fact table — hash-equality proves
    fold-merge == recompute for quantiles, which no summable state
    could show (quantiles are not a sum; histograms are).

    Scale shape: folds cost O(|delta|) with map-side combine into
    |grid×groups|-bounded slices; the serve's window runs over
    histogram rows only (grid-bounded per group), never fact rows;
    the fact table is read once per fold, never at serve."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        HistSpec,
        append_hist_rollup,
        build_hist_rollup,
        fold_concurrently,
        quantiles_from_hist,
    )

    li = load_table(spark, sf_dir, "lineitem")
    hex1 = F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 1)
    spec = HistSpec(keys=("l_suppkey",), value="l_extendedprice", scale=_Q168_SCALE)
    path = _per_app_path(spark, sf_dir, "morphl_hist_rollup")
    build_hist_rollup(li.filter(hex1 < "e"), spec, path)
    # independent delta folds overlapped (guide §2.6; round 13)
    fold_concurrently(
        lambda: append_hist_rollup(li.filter(hex1 == "e"), path, sid="batch-e"),
        lambda: append_hist_rollup(li.filter(hex1 == "f"), path, sid="batch-f"),
    )
    from morphl_community_edition_spark.plans.hints import pinned_order

    # group-bounded serve result; pin before the presentation sort so
    # range-boundary sampling does not re-execute the histogram merge
    # + cumulative window (plans/hints.pinned_order, round 14)
    return pinned_order(quantiles_from_hist(spark, path, _Q168_PCTS), "l_suppkey")


_Q169_K = 3


@query(
    "q169_hist_topk_serve",
    oracle=f"""
    WITH h AS (
      SELECT l_suppkey,
             CAST(floor(l_extendedprice * 1e-2 + 0.5) AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2),
    r AS (SELECT l_suppkey, v, cnt,
                 row_number() OVER (PARTITION BY l_suppkey
                                    ORDER BY cnt DESC, v ASC) AS rk
          FROM h)
    SELECT l_suppkey, CAST(rk AS INTEGER) AS rk, v, cnt
    FROM r WHERE rk <= {_Q169_K}
    ORDER BY l_suppkey, rk
    """,
)
def q169_hist_topk_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second serve shape over q168's persisted histogram (round 12):
    the {k} dominant price points per supplier — mode/top-value
    queries answered from the SAME |grid×groups| state the quantile
    reader uses, no fact re-read and no new structure. One persisted
    histogram, many serve shapes (quantiles, modes, top-k, range
    mass) is the materialization argument made concrete; the oracle
    recomputes the top-k from the raw fact table with the identical
    deterministic tie-break (count desc, value asc), so hash-equality
    proves the persisted state serves exact answers, not summaries.

    Scale shape: the serve is one row_number window over histogram
    rows (grid-bounded per group); the heavy fact pass was paid once
    at q168's build/folds."""
    import os as _os

    from morphl_community_edition_spark.operators.incremental_agg import (
        HistSpec,
        append_hist_rollup,
        build_hist_rollup,
        fold_concurrently,
        topk_values_from_hist,
    )

    li = load_table(spark, sf_dir, "lineitem")
    hex1 = F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 1)
    spec = HistSpec(keys=("l_suppkey",), value="l_extendedprice", scale=_Q168_SCALE)
    path = _per_app_path(spark, sf_dir, "morphl_hist_rollup")
    if not _os.path.isdir(path):
        build_hist_rollup(li.filter(hex1 < "e"), spec, path)
        fold_concurrently(
            lambda: append_hist_rollup(li.filter(hex1 == "e"), path, sid="batch-e"),
            lambda: append_hist_rollup(li.filter(hex1 == "f"), path, sid="batch-f"),
        )
    # pinned_order A/B'd here and NOT kept: unlike the quantile
    # readers there is no agg after the rank window (the filter is
    # free), so the re-executed segment is short — contradictory
    # swings across clean sessions = wash (tools/ab_pinsort.py, r14)
    return topk_values_from_hist(spark, path, _Q169_K).orderBy("l_suppkey", "rk")


@query(
    "q170_rollup_view_match",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_rows,
           {sql_dsum('l.l_extendedprice')} AS price_sum,
           {sql_davg('l.l_extendedprice')} AS price_avg,
           min(l.l_shipdate) AS ship_min,
           max(l.l_shipdate) AS ship_max
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1 ORDER BY nation
    """,
)
def q170_rollup_view_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View-MATCHED serving (round 12): a nation-grain revenue rollup
    answered from the persisted SUPPLIER-grain states of the q159
    rollup — the Larson-Zhou view-matching claim in
    operators/incremental_agg's docstring, executed. The coarser key
    (nation) is a function of the stored key through the supplier dim,
    so the serve is: read the |suppliers|-sized states, broadcast-join
    the supplier→nation attribute, and run ONE more monoid merge at
    the coarser grain — sums re-add, counts re-add, extrema
    re-extremize. The fact table is never touched at serve; the
    oracle recomputes nation revenue from the raw fact join, so
    hash-equality proves coarsening-from-states == recompute.

    Scale shape at 100 TB: every nightly dashboard grain (nation,
    region, week, band) is served from ONE maintained fine-grain
    state table by |groups|-sized merges — the reason a warehouse
    maintains the finest useful grain instead of one rollup per
    dashboard."""
    import os as _os

    from morphl_community_edition_spark.operators.incremental_agg import (
        RollupSpec,
        append_rollup,
        build_rollup,
        fold_concurrently,
        read_rollup,
        rollup_spec,
        rollup_view_match_frame,
    )
    from morphl_community_edition_spark.catalog import table_path
    from morphl_community_edition_spark.plans.hints import (
        broadcast_if_small,
        dataset_file_bytes,
    )

    li = load_table(spark, sf_dir, "lineitem")
    hex1 = F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 1)
    spec = RollupSpec(
        keys=("l_suppkey",),
        measures={"l_extendedprice": 2},
        extrema=("l_shipdate",),
    )
    path = _per_app_path(spark, sf_dir, "morphl_vm_rollup")
    if not _os.path.isdir(path):
        build_rollup(li.filter(hex1 < "e"), spec, path)
        # independent delta folds overlapped (guide §2.6; round 13)
        fold_concurrently(
            lambda: append_rollup(li.filter(hex1 == "e"), path, sid="batch-e"),
            lambda: append_rollup(li.filter(hex1 == "f"), path, sid="batch-f"),
        )
    states = read_rollup(spark, path, finalize=False)
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("nation")
    )
    dim = broadcast_if_small(
        supp.join(nat, "s_nationkey"),
        dataset_file_bytes(table_path(sf_dir, "supplier")),
    )
    joined = states.join(dim, "l_suppkey")
    out = rollup_view_match_frame(joined, rollup_spec(path), {"nation": F.col("nation")})
    # pinned_order A/B'd here and NOT kept: the |nations|-sized tail
    # above the sort is one regroup agg — measured dead wash (+0.2%,
    # tools/ab_pinsort.py, round 14)
    return out.select(
        "nation",
        "n_rows",
        F.col("l_extendedprice_sum").alias("price_sum"),
        F.col("l_extendedprice_avg").alias("price_avg"),
        F.col("l_shipdate_min").alias("ship_min"),
        F.col("l_shipdate_max").alias("ship_max"),
    ).orderBy("nation")


@query(
    "q171_rollup_grain_lattice",
    oracle=f"""
    SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           CAST(quarter(l_shipdate) AS INTEGER) AS ship_quarter,
           CAST(count(*) AS BIGINT) AS n_rows,
           {sql_dsum('l_extendedprice')} AS price_sum,
           {sql_davg('l_extendedprice')} AS price_avg,
           min(l_shipdate) AS ship_min,
           max(l_shipdate) AS ship_max
    FROM lineitem
    GROUP BY 1, 2 ORDER BY ship_year, ship_quarter
    """,
)
def q171_rollup_grain_lattice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-grain lattice serving (round 13, verdict r12 #6): q170
    proved the dim-join coarsening (supplier → nation); this query
    proves the DATE-TRUNCATION coarsening the same states support —
    the grain-lattice walk a warehouse runs nightly. The maintained
    fine grain is (l_suppkey, ship_month = month-truncated shipdate);
    the serve regroups those states to (year, quarter) with key
    expressions that are pure functions of the stored month key —
    quarter(month(d)) == quarter(d) and year(month(d)) == year(d)
    because truncation to a coarser calendar grain factors through
    every finer one. One monoid merge over |suppliers × months| state
    rows answers the quarter dashboard; the fact table is read only
    at build/fold time (plan-gated in
    tests/test_plans.py::test_q171_grain_lattice_serves_from_states).

    Scale shape at 100 TB: the month fine grain is the finest grain
    the dashboards need, so its state table is |suppliers × months| —
    ~10⁶ rows per decade at 10⁵ suppliers, KB-scale vs the fact's TB —
    and every coarser time grain (quarter, year) plus every dim grain
    (nation via q170's join device) serves from the same structure
    with a |states|-sized merge."""
    import os as _os

    from morphl_community_edition_spark.operators.incremental_agg import (
        RollupSpec,
        append_rollup,
        build_rollup,
        fold_concurrently,
        rollup_view_match,
    )

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_month", F.date_trunc("month", F.col("l_shipdate")).cast("date")
    )
    hex1 = F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 1)
    spec = RollupSpec(
        keys=("l_suppkey", "ship_month"),
        measures={"l_extendedprice": 2},
        extrema=("l_shipdate",),
    )
    path = _per_app_path(spark, sf_dir, "morphl_grain_rollup")
    if not _os.path.isdir(path):
        build_rollup(li.filter(hex1 < "e"), spec, path)
        # independent delta folds overlapped (guide §2.6; round 13)
        fold_concurrently(
            lambda: append_rollup(li.filter(hex1 == "e"), path, sid="batch-e"),
            lambda: append_rollup(li.filter(hex1 == "f"), path, sid="batch-f"),
        )
    out = rollup_view_match(
        spark,
        path,
        {
            "ship_year": F.year("ship_month").cast("int"),
            "ship_quarter": F.quarter("ship_month").cast("int"),
        },
    )
    return out.select(
        "ship_year",
        "ship_quarter",
        "n_rows",
        F.col("l_extendedprice_sum").alias("price_sum"),
        F.col("l_extendedprice_avg").alias("price_avg"),
        F.col("l_shipdate_min").alias("ship_min"),
        F.col("l_shipdate_max").alias("ship_max"),
    ).orderBy("ship_year", "ship_quarter")


@query(
    "q172_rollup_lattice_cross",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
           CAST(quarter(l.l_shipdate) AS INTEGER) AS ship_quarter,
           CAST(count(*) AS BIGINT) AS n_rows,
           {sql_dsum('l.l_extendedprice')} AS price_sum,
           {sql_davg('l.l_extendedprice')} AS price_avg
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1, 2, 3 ORDER BY nation, ship_year, ship_quarter
    """,
)
def q172_rollup_lattice_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CROSS-grain lattice serve (round 13): nation × quarter —
    a dim coarsening (q170's supplier→nation broadcast join) AND a
    time coarsening (q171's month→quarter key expression) applied to
    the SAME persisted (l_suppkey, ship_month) states in one
    view-matched merge. This is the full Larson-Zhou claim: any
    grouping in the lattice ABOVE the maintained grain — dim
    attribute, calendar truncation, or their product — is one
    |states|-sized merge away; the warehouse maintains exactly one
    fine-grain table for the whole dashboard family. q171 and this
    query deliberately share the persisted structure (same
    _per_app_path name): one build, many serve shapes, like the
    q168/q169 histogram pair.

    Scale shape at 100 TB: the dim join touches |suppliers × months|
    state rows against a broadcast supplier→nation map; the merge
    output is |nations × quarters| — both dashboard-sized. The fact
    table is read only at build/fold (plan-gated:
    tests/test_plans.py::test_q172_cross_lattice_serves_from_states)."""
    import os as _os

    from morphl_community_edition_spark.operators.incremental_agg import (
        RollupSpec,
        append_rollup,
        build_rollup,
        fold_concurrently,
        read_rollup,
        rollup_spec,
        rollup_view_match_frame,
    )
    from morphl_community_edition_spark.catalog import table_path
    from morphl_community_edition_spark.plans.hints import (
        broadcast_if_small,
        dataset_file_bytes,
    )

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_month", F.date_trunc("month", F.col("l_shipdate")).cast("date")
    )
    hex1 = F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 1)
    spec = RollupSpec(
        keys=("l_suppkey", "ship_month"),
        measures={"l_extendedprice": 2},
        extrema=("l_shipdate",),
    )
    path = _per_app_path(spark, sf_dir, "morphl_grain_rollup")  # shared with q171
    if not _os.path.isdir(path):
        build_rollup(li.filter(hex1 < "e"), spec, path)
        # independent delta folds overlapped (guide §2.6; round 13)
        fold_concurrently(
            lambda: append_rollup(li.filter(hex1 == "e"), path, sid="batch-e"),
            lambda: append_rollup(li.filter(hex1 == "f"), path, sid="batch-f"),
        )
    states = read_rollup(spark, path, finalize=False)
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("nation")
    )
    dim = broadcast_if_small(
        supp.join(nat, "s_nationkey"),
        dataset_file_bytes(table_path(sf_dir, "supplier")),
    )
    out = rollup_view_match_frame(
        states.join(dim, "l_suppkey"),
        rollup_spec(path),
        {
            "nation": F.col("nation"),
            "ship_year": F.year("ship_month").cast("int"),
            "ship_quarter": F.quarter("ship_month").cast("int"),
        },
    )
    return out.select(
        "nation",
        "ship_year",
        "ship_quarter",
        "n_rows",
        F.col("l_extendedprice_sum").alias("price_sum"),
        F.col("l_extendedprice_avg").alias("price_avg"),
    ).orderBy("nation", "ship_year", "ship_quarter")


def _q173_oracle() -> str:
    from morphl_community_edition_spark.functions.rounding import sql_scaled_long

    v = sql_scaled_long("l.l_extendedprice", _Q168_SCALE)
    cols = ",\n           ".join(
        f"CAST(quantile_disc({v}, {num}/{den}) AS BIGINT) AS {name}"
        for name, (num, den) in _Q168_PCTS.items()
    )
    return f"""
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_rows,
           {cols}
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1
    ORDER BY nation
    """


@query("q173_hist_view_match", oracle=_q173_oracle())
def q173_hist_view_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View-matched QUANTILES (round 13): nation-grain price
    percentiles served from the SUPPLIER-grain histogram states of
    the q168 rollup — the q170 dim-coarsening device applied to the
    quantile member. Sums/counts/extrema coarsen trivially (q170–
    q172); quantiles cannot (a quantile is not a monoid) — but the
    HISTOGRAM is: per-value counts over a shared quantized grid
    re-add under any key coarsening, so the nation histogram is one
    |grid×suppliers|-sized merge (operators/incremental_agg.
    hist_view_match) and the identical integer rank arithmetic then
    extracts p50/p90/p99. The oracle recomputes quantile_disc over
    the identically quantized value on the raw three-table join —
    hash-equality proves coarsen-then-rank == recompute.

    Scale shape at 100 TB: the dim join touches histogram rows (grid-
    bounded per supplier), the merge output is |grid×nations|, and the
    fact table is read only at q168's build/folds — one maintained
    fine-grain histogram answers every dashboard grain's percentile
    question (plan-gated: tests/test_plans.py::
    test_q173_hist_view_match_serves_from_states)."""
    import os as _os

    from morphl_community_edition_spark.operators.incremental_agg import (
        HistSpec,
        append_hist_rollup,
        build_hist_rollup,
        fold_concurrently,
        hist_view_match,
        quantiles_from_hist_frame,
        read_hist,
    )
    from morphl_community_edition_spark.catalog import table_path
    from morphl_community_edition_spark.plans.hints import (
        broadcast_if_small,
        dataset_file_bytes,
    )

    li = load_table(spark, sf_dir, "lineitem")
    hex1 = F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 1)
    spec = HistSpec(keys=("l_suppkey",), value="l_extendedprice", scale=_Q168_SCALE)
    path = _per_app_path(spark, sf_dir, "morphl_hist_rollup")  # shared with q168/q169
    if not _os.path.isdir(path):
        build_hist_rollup(li.filter(hex1 < "e"), spec, path)
        fold_concurrently(
            lambda: append_hist_rollup(li.filter(hex1 == "e"), path, sid="batch-e"),
            lambda: append_hist_rollup(li.filter(hex1 == "f"), path, sid="batch-f"),
        )
    states = read_hist(spark, path)
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("nation")
    )
    dim = broadcast_if_small(
        supp.join(nat, "s_nationkey"),
        dataset_file_bytes(table_path(sf_dir, "supplier")),
    )
    coarse = hist_view_match(
        states.join(dim, "l_suppkey"), {"nation": F.col("nation")}
    )
    return quantiles_from_hist_frame(coarse, ("nation",), _Q168_PCTS).orderBy("nation")


_Q174_BANDS = {"lo_band": (None, 200), "mid_band": (200, 500), "hi_band": (500, None)}


def _q174_oracle() -> str:
    from morphl_community_edition_spark.functions.rounding import sql_scaled_long

    v = sql_scaled_long("l_extendedprice", _Q168_SCALE)
    cols = []
    for name, (lo, hi) in _Q174_BANDS.items():
        conds = []
        if lo is not None:
            conds.append(f"{v} >= {lo}")
        if hi is not None:
            conds.append(f"{v} < {hi}")
        cond = " AND ".join(conds) or "TRUE"
        cols.append(
            f"CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS {name}"
        )
    bands = ",\n           ".join(cols)
    return f"""
    SELECT l_suppkey,
           CAST(count(*) AS BIGINT) AS n_rows,
           {bands}
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY l_suppkey
    """


@query("q174_hist_range_mass", oracle=_q174_oracle())
def q174_hist_range_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FOURTH serve shape over the q168 persisted histogram
    (round 13): per-supplier row mass inside price bands — the
    "value-range mass query" the histogram module's docstring has
    claimed since round 12, now executed and oracle-checked. Bands
    are half-open intervals on the quantized hundred-dollar grid
    (BIGINT compares, no float boundaries); the oracle recomputes the
    same bands with CASE sums over the identically quantized raw
    fact, so hash-equality proves band-mass-from-states == recompute.
    With q168 (quantiles), q169 (top-k/modes), and q173 (view-matched
    coarser-grain quantiles), one maintained |grid×groups| state now
    demonstrably serves four distinct dashboard shapes.

    Scale shape: one conditional-sum aggregate over histogram rows —
    grid-bounded per supplier, never fact rows; no window, no
    shuffle beyond the |states|-sized merge (plan-gated:
    tests/test_plans.py::test_q174_range_mass_serves_from_histogram)."""
    import os as _os

    from morphl_community_edition_spark.operators.incremental_agg import (
        HistSpec,
        append_hist_rollup,
        build_hist_rollup,
        fold_concurrently,
        range_mass_from_hist,
    )

    li = load_table(spark, sf_dir, "lineitem")
    hex1 = F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 1)
    spec = HistSpec(keys=("l_suppkey",), value="l_extendedprice", scale=_Q168_SCALE)
    path = _per_app_path(spark, sf_dir, "morphl_hist_rollup")  # shared with q168/q169/q173
    if not _os.path.isdir(path):
        build_hist_rollup(li.filter(hex1 < "e"), spec, path)
        fold_concurrently(
            lambda: append_hist_rollup(li.filter(hex1 == "e"), path, sid="batch-e"),
            lambda: append_hist_rollup(li.filter(hex1 == "f"), path, sid="batch-f"),
        )
    return range_mass_from_hist(spark, path, _Q174_BANDS).orderBy("l_suppkey")


def _q175_oracle() -> str:
    from morphl_community_edition_spark.functions.rounding import sql_scaled_long

    v = sql_scaled_long("l_extendedprice", _Q168_SCALE)
    cols = ",\n           ".join(
        f"CAST(quantile_disc({v}, {num}/{den}) AS BIGINT) AS {name}"
        for name, (num, den) in _Q168_PCTS.items()
    )
    return f"""
    SELECT l_suppkey,
           CAST(count(*) AS BIGINT) AS n_rows,
           {cols}
    FROM lineitem
    WHERE substr(md5(CAST(l_orderkey AS VARCHAR)), 2, 1) <> '0'
    GROUP BY l_suppkey
    ORDER BY l_suppkey
    """


@query("q175_hist_retraction", oracle=_q175_oracle())
def q175_hist_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT RETRACTION on the maintained quantile histogram
    (round 13) — the correction fold the append-only rollup contract
    cannot express. The full fact table is folded in (q168's
    build + two delta batches), then a correction batch — every row
    with md5(l_orderkey) hex digit 2 = '0', ~1/16 of the fact,
    standing in for a bad upstream load being backed out — is
    RETRACTED (operators/incremental_agg.retract_hist_rollup: a slice
    of negated per-value counts; counts form an abelian group, so the
    inverse element is a fold, not a rebuild). compact_rollup then
    merges the five slices into one, physically dropping net-zero
    rows (the kind-dispatched histogram compaction, also round 13).
    Serving p50/p90/p99 per supplier from the compacted state must
    hash-match DuckDB's quantile_disc over the fact table WITH THE
    CORRECTION PREDICATE APPLIED — proving fold∘retract∘compact ==
    recompute-on-corrected-fact, extremes and all, with the fact
    never re-read.

    Scale shape: the retraction costs O(|correction batch|) with
    map-side combine — at 100 TB a correction touches the states it
    maps to, not the warehouse; compaction is |grid×groups|-bounded;
    the serve window runs over histogram rows only (plan-gated:
    tests/test_plans.py::test_q175_retraction_serves_from_histogram)."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        HistSpec,
        append_hist_rollup,
        build_hist_rollup,
        fold_concurrently,
        compact_rollup,
        quantiles_from_hist,
        retract_hist_rollup,
    )

    li = load_table(spark, sf_dir, "lineitem")
    md5 = F.md5(F.col("l_orderkey").cast("string"))
    hex1, hex2 = F.substring(md5, 1, 1), F.substring(md5, 2, 1)
    spec = HistSpec(keys=("l_suppkey",), value="l_extendedprice", scale=_Q168_SCALE)
    path = _per_app_path(spark, sf_dir, "morphl_hist_retract")
    build_hist_rollup(li.filter(hex1 < "e"), spec, path)
    # independent delta folds overlapped (guide §2.6; round 13); the
    # retraction waits for both — fold_concurrently returns only after
    # both sids' manifests are committed
    fold_concurrently(
        lambda: append_hist_rollup(li.filter(hex1 == "e"), path, sid="batch-e"),
        lambda: append_hist_rollup(li.filter(hex1 == "f"), path, sid="batch-f"),
    )
    retract_hist_rollup(li.filter(hex2 == "0"), path, sid="correction-0")
    compact_rollup(spark, path)
    from morphl_community_edition_spark.plans.hints import pinned_order

    # group-bounded serve result; pin before the presentation sort
    # (plans/hints.pinned_order, round 14)
    return pinned_order(quantiles_from_hist(spark, path, _Q168_PCTS), "l_suppkey")


_Q176_ASOF = {"p50_asof": (1, 2), "p90_asof": (9, 10)}
_Q176_NOW = {"p50_now": (1, 2), "p90_now": (9, 10)}


def _q176_oracle() -> str:
    from morphl_community_edition_spark.functions.rounding import sql_scaled_long

    v = sql_scaled_long("l_extendedprice", _Q168_SCALE)

    def tier(pcts: dict, n_name: str, where: str) -> str:
        cols = ",\n                 ".join(
            f"CAST(quantile_disc({v}, {num}/{den}) AS BIGINT) AS {name}"
            for name, (num, den) in pcts.items()
        )
        return f"""SELECT l_suppkey, CAST(count(*) AS BIGINT) AS {n_name},
                 {cols}
          FROM lineitem{where}
          GROUP BY l_suppkey"""

    asof = tier(_Q176_ASOF, "n_asof", "")
    now = tier(
        _Q176_NOW,
        "n_now",
        "\n          WHERE substr(md5(CAST(l_orderkey AS VARCHAR)), 2, 1) <> '0'",
    )
    return f"""
    SELECT a.l_suppkey, a.n_asof, a.p50_asof, a.p90_asof,
           b.n_now, b.p50_now, b.p90_now
    FROM ({asof}) a
    JOIN ({now}) b ON a.l_suppkey = b.l_suppkey
    ORDER BY a.l_suppkey
    """


@query("q176_hist_time_travel", oracle=_q176_oracle())
def q176_hist_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT-PINNED (time-travel) serving on the maintained
    histogram (round 13): the audit read a correction pipeline owes
    its consumers. The full fact folds in (q168's build + two
    batches); hist_snapshot PINS the committed slice set; then a
    correction batch (md5 hex-2 = '0', the q175 device) is RETRACTED
    and the rollup is compacted with ``gc=False`` — the compaction
    cuts live reads over atomically but RETAINS the tombstoned slice
    files (the Delta/Iceberg retention-window split: logical compact
    now, physical vacuum_rollup later). One result frame joins the
    PINNED serve (exactly what a dashboard read before the correction
    — the uncorrected fact's quantiles) against the LIVE serve (the
    corrected fact's) per supplier; the oracle recomputes both tiers
    from the raw fact with and without the correction predicate, so
    one hash certifies snapshot isolation AND correction visibility
    simultaneously — before/after answers from ONE state, no fact
    re-read, both exact.

    Scale shape: both serves are |grid×groups|-bounded histogram
    reads (the pinned one over the retained pre-compaction slices,
    the live one over the compacted slice); the join is
    |groups|-sized. Plan-gated to never touch the fact table:
    tests/test_plans.py::test_q176_time_travel_serves_from_histogram."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        HistSpec,
        append_hist_rollup,
        build_hist_rollup,
        fold_concurrently,
        compact_rollup,
        hist_snapshot,
        quantiles_from_hist,
        retract_hist_rollup,
    )

    li = load_table(spark, sf_dir, "lineitem")
    md5 = F.md5(F.col("l_orderkey").cast("string"))
    hex1, hex2 = F.substring(md5, 1, 1), F.substring(md5, 2, 1)
    spec = HistSpec(keys=("l_suppkey",), value="l_extendedprice", scale=_Q168_SCALE)
    path = _per_app_path(spark, sf_dir, "morphl_hist_timetravel")
    build_hist_rollup(li.filter(hex1 < "e"), spec, path)
    # independent delta folds overlapped (guide §2.6; round 13); the
    # snapshot pin waits for both commits
    fold_concurrently(
        lambda: append_hist_rollup(li.filter(hex1 == "e"), path, sid="batch-e"),
        lambda: append_hist_rollup(li.filter(hex1 == "f"), path, sid="batch-f"),
    )
    snap = hist_snapshot(path)  # pin BEFORE the correction lands
    retract_hist_rollup(li.filter(hex2 == "0"), path, sid="correction-0")
    compact_rollup(spark, path, gc=False)  # retain the pinned slices
    asof = quantiles_from_hist(spark, path, _Q176_ASOF, sids=snap).withColumnRenamed(
        "n_rows", "n_asof"
    )
    now = quantiles_from_hist(spark, path, _Q176_NOW).withColumnRenamed(
        "n_rows", "n_now"
    )
    return asof.join(now, "l_suppkey").orderBy("l_suppkey")


@query(
    "q177_rollup_retraction",
    oracle=f"""
    SELECT l_suppkey,
           CAST(count(*) AS BIGINT) AS n_rows,
           {sql_dsum('l_quantity')} AS qty_sum,
           {sql_davg('l_quantity')} AS qty_avg,
           {sql_dsum('l_extendedprice')} AS price_sum,
           {sql_davg('l_extendedprice')} AS price_avg
    FROM lineitem
    WHERE substr(md5(CAST(l_orderkey AS VARCHAR)), 2, 1) <> '0'
    GROUP BY l_suppkey
    ORDER BY l_suppkey
    """,
)
def q177_rollup_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correction fold on the SUMMARY rollup (round 13 — the
    Gupta-Mumick counting algorithm on partial-aggregate states):
    q159's supplier sales rollup, but sums/counts only (no extrema —
    retract_rollup refuses specs with min/max, which are not
    invertible; the histogram member q175 covers those). The full
    fact folds in, the q175 correction batch (md5 hex-2 = '0') is
    retracted as one negated-states slice, compaction garbage-collects
    the cancelled mass, and the served sums/averages must hash-match
    a from-scratch aggregate over the CORRECTED fact — exact to the
    last bit because the states are scaled integers (the rounding
    device), so subtraction is as lossless as addition.

    Scale shape: identical to q159's (the retraction IS an append
    fold with negated outputs — O(|correction|), |groups|-sized
    write); serve-plan-gated to never re-read the fact
    (tests/test_plans.py::test_q177_rollup_retraction_serves_from_states)."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        RollupSpec,
        append_rollup,
        build_rollup,
        compact_rollup,
        fold_concurrently,
        read_rollup,
        retract_rollup,
    )

    li = load_table(spark, sf_dir, "lineitem")
    md5 = F.md5(F.col("l_orderkey").cast("string"))
    hex1, hex2 = F.substring(md5, 1, 1), F.substring(md5, 2, 1)
    spec = RollupSpec(
        keys=("l_suppkey",),
        measures={"l_quantity": 2, "l_extendedprice": 2},
        extrema=(),
    )
    path = _per_app_path(spark, sf_dir, "morphl_rollup_retract")
    build_rollup(li.filter(hex1 < "e"), spec, path)
    # independent delta folds overlapped (guide §2.6; round 13); the
    # retraction waits for both commits
    fold_concurrently(
        lambda: append_rollup(li.filter(hex1 == "e"), path, sid="batch-e"),
        lambda: append_rollup(li.filter(hex1 == "f"), path, sid="batch-f"),
    )
    retract_rollup(li.filter(hex2 == "0"), path, sid="correction-0")
    compact_rollup(spark, path)
    served = read_rollup(spark, path)
    return served.select(
        "l_suppkey",
        "n_rows",
        F.col("l_quantity_sum").alias("qty_sum"),
        F.col("l_quantity_avg").alias("qty_avg"),
        F.col("l_extendedprice_sum").alias("price_sum"),
        F.col("l_extendedprice_avg").alias("price_avg"),
    ).orderBy("l_suppkey")


_Q178_K = 256
_Q178_PCTS = {"p50": (1, 2), "p90": (9, 10)}


def _q178_oracle() -> str:
    cols = ",\n           ".join(
        f"quantile_disc(v, {num}/{den}) AS {name}"
        for name, (num, den) in _Q178_PCTS.items()
    )
    return f"""
    WITH s AS (
      SELECT l_suppkey, l_extendedprice AS v,
             row_number() OVER (
               PARTITION BY l_suppkey
               ORDER BY md5(coalesce(md5(CAST(l_orderkey AS VARCHAR)), 'null') ||
                            coalesce(md5(CAST(l_linenumber AS VARCHAR)), 'null'))
             ) AS rn
      FROM lineitem)
    SELECT l_suppkey,
           CAST(count(*) AS BIGINT) AS n_rows,
           {cols}
    FROM s
    WHERE rn <= {_Q178_K}
    GROUP BY l_suppkey
    ORDER BY l_suppkey
    """


@query("q178_sample_quantile_rollup", oracle=_q178_oracle())
def q178_sample_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k SAMPLE rollup (round 13) — the bounded-state quantile
    member for domains the histogram's quantization valve cannot
    bound: per supplier, the k=256 fact rows with the smallest
    md5(orderkey|linenumber) rank form a deterministic min-wise
    uniform sample (Broder's min-hash construction used for value
    sampling); bottom-k is a mergeable monoid, so the build + two
    delta folds (the q159 replay device) serve the SAME sample as a
    one-shot pass. Percentile estimates are the exact percentile_disc
    of the sampled multiset over RAW double prices — no grid. Because
    the sampling rank is a row-identity hash, the sketch is fully
    REPLAYABLE: the oracle selects the identical 256 rows per group
    with one window and computes the identical quantiles —
    hash-certified, which no run-dependent sketch (KLL/t-digest/HLL)
    can offer. Accuracy vs the TRUE quantile is the uniform-sample
    O(1/sqrt(k)) bound, bound-tested against the exact histogram
    member (tests/test_maintenance_ops.py::
    test_sample_rollup_rank_accuracy_vs_exact).

    Scale shape: each fold's window is hash-partitioned per group over
    its delta only; every slice is <= k rows per group, the merge
    re-selects over n_slices*k rows per group — state and serve are
    k-bounded regardless of fact size or value-domain cardinality."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        SampleSpec,
        append_sample_rollup,
        build_sample_rollup,
        quantiles_from_sample,
    )

    li = load_table(spark, sf_dir, "lineitem")
    hex1 = F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 1)
    spec = SampleSpec(
        keys=("l_suppkey",),
        value="l_extendedprice",
        id_cols=("l_orderkey", "l_linenumber"),
        k=_Q178_K,
    )
    path = _per_app_path(spark, sf_dir, "morphl_sample_rollup")
    build_sample_rollup(li.filter(hex1 < "e"), spec, path)
    append_sample_rollup(li.filter(hex1 == "e"), path, sid="batch-e")
    append_sample_rollup(li.filter(hex1 == "f"), path, sid="batch-f")
    from morphl_community_edition_spark.plans.hints import pinned_order

    # group-bounded serve result; pin before the presentation sort
    # (plans/hints.pinned_order, round 14)
    return pinned_order(quantiles_from_sample(spark, path, _Q178_PCTS), "l_suppkey")

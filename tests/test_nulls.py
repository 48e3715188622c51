"""Null-semantics differential tests. The fixtures are null-free
(FIXTURES.md §2), so nulls only arise inside queries (outer joins) —
but the operator library claims null-correctness (SURVEY.md §2.2).
These tests build the SAME null-bearing tables in both engines from
literals and compare the sharp edges: aggregate null-skipping,
null-safe equality, NULLS FIRST/LAST ordering (the engines' ASC
defaults differ!), and outer-join null fabrication.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import canonicalize

ROWS = [
    (1, 10.0, "a"),
    (2, None, "b"),
    (3, 30.0, None),
    (4, None, None),
    (5, 50.0, "a"),
]
DUCK_VALUES = ", ".join(
    f"({k}, {v if v is not None else 'NULL'}, {repr(s) if s is not None else 'NULL'})"
    for k, v, s in ROWS
)


@pytest.fixture(scope="module")
def t(spark):
    return spark.createDataFrame(ROWS, "k int, v double, s string")


@pytest.fixture(scope="module")
def duck_t():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t(k, v, s) AS SELECT * FROM (VALUES {DUCK_VALUES})")
    return con


def _cmp(spark_df, duck_con, sql):
    g = canonicalize(spark_df.toPandas())
    w = canonicalize(duck_con.execute(sql).df())
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_aggregates_skip_nulls(t, duck_t):
    got = t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_v"),
        F.sum("v").alias("sum_v"),
        F.avg("v").alias("avg_v"),  # avg over NON-NULL count
        F.count("s").alias("n_s"),
        F.countDistinct("s").alias("d_s"),
    )
    _cmp(got, duck_t, """
        SELECT count(*) AS n_rows, count(v) AS n_v, sum(v) AS sum_v,
               avg(v) AS avg_v, count(s) AS n_s, count(DISTINCT s) AS d_s FROM t""")


def test_null_predicates_and_coalesce(t, duck_t):
    got = t.select(
        "k",
        F.col("v").isNull().alias("v_is_null"),
        F.coalesce("v", F.lit(-1.0)).alias("v_or"),
        F.nullif("s", F.lit("a")).alias("s_nullif"),
    ).orderBy("k")
    _cmp(got, duck_t, """
        SELECT k, v IS NULL AS v_is_null, coalesce(v, -1.0) AS v_or,
               nullif(s, 'a') AS s_nullif FROM t ORDER BY k""")


def test_null_safe_equality(t, duck_t):
    # <=> (Spark) vs IS NOT DISTINCT FROM (DuckDB): NULL <=> NULL is TRUE
    a = t.select(F.col("k").alias("ka"), F.col("s").alias("sa"))
    b = t.select(F.col("k").alias("kb"), F.col("s").alias("sb"))
    got = (
        a.join(b, F.col("sa").eqNullSafe(F.col("sb")))
        .select("ka", "kb")
        .orderBy("ka", "kb")
    )
    _cmp(got, duck_t, """
        SELECT a.k AS ka, b.k AS kb FROM t a JOIN t b
        ON a.s IS NOT DISTINCT FROM b.s ORDER BY ka, kb""")


def test_nulls_first_ordering_must_be_explicit(t, duck_t):
    # SURVEY.md §5.3 rule 4: Spark ASC = NULLS FIRST, DuckDB ASC =
    # NULLS LAST — the engines only agree when the query says which.
    got = t.select("k", "v").orderBy(F.col("v").asc_nulls_first(), "k").limit(5)
    want_sql = "SELECT k, v FROM t ORDER BY v ASC NULLS FIRST, k LIMIT 5"
    g = got.collect()
    w = duck_t.execute(want_sql).fetchall()
    assert [tuple(r) for r in g] == [tuple(r) for r in w]
    # and the defaults really do differ (documents the hazard)
    duck_default = [r[0] for r in duck_t.execute("SELECT k FROM t ORDER BY v, k").fetchall()]
    spark_default = [r[0] for r in t.orderBy("v", "k").select("k").collect()]
    assert duck_default != spark_default, "if equal, the NULLS FIRST rule can be relaxed"


def test_outer_join_fabricated_nulls(t, duck_t):
    left = t.select(F.col("k").alias("lk"), F.col("s").alias("ls")).filter(F.col("lk") <= 3)
    right = t.select(F.col("k").alias("rk"), F.col("s").alias("rs")).filter(F.col("rk") >= 3)
    got = (
        left.join(right, F.col("ls") == F.col("rs"), "full")
        .select("lk", "rk")
        .orderBy(F.col("lk").asc_nulls_first(), F.col("rk").asc_nulls_first())
    )
    _cmp(got, duck_t, """
        SELECT a.lk AS lk, b.rk AS rk
        FROM (SELECT k AS lk, s AS ls FROM t WHERE k <= 3) a
        FULL JOIN (SELECT k AS rk, s AS rs FROM t WHERE k >= 3) b ON ls = rs
        ORDER BY lk NULLS FIRST, rk NULLS FIRST""")
    # NULL join keys never match anything — both 's IS NULL' rows fabricate
    assert got.filter(F.col("lk").isNull() | F.col("rk").isNull()).count() >= 2


def test_decimal_aggregation_smoke(spark):
    # DecimalType path (SURVEY.md §2.2: "available if needed")
    df = spark.createDataFrame([(1, "1.10"), (2, "2.20"), (3, "3.30")], "k int, d string").select(
        "k", F.col("d").cast("decimal(10,2)").alias("d")
    )
    row = df.agg(F.sum("d").alias("s"), F.avg("d").alias("a")).collect()[0]
    assert str(row["s"]) == "6.60"
    assert abs(float(row["a"]) - 2.2) < 1e-9


def test_merge_upsert_null_key_delta_wins(spark):
    """Round-8 review: the merge join must be NULL-SAFE on keys — a
    NULL-keyed delta row replaces the NULL-keyed base row (one output
    row, delta's payload), matching the struct semantics the
    uniqueness assert already uses."""
    from morphl_community_edition_spark.operators.upsert import merge_upsert

    base = spark.createDataFrame([(None, 1), (7, 10)], "k int, v int")
    delta = spark.createDataFrame([(None, 2), (8, 20)], "k int, v int")
    out = {
        (r["k"], r["v"])
        for r in merge_upsert(base, delta, ["k"], assert_unique_delta=True).collect()
    }
    assert out == {(None, 2), (7, 10), (8, 20)}, out


def test_asof_join_ignores_null_ts_right_rows(spark):
    """Round-8 review: a right row with NULL ts satisfies neither
    ts < left.ts nor ts > left.ts (SQL comparison semantics), so it
    must never be carried as a match — previously the ascending
    window's NULLS FIRST order made it a spurious backward match."""
    from pyspark.sql import functions as F

    from morphl_community_edition_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 5.0)], "k int, ts double").select(
        "k", F.col("ts").cast("timestamp").alias("ts")
    )
    right = spark.createDataFrame(
        [(1, None, "phantom")], "k int, ts double, val string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "val")
    out = asof_join(left, right, "k", "ts", ["val"]).collect()
    assert len(out) == 1 and out[0]["asof_val"] is None, out


def test_connected_components_null_endpoints_dropped_all_tiers(spark):
    """Round-8 review: an edge with a NULL endpoint is dropped by ONE
    rule on every tier — previously the union-find tier crashed with
    TypeError while the distributed tiers silently diverged."""
    from morphl_community_edition_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(None, 5), (5, None), (1, 2)], "src int, dst int"
    )
    for out in (
        connected_components(edges),                          # union-find tier
        connected_components(edges, driver_max_edges=None),   # distributed tier
        connected_components_star(edges),
    ):
        labels = {(r[0], r[1]) for r in out.collect()}
        assert labels == {(1, 1), (2, 1)}, labels


def test_simhash_signatures_keep_null_text_docs(spark):
    """Round-8 review: a NULL-text doc must keep a signature row (the
    empty-vote signature, 0) instead of silently vanishing from the
    per-document signature table."""
    from morphl_community_edition_spark.operators.dedup import simhash_signatures

    docs = spark.createDataFrame(
        [(1, None), (2, "a b a")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    assert set(out) == {1, 2} and out[1] == 0, out


def test_resize_media_tolerates_null_meta(spark):
    """Round-8 review: a NULL meta struct (missing-blob provenance)
    must not crash the resize stage."""
    from pyspark.sql import functions as F

    from morphl_community_edition_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_media,
    )

    row = spark.createDataFrame([(1, bytearray(b"xyz"))], "doc_id long, payload binary")
    media = row.withColumn("meta", F.lit(None).cast(MEDIA_SCHEMA["meta"].dataType))
    out = resize_media(media).collect()
    assert len(out) == 1 and out[0]["meta"]["n_bytes"] is not None


def test_samplers_exclude_null_keys(spark):
    """Round-9 review: a NULL identity has no sampling coordinate.
    The rate form silently dropped NULL keys while the window/top-k
    forms sorted the NULL hash FIRST (stealing quota slots and
    diverging from DuckDB's NULLS LAST) — now one rule for all three
    samplers: NULL-keyed rows are excluded up front."""
    from morphl_community_edition_spark.operators.sampling import (
        hash_rate_sample,
        stratified_exact_sample,
        weighted_sample_topk,
    )

    rows = [(None, "a", 3), (1, "a", 1), (2, "a", 1), (3, "a", 1), (4, "b", 1)]
    df = spark.createDataFrame(rows, "doc_id long, src string, w long")
    got = stratified_exact_sample(df, "doc_id", 2, "src")
    ids = {r["doc_id"] for r in got.collect()}
    assert None not in ids and len(ids) == 3  # 2 from 'a', 1 from 'b'
    got_w = weighted_sample_topk(df, "doc_id", "w", k=4)
    assert {r["doc_id"] for r in got_w.collect()} == {1, 2, 3, 4}
    got_r = hash_rate_sample(df, "doc_id", {"a": 1.0, "b": 1.0}, "src")
    assert {r["doc_id"] for r in got_r.collect()} == {1, 2, 3, 4}


def test_lang_pred_and_fingerprint_null_text(spark):
    """Round-9 review: NULL text → NULL lang_pred on BOTH engines (the
    oracle's last-language ELSE shortcut no longer captures NULL
    rows), and the fingerprint is now a per-row projection — a
    NULL-text row yields a NULL fp ROW, it does not vanish, and
    duplicate rows do not merge."""
    from morphl_community_edition_spark.operators.textstats import (
        fingerprint,
        lang_scores,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "the of and the"), (3, "the of and the")],
        "doc_id long, text string",
    )
    preds = {r["doc_id"]: r["lang_pred"] for r in lang_scores(docs).collect()}
    assert preds[1] is None and preds[2] == "en"
    fps = [(r["doc_id"], r["fp"]) for r in fingerprint(docs).collect()]
    assert len(fps) == 3  # no row vanished, no duplicate merge
    by_id = dict(fps)
    assert by_id[1] is None and by_id[2] == by_id[3] and by_id[2] is not None


def test_shingle_udtf_null_text(spark):
    """Round-9 review: NULL text through the UDTF yields zero rows,
    not a Python-worker AttributeError."""
    from morphl_community_edition_spark.functions.udtfs import ShingleUDTF

    spark.udtf.register("shingles_nulltest", ShingleUDTF)
    docs = spark.createDataFrame([(1, None), (2, "a b c d")], "doc_id long, text string")
    docs.createOrReplaceTempView("nulltest_docs")
    out = spark.sql(
        "SELECT doc_id, s.shingle FROM nulltest_docs, LATERAL shingles_nulltest(text, 3) s"
    ).collect()
    assert {r["doc_id"] for r in out} == {2} and len(out) == 2


def test_asof_forward_null_ts_left_gets_null_match(spark):
    """Round-9 review: in direction='forward' the descending window
    order defaults to NULLS LAST, which handed a NULL-ts left row the
    minimum-ts right row as a spurious match — SQL comparison
    semantics (ts > NULL is never true) require a NULL match, as the
    backward path already guaranteed."""
    from morphl_community_edition_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, None, 10), (1, "2024-01-01 09:30:00", 11)],
        "k int, ts string, lid int",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "lid")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", "a"), (1, "2024-01-01 10:00:00", "b")],
        "k int, ts string, val string",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "val")
    out = {
        r["lid"]: r["asof_val"]
        for r in asof_join(
            left, right, key="k", ts="ts", right_payload=["val"], direction="forward"
        ).collect()
    }
    assert out == {10: None, 11: "b"}, out


def test_merge_upsert_preserves_column_order_and_validates_cheaply(spark):
    """Round-9 review: output columns must keep the INPUT schema's
    order (keys were hoisted first), and a missing merge key must
    raise the crafted ValueError, not an UNRESOLVED_COLUMN from
    inside the uniqueness aggregate."""
    import pytest as _pytest

    from morphl_community_edition_spark.operators.upsert import merge_upsert

    base = spark.createDataFrame([(5, 1, "x")], "n_events int, user_id int, tag string")
    delta = spark.createDataFrame([(9, 1, "y")], "n_events int, user_id int, tag string")
    out = merge_upsert(base, delta, keys=["user_id"])
    assert out.columns == ["n_events", "user_id", "tag"]
    assert [tuple(r) for r in out.collect()] == [(9, 1, "y")]
    bad = spark.createDataFrame([(1, "y")], "uid int, tag string")
    with _pytest.raises(ValueError, match="identical schemas"):
        merge_upsert(base, bad, keys=["user_id"], assert_unique_delta=True)

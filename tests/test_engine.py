"""Engine facade: the three entry points (SURVEY.md §4.2) — DataFrame
DSL, Spark SQL front end over registered views, and streaming."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from morphl_community_edition_spark import Engine
from tests.conftest import SF_DIR_SMOKE, canonicalize

import pandas as pd


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark, sf_dir=SF_DIR_SMOKE)


def test_sql_and_dsl_agree(engine):
    sql = engine.sql(
        """
        SELECT c_mktsegment, count(*) AS cnt
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
        """
    )
    dsl = (
        engine.table("customer")
        .join(engine.table("orders"), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("c_mktsegment")
    )
    pd.testing.assert_frame_equal(
        canonicalize(sql.toPandas()), canonicalize(dsl.toPandas()), check_dtype=False
    )


def test_sql_sees_repaired_events_ts(engine):
    # the registered events view must carry the µs-repaired timestamp
    row = engine.sql("SELECT min(ts) AS lo, max(ts) AS hi FROM events").collect()[0]
    assert row["lo"].year == 2024 and row["hi"].year == 2024


def test_stream_entry_is_streaming(engine):
    df = engine.stream("events")
    assert df.isStreaming
    assert "ts" in df.columns


def test_ensure_views_multi_sf_coexist(spark):
    """ensure_views (the single-statement SQL builds' catalog half):
    two sf_dirs register side by side in one session via the suffix,
    re-registration is memoized/idempotent, and each view reads its
    own dataset."""
    from morphl_community_edition_spark.catalog import ensure_views

    s_small = ensure_views(spark, "/root/testdata/sf0.001")
    s_big = ensure_views(spark, "/root/testdata/sf0.01")
    assert s_small != s_big
    n_small = spark.table(f"lineitem_{s_small}").count()
    n_big = spark.table(f"lineitem_{s_big}").count()
    assert 0 < n_small < n_big
    assert ensure_views(spark, "/root/testdata/sf0.01") == s_big


def test_prepared_query_reruns_and_refreshes(spark):
    """Engine.prepare (round-6): the handle builds the plan once,
    run() re-executes it, refresh() forces a re-plan; results are
    identical across all three, and an unknown name raises."""
    import pytest as _pytest

    from morphl_community_edition_spark.engine import Engine
    from tests.conftest import SF_DIR_SMOKE

    eng = Engine(spark, SF_DIR_SMOKE)
    prep = eng.prepare("q01_pricing_summary")
    first = prep.run()
    built = prep.df
    assert prep.df is built, "second access must reuse the built plan"
    again = prep.run()
    assert again == first
    refreshed = prep.refresh().run()
    assert refreshed == first
    assert "Scan" in prep.explain() or "FileScan" in prep.explain()
    with _pytest.raises(KeyError, match="unknown query"):
        eng.prepare("nope")


def test_prepared_refresh_sees_rewritten_source_files(spark, tmp_path):
    """Round-6 review finding: refresh() promised a re-plan from
    changed source files, but both the prepared plan's snapshotted
    file listing AND the catalog's per-(session, sf_dir) table memo
    served the ORIGINAL files. refresh() now routes through
    catalog.invalidate_tables; this proves the contract end-to-end by
    overwriting a source parquet in-process and asserting the next
    run() reflects it."""
    import shutil

    import pandas as pd

    from morphl_community_edition_spark.engine import Engine
    from tests.conftest import SF_DIR_SMOKE

    shutil.copy(f"{SF_DIR_SMOKE}/documents.parquet", tmp_path / "documents.parquet")
    eng = Engine(spark, str(tmp_path))
    prep = eng.prepare("q24_exact_dedup")
    n_before = len(prep.run())
    assert n_before > 3

    pdf = pd.read_parquet(tmp_path / "documents.parquet").head(3)
    pdf.to_parquet(tmp_path / "documents.parquet")
    n_after = len(prep.refresh().run())
    assert n_after == 3, f"refresh did not re-plan: {n_after} vs expected 3"


def test_refresh_clears_valve_count_memos(spark, tmp_path):
    """Round-7 advice: invalidate_tables() cleared table plans, view
    memos, ts-unit verdicts and staged stream dirs — but NOT the
    corpus row-count memos backing fractional df-valves
    (operators/dedup._FRAC_COUNT_MEMO, pipeline_ops._DOC_COUNT_MEMO).
    A rebuilt plan after an in-process rewrite has the same
    semanticHash/sf_dir key, so a valved query resolved its threshold
    from the STALE count — result-affecting, not perf-only. Proves
    the memos now drop on refresh() and the valve re-resolves from
    the rewritten corpus."""
    import shutil

    import pandas as pd

    from morphl_community_edition_spark.engine import Engine
    from morphl_community_edition_spark.operators import dedup as dedup_mod
    from morphl_community_edition_spark.queries import pipeline_ops as pipe_mod
    from tests.conftest import SF_DIR_SMOKE

    shutil.copy(f"{SF_DIR_SMOKE}/documents.parquet", tmp_path / "documents.parquet")
    sf_dir = str(tmp_path)
    eng = Engine(spark, sf_dir)
    prep = eng.prepare("q114_incremental_dedup")
    prep.run()
    n_orig = pipe_mod._DOC_COUNT_MEMO[spark][sf_dir]
    assert n_orig > 10

    # exercise the semanticHash-keyed valve memo too (exact_jaccard
    # with a fractional max_doc_freq resolves via _memo_count)
    from morphl_community_edition_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    dedup_mod._memo_count(docs)
    assert len(dedup_mod._FRAC_COUNT_MEMO.get(spark, {})) >= 1

    pdf = pd.read_parquet(tmp_path / "documents.parquet").head(10)
    pdf.to_parquet(tmp_path / "documents.parquet")
    prep.refresh()
    assert sf_dir not in pipe_mod._DOC_COUNT_MEMO.get(spark, {}), (
        "doc-count memo survived refresh — valve would use stale corpus size"
    )
    assert len(dedup_mod._FRAC_COUNT_MEMO.get(spark, {})) == 0, (
        "frac-count memo survived refresh"
    )
    prep.run()
    assert pipe_mod._DOC_COUNT_MEMO[spark][sf_dir] == 10, (
        "valve did not re-resolve from the rewritten corpus"
    )
    # q134's built-index memo shares the staleness class (round-7)
    pipe_mod._INDEX_MEMO.setdefault(spark, {})[sf_dir] = "/tmp/fake-index"
    from morphl_community_edition_spark.catalog import invalidate_tables

    invalidate_tables(spark, sf_dir)
    assert sf_dir not in pipe_mod._INDEX_MEMO.get(spark, {}), (
        "index memo survived refresh — q134 would probe a stale index"
    )

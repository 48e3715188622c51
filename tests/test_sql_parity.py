"""SQL entry-point parity (SURVEY.md §4.2): `engine.sql(...)` is a
first-class way in — Spark's ANTLR front end, no parser of our own.

The oracle strings were written for DuckDB, but a 50-query subset is
ANSI enough to run UNCHANGED through spark.sql. For that subset this
asserts the three-way equivalence DataFrame API == Spark SQL ==
DuckDB (the DuckDB leg is tests/test_oracle_queries.py): same rows,
stringly compared after a total sort. The rest fail at PARSE only
(DuckDB dialect: bare VARCHAR casts, list_* functions, LATERAL
unnest, quantile_cont) — a parse failure is an accepted dialect gap,
but a query that RUNS and differs is a real front-end bug and fails
the test.
"""

from __future__ import annotations

from morphl_community_edition_spark.catalog import load_table
from morphl_community_edition_spark.queries import ORACLE_SQL, QUERIES
from tests.conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# measured on this dialect mix — guards against the test going
# vacuous (e.g. a view-registration bug making every query "parse
# fail" and nothing actually being compared)
MIN_RUNNABLE = 45


def test_sql_entry_matches_dataframe_api(spark):
    for t in TABLES:
        load_table(spark, SF_DIR, t).createOrReplaceTempView(t)
    from pyspark.errors import AnalysisException, ParseException

    runnable, mismatched = 0, []
    for name, sql in sorted(ORACLE_SQL.items()):
        try:
            # spark.sql parses + analyzes eagerly; ONLY those failures
            # are the accepted dialect gap — an execution error on a
            # query that analyzed fine is a real bug and must fail
            df = spark.sql(sql)
        except (ParseException, AnalysisException):
            continue  # DuckDB-dialect oracle — parse gap, not a bug
        via_sql = df.collect()
        runnable += 1
        via_df = QUERIES[name](spark, SF_DIR).collect()
        a = sorted(tuple(str(x) for x in r) for r in via_sql)
        b = sorted(tuple(str(x) for x in r) for r in via_df)
        if a != b:
            mismatched.append(name)
    assert runnable >= MIN_RUNNABLE, f"only {runnable} oracle queries ran via spark.sql — parity check went vacuous"
    assert not mismatched, f"spark.sql disagrees with the DataFrame API on: {mismatched}"

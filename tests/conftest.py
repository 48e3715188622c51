"""Shared fixtures: one SparkSession for the whole test run (Spark's
~2s JVM startup would otherwise dominate), a DuckDB connection with
the fixture views, and the oracle comparator that mimics the driver's
check (row count + schema + order-insensitive values).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from morphl_community_edition_spark.catalog import TABLES, table_path
from morphl_community_edition_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_DIR_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark(app_name="morphl-tests")


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')")
    return con


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Normalize a result frame for cross-engine comparison: columns
    sorted by name, integer dtypes widened to int64, timestamps to
    datetime64[us], rows sorted by every column."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        dt = pdf[c].dtype
        if pd.api.types.is_integer_dtype(dt):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(dt):
            pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(dt):
            pdf[c] = pdf[c].astype("datetime64[us]")
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


def compare_with_oracle(spark_df, duck_con, oracle_sql: str) -> None:
    got = canonicalize(spark_df.toPandas())
    want = canonicalize(duck_con.execute(oracle_sql).df())
    assert list(got.columns) == list(want.columns), f"columns differ: {list(got.columns)} vs {list(want.columns)}"
    assert len(got) == len(want), f"row count differs: {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g.dtype):
            both_nan = g.isna() & w.isna()
            close = np.isclose(g.fillna(0), w.fillna(0), rtol=0, atol=0)
            bad = ~(both_nan | (close & (g.isna() == w.isna())))
            assert not bad.any(), (
                f"column {c}: {bad.sum()} mismatches, first: "
                f"{g[bad].head(3).tolist()} vs {w[bad].head(3).tolist()}"
            )
        else:
            eq = (g == w) | (g.isna() & w.isna())
            assert eq.all(), (
                f"column {c}: {(~eq).sum()} mismatches, first: "
                f"{g[~eq].head(3).tolist()} vs {w[~eq].head(3).tolist()}"
            )

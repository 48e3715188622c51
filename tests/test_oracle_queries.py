"""The t2 gate, run locally: every oracle-declared query must match
DuckDB at sf0.01 — row count, schema, and exact values (the driver
hashes, so exact is the bar)."""

from __future__ import annotations

import pytest

from morphl_community_edition_spark.queries import ORACLE_SQL, QUERIES
from tests.conftest import SF_DIR, compare_with_oracle


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_match(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    compare_with_oracle(df, duck, ORACLE_SQL[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE_SQL)))
def test_non_oracle_runs(name, spark):
    """Queries without oracle SQL still must run and return rows."""
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() > 0, f"{name} returned no rows at sf0.01 — silent-empty regression"
    assert len(df.columns) > 0

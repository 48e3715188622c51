"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine lives in ``morphl_community_edition_spark/``; the query
registry (morphl_community_edition_spark/queries) carries both sides
of every contract entry, so this file just re-exports it.

Registry order is the disclosed coverage-rotation protocol
(queries/__init__._sort_registry): least-recently-verified-first,
derived deterministically from the committed CORRECTNESS_r*.json
artifacts + the fingerprint snapshot (tools/verified_fingerprints
.json) + the current query source — failed, edited, and new queries
sort first — so a prefix-sampling consumer walks the whole registry
across rounds and stale evidence never shields changed code. See
README "Verification-evidence rotation".
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# robust under spec-style imports: make the engine package importable
# even when the driver loads this file without chdir'ing to the repo
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from morphl_community_edition_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the Q01 pricing
    summary (scan → filter → group → 7 exact aggregates)."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2/§3."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every hash-checkable query.

    Keys absent here but present in queries() are the approx/LSH/ML
    operators (q18 approx_count_distinct, q28 Spark-ML MinHash LSH,
    q73 approx_percentile, q89/q90 ANN, q109 fingerprint sketch) —
    checked by tolerance/property tests in tests/, as those sketches
    are engine-specific by design. Their deterministic twins ARE
    oracle-checked: q41/q121 (SimHash), q123 (MinHash), q117 (q109's
    superset guarantee).
    """
    return dict(ORACLE_SQL)

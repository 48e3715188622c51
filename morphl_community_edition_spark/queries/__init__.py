"""The declared query contract (SURVEY.md §3, FIXTURES.md §3).

Each query is registered twice:

- ``QUERIES[name]``: a ``(spark, sf_dir) -> DataFrame`` callable built
  with the DataFrame API (the engine's operator library in action);
- ``ORACLE_SQL[name]``: the equivalent ANSI SQL that DuckDB runs on
  the same parquet tables. The driver hash-compares the two at sf0.01.

Column names are aliased identically on both sides (the comparator
sorts columns by name before hashing). Integer aggregates on the
DuckDB side are CAST to BIGINT (DuckDB's sum(int) is HUGEINT, which
pandas renders as float64 and would hash-mismatch Spark's long).

Queries registered without oracle SQL (approx sketches, LSH, ML,
streaming) get the driver's weaker rows-only check; their accuracy is
asserted by the pytest suites instead (tolerance / batch-vs-stream /
ARI — SURVEY.md §5.4).
"""

from __future__ import annotations

import hashlib
import inspect
import json
import re
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a contract query (and optionally its DuckDB oracle)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        fn.query_name = name
        return fn

    return deco


def _load_modules() -> None:
    # Import for side effect: each module registers its queries.
    from morphl_community_edition_spark.queries import (  # noqa: F401
        relational,
        tpch,
        windows,
        windows_extra,
        scalars,
        pandas_udfs,
        joins_hard,
        subqueries,
        reshape,
        arrays,
        llm,
        workload,
        pipeline_ops,
        ingestion,
        curation,
        maintenance,
    )


_QID = re.compile(r"^q(\d+)")


def _query_number(name: str) -> int:
    m = _QID.match(name)
    return int(m.group(1)) if m else 10**9


def _latest_rows() -> dict[str, tuple[int, dict]]:
    """Each query's most recent driver-verification row (round, record).

    Parses the committed ``CORRECTNESS_r*.json`` artifacts (written by
    the external verification harness, one file per round). A query
    with no row in any artifact is absent. Unreadable or absent
    artifacts are skipped, so a fresh checkout without them degrades to
    plain numeric-id order.
    """
    root = Path(__file__).resolve().parents[2]
    last: dict[str, tuple[int, dict]] = {}
    for p in root.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", p.name)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for q, rec in rows.items():
            if q not in last or rnd > last[q][0]:
                last[q] = (rnd, rec if isinstance(rec, dict) else {})
    return last


def _row_passed(rec: dict) -> bool:
    """Did a CORRECTNESS/LOCALCHECK row actually PASS its check?

    Oracle rows pass only when rows+schema+hash all matched; no-oracle
    rows (sketches) pass their weaker check only with a non-empty
    result. A failed row confers NO verification credit — the query
    sorts to the front for immediate re-check, not to the back
    (ADVICE r4: a failure must not count as 'recently verified')."""
    if not isinstance(rec, dict):
        return False
    if rec.get("err") == "no_oracle" or rec.get("no_oracle"):
        sr = rec.get("spark_rows")
        return isinstance(sr, int) and sr > 0
    return (
        rec.get("rows_match") is True
        and rec.get("schema_match") is True
        and rec.get("hash_match") is True
    )


def _source_fingerprint(fn: Callable) -> str:
    """Stable hash of a query's full source block (decorators
    included) PLUS its registered oracle SQL BY VALUE.

    The decorator text alone covered only INLINE oracle literals: an
    oracle passed by reference (``oracle=_SOME_CONSTANT`` /
    ``oracle=_builder()``) could change its TEXT without changing the
    function's source, keeping stale verification credit alive for an
    edited oracle (round-6 review finding). Hashing the registered
    ORACLE_SQL value closes that hole; behavior constants interpolated
    into inline f-string oracles are covered the same way, since the
    rendered SQL is what is hashed."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return ""
    oracle = ORACLE_SQL.get(getattr(fn, "query_name", ""), "")
    return hashlib.sha256((src + "\x00" + oracle).encode()).hexdigest()[:16]


_FP_PATH = Path(__file__).resolve().parents[2] / "tools" / "verified_fingerprints.json"


def _load_fingerprints() -> dict[str, dict] | None:
    """Committed snapshot: query -> {round, fp} at its last PASSING
    driver verification (written by tools/snapshot_fingerprints.py at
    round start, before any code edits). None when absent (fresh
    checkout) — rotation then degrades to round-credit-only."""
    try:
        data = json.loads(_FP_PATH.read_text())
    except (OSError, ValueError):
        return None
    return data if isinstance(data, dict) else None


def _verification_credit() -> dict[str, int]:
    """Round of each query's last valid verification — the rotation key.

    A query earns credit N only if ALL of:
    - its most recent CORRECTNESS row passed (a failure → credit 0, so
      known-broken queries sort FIRST for re-check);
    - the committed fingerprint snapshot has an entry whose ``fp``
      equals the query's CURRENT source hash (code changed since the
      snapshot → credit 0: modified implementations lose their
      verification credit and rotate to the front, per ADVICE r4).
    Credit is then the snapshot round (the last round at which THIS
    implementation was driver-verified). Without the snapshot file the
    fingerprint constraint is skipped (degraded, documented).
    """
    latest = _latest_rows()
    fps = _load_fingerprints()
    credit: dict[str, int] = {}
    for name, fn in QUERIES.items():
        ent = latest.get(name)
        if ent is None or not _row_passed(ent[1]):
            credit[name] = 0
            continue
        if fps is None:
            credit[name] = ent[0]
            continue
        rec = fps.get(name)
        if not isinstance(rec, dict) or rec.get("fp") != _source_fingerprint(fn):
            credit[name] = 0
            continue
        credit[name] = int(rec.get("round", 0))
    return credit


def _sort_registry() -> None:
    """Coverage-maximizing registry order (disclosed rotation protocol).

    A consumer that samples only a prefix of the registry each round
    (docs, demos, the per-round verification harness) should, over
    successive rounds, encounter EVERY query — never the same leading
    slice forever. To guarantee that without any hand-picked ordering,
    the registry is presented least-recently-verified-first:

        sort key = (verification credit — see _verification_credit:
                    round of the most recent PASSING driver row, and
                    only while the query's source is byte-identical to
                    the committed fingerprint snapshot taken at that
                    verification; 0 otherwise, so never-verified,
                    failed, and modified-since-verification queries
                    all sort first; numeric query id as the tie-break)

    The order is a pure deterministic function of the repository's
    committed artifacts + the current source: no judgment calls, no
    curation. Newly added queries (never verified) and queries edited
    after their last verification automatically rotate to the front so
    they are (re-)verified first rather than last. After enough rounds
    every query's credit equalizes and the rotation becomes a plain
    round-robin over the registry. A checkout without the artifacts
    falls back to plain numeric-id order.
    """
    credit = _verification_credit()
    ordered = {
        k: QUERIES[k]
        for k in sorted(QUERIES, key=lambda s: (credit.get(s, 0), _query_number(s)))
    }
    QUERIES.clear()
    QUERIES.update(ordered)


_load_modules()
_sort_registry()

"""Spot-check named contract queries against their DuckDB oracles.

Same hash/compare contract as tools/localcheck.py, but for an explicit
query subset — the fast inner loop while editing one operator (full
localcheck walks all 150+ queries, ~3 min).

Usage: python tools/checkq.py q36_fingerprint q77_neardup_clusters ...
       SPARK_GRAFT_CHECK_SF_DIR=/root/testdata/sf0.001 python tools/checkq.py q36_fingerprint
"""

from __future__ import annotations

import importlib
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from localcheck import SF, TABLES, canon_hash  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: checkq.py <query_name> [...]", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[16]").getOrCreate()  # bare, on purpose
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    m = importlib.import_module("__spark_entry__")
    qs, osql = m.queries(), m.oracle_sql()
    failures = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT IN REGISTRY")
            failures += 1
            continue
        try:
            spdf = qs[name](spark, SF).toPandas()
            if name not in osql:
                ok = len(spdf) > 0
                print(f"{name}: no-oracle, {len(spdf)} rows -> {'ok' if ok else 'FAIL'}")
                failures += 0 if ok else 1
                continue
            odf = con.execute(osql[name]).df()
            rows = len(spdf) == len(odf)
            schema = sorted(spdf.columns) == sorted(odf.columns)
            h = canon_hash(spdf) == canon_hash(odf)
            ok = rows and schema and h
            print(
                f"{name}: rows={rows}({len(spdf)}/{len(odf)}) schema={schema} "
                f"hash={h} -> {'ok' if ok else 'FAIL'}"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERR {type(e).__name__}: {e}"[:300])
            ok = False
        if not ok:
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

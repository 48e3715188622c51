"""DuckDB side of the headline bench, on an arbitrary fixture layout
(verdict r5 #2: re-measure the BASELINE on the multi-row-group layout,
not only Spark).

Runs the registry's ORACLE_SQL twin of each bench.py HEADLINE query on
DuckDB views over ``sf_dir`` with the same protocol shape as bench.py:
PASSES full-suite passes, each timing a query as best-of-RUNS, with
the per-query minimum across passes as the headline. Prints one JSON
line {"queries": {...}, "total": ..., "sf_dir": ...}.

Usage: python tools/duck_headline.py [sf_dir] [threads]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
RUNS = 5
PASSES = 3


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    from bench import HEADLINE
    from morphl_community_edition_spark.queries import ORACLE_SQL

    con = duckdb.connect()
    if threads:
        con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # warm the OS page cache + DuckDB metadata the way bench.py warms
    # the Spark session (one untimed full pass)
    for key in HEADLINE.values():
        con.execute(ORACLE_SQL[key]).fetchall()

    best: dict[str, float] = {}
    for _ in range(PASSES):
        for name, key in HEADLINE.items():
            b = 1e9
            for _r in range(RUNS):
                t0 = time.perf_counter()
                con.execute(ORACLE_SQL[key]).fetchall()
                b = min(b, time.perf_counter() - t0)
            best[name] = round(min(best.get(name, 1e9), b), 4)

    print(json.dumps({
        "queries": best,
        "total": round(sum(best.values()), 4),
        "sf_dir": sf_dir,
        "threads": threads or "default",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

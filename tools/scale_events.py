"""Synthesize a 10×-sf0.1 (~sf1) events table and measure the
events-family operators on it — the companion to scale_documents.py
(SCALE.md "Round 6: two-decade scaling"), with the variant that
matters for THIS family: hot users.

- ``grown``: 10 copies with user_id AND event_id offsets — 10× users,
  same per-user history length. The honest corpus-growth point: the
  user-keyed shuffles get more, equally-sized groups.
- ``skew10``: 10 copies with the SAME user_ids (only event_id
  offset) — every user's history is 10× longer, and duplicated
  timestamps force the order_tiebreak path. This is the direct stress
  for the one structural risk in the events family: per-user windows
  (sessionize, running frames) serialize within a user, so a 10×
  hotter user means 10× more work on that user's single task.

Usage: python tools/scale_events.py [outdir=/tmp/sf1-events]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1/events.parquet"
COPIES = 10
QUERIES_TO_RUN = (
    "q16_sessionize",
    "q111_session_funnel",
    "q100_retention_cohorts",
    "q101_rolling_dau",
    "q102_purchase_intervals",
)


def build(outdir: str) -> None:
    con = duckdb.connect()
    n = con.execute(f"SELECT count(*) FROM read_parquet('{SRC}')").fetchone()[0]
    n_users = con.execute(
        f"SELECT max(user_id) + 1 FROM read_parquet('{SRC}')"
    ).fetchone()[0]
    rows_per_group = max(1024, (n * COPIES) // 32)
    for variant, user_expr in (
        ("grown", f"user_id + c.i * {n_users}"),
        ("skew10", "user_id"),
    ):
        d = os.path.join(outdir, variant)
        os.makedirs(d, exist_ok=True)
        out = os.path.join(d, "events.parquet")
        con.execute(
            f"""
            COPY (
              SELECT event_id + c.i * {n} AS event_id, ts,
                     {user_expr} AS user_id, event_type, value, props
              FROM read_parquet('{SRC}'), (SELECT unnest(range({COPIES})) AS i) c
              ORDER BY event_id
            ) TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE {rows_per_group})
            """
        )
        print(f"built {out}: {os.path.getsize(out)>>20} MiB", file=sys.stderr)


def measure(outdir: str) -> dict:
    from morphl_community_edition_spark.engine import get_spark
    from morphl_community_edition_spark.queries import QUERIES

    spark = get_spark(app_name="scale-events")
    results: dict[str, dict[str, float]] = {}
    for variant in ("grown", "skew10"):
        sf_dir = os.path.join(outdir, variant)
        results[variant] = {}
        for name in QUERIES_TO_RUN:
            q = QUERIES[name]
            best = float("inf")
            for _ in range(3):  # first run warms; keep best of the 3
                s = time.perf_counter()
                q(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - s)
            results[variant][name] = round(best, 3)
            print(f"{variant} {name}: {best:.2f}s", file=sys.stderr)
    return results


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1-events"
    build(outdir)
    print(json.dumps({"outdir": outdir, "copies": COPIES, "timings": measure(outdir)}))


if __name__ == "__main__":
    main()

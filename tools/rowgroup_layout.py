"""Rewrite the fixture tables into a multi-row-group parquet layout
(verdict r5 #2).

The driver fixtures are single-row-group files — a layout no real
table has, and one that caps BOTH engines' scan parallelism (Spark
split boundaries cannot cut inside a row group; DuckDB parallelizes
per row group too). This tool rewrites every table with ``n_groups``
row groups so the headline decode-floor claim can be tested on the
layout a production table actually ships: if the four >2× headline
queries close on this layout, the single-row-group fixture was the
binding constraint; if not, the residual is a real per-core decode
gap.

Usage:
    python tools/rowgroup_layout.py [sf_dir] [out_dir] [n_groups]
    python tools/rowgroup_layout.py /root/testdata/sf0.1 /tmp/sf0.1-rg32 32
"""

from __future__ import annotations

import math
import os
import sys

import pyarrow.parquet as pq

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.1-rg32"
    n_groups = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        tbl = pq.read_table(src)
        rows = tbl.num_rows
        # floor of 1024 rows/group: a dimension table with 5 rows must
        # not fragment into 5 one-row groups (pure metadata overhead —
        # no real writer produces that layout either)
        rg = max(1024, math.ceil(rows / n_groups))
        pq.write_table(tbl, dst, row_group_size=rg)
        got = pq.ParquetFile(dst).num_row_groups
        print(f"{t}: {rows} rows -> {got} row groups ({rg} rows/group)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

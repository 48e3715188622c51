"""Synthesize a 10×-sf0.1 (~sf1) documents table and measure the
dedup/curation family on it — the second measured decade of the
scaling argument (SCALE.md "Round 6: two-decade scaling").

Two variants, both derived from the driver's own sf0.1 fixture (no
invented data distribution):

- ``grown``: 10 copies with doc_id offsets and a per-copy unique
  suffix token appended to the text, so documents stay DISTINCT and
  the word/n-gram frequency distribution is preserved — this models a
  corpus that is simply 10× larger (the honest scaling point).
- ``dup90``: 10 exact replicas (only doc_id changes) — a worst-case
  90%-duplicate corpus that stress-tests keeper election and the
  duplicated-gram joins (every paragraph/gram is hot).

Usage: python tools/scale_documents.py [outdir=/tmp/sf1-docs]
Writes <outdir>/{grown,dup90}/documents.parquet (32 row groups, the
production-like layout from rowgroup_layout.py) and prints one JSON
line of best-of-2 warm timings per (variant, query).
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1/documents.parquet"
COPIES = 10
QUERIES_TO_RUN = (
    "q24_exact_dedup",
    "q113_exact_substring_dup",
    "q119_paragraph_dedup",
    "q112_repetition_quality",
    "q118_pii_redaction",
    "q120_epoch_mix",
    "q121_simhash_hamming_pairs",
    "q123_minhash_lsh_pairs_exact",
)


def build(outdir: str) -> None:
    con = duckdb.connect()
    n = con.execute(f"SELECT count(*) FROM read_parquet('{SRC}')").fetchone()[0]
    rows_per_group = max(1024, (n * COPIES) // 32)
    for variant, text_expr in (
        ("grown", "text || ' uniq' || CAST(doc_id + c.i * {n} AS VARCHAR)"),
        ("dup90", "text"),
    ):
        d = os.path.join(outdir, variant)
        os.makedirs(d, exist_ok=True)
        out = os.path.join(d, "documents.parquet")
        expr = text_expr.format(n=n)
        con.execute(
            f"""
            COPY (
              SELECT doc_id + c.i * {n} AS doc_id, {expr} AS text,
                     lang, source, n_chars
              FROM read_parquet('{SRC}'), (SELECT unnest(range({COPIES})) AS i) c
              ORDER BY doc_id
            ) TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE {rows_per_group})
            """
        )
        print(f"built {out}: {os.path.getsize(out)>>20} MiB", file=sys.stderr)


def measure(outdir: str) -> dict:
    from morphl_community_edition_spark.engine import get_spark
    from morphl_community_edition_spark.queries import QUERIES

    spark = get_spark(app_name="scale-documents")
    results: dict[str, dict[str, float]] = {}
    for variant in ("grown", "dup90"):
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
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1-docs"
    build(outdir)
    print(json.dumps({"outdir": outdir, "copies": COPIES, "timings": measure(outdir)}))


if __name__ == "__main__":
    main()

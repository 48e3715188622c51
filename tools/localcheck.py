"""Local driver-contract check → LOCALCHECK_r{N}.json (verdict r3 #6).

Simulates the external verification harness in-process: a BARE
SparkSession (no engine builder confs — catalog.load_table's runtime
repair must kick in), every ``queries()`` entry executed at sf0.01
and hash-compared against its ``oracle_sql()`` DuckDB twin; entries
without an oracle get the weaker rows-only check. Emits one JSON
artifact with the same per-query row schema as CORRECTNESS_r*.json so
driver-vs-local evidence can be diffed per query.

Usage: python tools/localcheck.py [round_number] [out_path]
"""

from __future__ import annotations

import hashlib
import importlib
import json
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def canon_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].map(lambda v: f"{v:.6f}" if pd.notna(v) else "\\N")
        elif pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
        else:
            pdf[c] = pdf[c].astype(str)
    return hashlib.sha256(
        "\n".join(sorted("|".join(r) for r in pdf.astype(str).values.tolist())).encode()
    ).hexdigest()


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "0"
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, f"LOCALCHECK_r{int(rnd):02d}.json")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[16]").getOrCreate()  # bare, on purpose
    m = importlib.import_module("__spark_entry__")
    assert len(m.entry(spark).collect()) > 0, "entry() smoke failed"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    qs, osql = m.queries(), m.oracle_sql()
    results: dict[str, dict] = {}
    t_start = time.time()
    failures = 0
    for name in qs:  # registry order — same walk the driver does
        rec: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            spdf = qs[name](spark, SF).toPandas()
            rec["spark_rows"] = int(len(spdf))
            if name in osql:
                odf = con.execute(osql[name]).df()
                rec["oracle_rows"] = int(len(odf))
                rec["rows_match"] = len(spdf) == len(odf)
                rec["schema_match"] = sorted(spdf.columns) == sorted(odf.columns)
                rec["hash_match"] = canon_hash(spdf) == canon_hash(odf)
                ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
            else:
                rec["err"] = None
                # a no-oracle sketch must still produce a NON-EMPTY
                # result — `>= 0` was vacuously true for any
                # non-raising query (ADVICE r4)
                ok = rec["spark_rows"] > 0
                rec["no_oracle"] = True
        except Exception as e:  # noqa: BLE001 — record, keep walking
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
            ok = False
        # fingerprint the source that was ACTUALLY verified, at
        # verification time (ADVICE r5: a snapshot taken later cannot
        # know whether the code changed in between; this field can)
        try:
            from morphl_community_edition_spark import queries as qmod

            if name in qmod.QUERIES:
                rec["fp"] = qmod._source_fingerprint(qmod.QUERIES[name])
        except Exception:  # noqa: BLE001 — fp is best-effort metadata
            pass
        if not ok:
            failures += 1
        results[name] = rec
        tag = "ok" if ok else "FAIL"
        print(f"# {name}: {tag}", file=sys.stderr)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    n_hash = sum(1 for r in results.values() if r.get("hash_match"))
    print(
        f"{len(results)} queries, {n_hash} hash-green, {failures} failures, "
        f"{time.time() - t_start:.0f}s -> {out_path}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

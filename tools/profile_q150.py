"""q150 persisted-ANN grown-decade decomposition (round 13, verdict
r12 #2): SCALE_r12 read 1.45 s (sf0.1) -> 7.41 s (grown 10x) = 5.1x —
the only serve-shape query in the 5x band. q130, which computes the
SAME full-probe answer in-session from the raw corpus, reads 1.30 ->
1.44 s (1.11x) — so the gap is not the arithmetic (identical 6M int8
dot products) but the INDEX READ: what the build wrote and how the
serve scans it.

Hypotheses this harness separates, per fixture (sf0.1 and grown):

- H1 physical bloat: build casts n_emb to array<double> (8 B/elem vs
  the corpus' float32 4 B) and stores n_code as array<bigint> — the
  index can be several x the corpus bytes. Measured: bytes on disk,
  corpus vs index.
- H2 small-file explosion: the build writes partitionBy("cell") from
  a 32-partition shuffle -> up to 32 files per cell x n_cells
  directories. Measured: file count per cell.
- H3 double scan: the serve reads the vectors table twice (int8
  candidate branch + float re-rank branch); at full probe that is
  2x the index bytes per serve. Measured: stage timings below.

Stage decomposition (best-of-N warm, full-probe n_probe=16 to match
the swept query):

- route: route_probes_to_cells(...).collect()  [driver-sized]
- candidates: the int8 scoring + window cut, STOPPING before the
  float re-rank join (count() action)
- serve: the full ann_index_topk(...).collect()
- rerank_delta: serve - candidates (the float-branch cost)

Usage: python tools/profile_q150.py [workdir=/tmp/profile-q150]
Writes one JSON line to stdout; human progress to stderr.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF01 = "/root/testdata/sf0.1"
COPIES = 10
N_PROBE = 16
RUNS = 3


def build_grown_embeddings(workdir: str) -> str:
    """The scale_sweep grown-variant construction: 10 deterministic
    copies, each shifted +0.001*i per dimension — distinct vectors,
    same geometry (tools/scale_sweep.py)."""
    out = os.path.join(workdir, "emb_grown")
    if os.path.isdir(out) and glob.glob(os.path.join(out, "*.parquet")):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT vec_id + i * (SELECT max(vec_id) + 1
                               FROM read_parquet('{SF01}/embeddings.parquet')) AS vec_id,
                 list_transform(embedding, x -> x + 0.001 * i) AS embedding,
                 label
          FROM read_parquet('{SF01}/embeddings.parquet'),
               (SELECT unnest(range({COPIES})) AS i)
          ORDER BY vec_id
        ) TO '{os.path.join(out, "embeddings.parquet")}' (FORMAT PARQUET)
        """
    )
    return out


def layout_stats(vect_dir: str) -> dict:
    cells = sorted(glob.glob(os.path.join(vect_dir, "cell=*")))
    files = {
        os.path.basename(c): [
            f for f in os.listdir(c) if f.endswith(".parquet")
        ]
        for c in cells
    }
    total_bytes = 0
    for c in cells:
        for f in os.listdir(c):
            if f.endswith(".parquet"):
                total_bytes += os.path.getsize(os.path.join(c, f))
    n_files = sum(len(v) for v in files.values())
    return {
        "n_cells": len(cells),
        "n_files": n_files,
        "files_per_cell_max": max((len(v) for v in files.values()), default=0),
        "index_mb": round(total_bytes / 1e6, 2),
    }


def best_of(fn, runs: int = RUNS) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def profile_fixture(spark, sf_dir: str, tag: str, workdir: str) -> dict:
    from morphl_community_edition_spark.catalog import load_table
    from morphl_community_edition_spark.operators.ann_index import (
        ann_index_topk,
        build_ann_index,
    )
    from morphl_community_edition_spark.operators.similarity import (
        quantize_embeddings_int8,
        route_probes_to_cells,
        dot,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    path = os.path.join(workdir, f"annidx_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.perf_counter()
    build_ann_index(emb, path, n_cells=16)
    t_build = round(time.perf_counter() - t0, 3)

    corpus_mb = round(
        sum(
            os.path.getsize(p)
            for p in glob.glob(os.path.join(sf_dir, "embeddings.parquet"))
        )
        / 1e6,
        2,
    )
    stats = layout_stats(os.path.join(path, "vectors"))
    stats.update({"build_sec": t_build, "corpus_mb": corpus_mb})

    vectors = spark.read.parquet(os.path.join(path, "vectors"))
    centroid_df = spark.read.parquet(os.path.join(path, "centroids"))

    # stage 1: routing only
    stats["route_sec"] = best_of(
        lambda: route_probes_to_cells(
            centroid_df, probes, N_PROBE, "vec_id", "embedding"
        ).collect()
    )

    # stage 2: int8 candidate branch only (the serve MINUS the float
    # re-rank join) — mirrors quantized_candidate_rerank up to `cands`
    def run_candidates():
        probe_cells = route_probes_to_cells(
            centroid_df, probes, N_PROBE, "vec_id", "embedding"
        )
        qp = quantize_embeddings_int8(probes.select("vec_id", "embedding"))
        pr = probe_cells.join(
            qp.select(
                F.col("vec_id").alias("q_vec"),
                F.col("q_emb").cast("array<double>").alias("q_code"),
            ),
            "q_vec",
        )
        assigned = vectors.select(
            "cell", "n_vec", F.col("n_code").cast("array<double>").alias("n_code")
        )
        isim = dot(F.col("q_code"), F.col("n_code")) / (
            F.sqrt(
                dot(F.col("q_code"), F.col("q_code"))
                * dot(F.col("n_code"), F.col("n_code"))
            )
            + F.lit(1e-30)
        )
        wc = Window.partitionBy("q_vec").orderBy(F.col("isim").desc(), "n_vec")
        (
            assigned.join(pr, "cell")
            .filter(F.col("q_vec") != F.col("n_vec"))
            .select("q_vec", "n_vec", isim.alias("isim"))
            .withColumn("crk", F.row_number().over(wc))
            .filter(F.col("crk") <= 50)
            .count()
        )

    stats["candidates_sec"] = best_of(run_candidates)

    # stage 3: the full serve (the swept query's exact call)
    stats["serve_sec"] = best_of(
        lambda: ann_index_topk(
            spark, path, probes, k=5, n_candidates=50, n_probe=N_PROBE
        ).collect()
    )
    stats["rerank_delta_sec"] = round(
        stats["serve_sec"] - stats["candidates_sec"], 3
    )
    print(f"{tag}: {json.dumps(stats)}", file=sys.stderr)
    return stats


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/profile-q150"
    os.makedirs(workdir, exist_ok=True)
    from morphl_community_edition_spark.session import get_spark

    spark = get_spark()
    grown = build_grown_embeddings(workdir)
    out = {
        "n_probe": N_PROBE,
        "runs": RUNS,
        "sf0.1": profile_fixture(spark, SF01, "sf01", workdir),
        "grown": profile_fixture(spark, grown, "grown", workdir),
    }
    for k in ("route_sec", "candidates_sec", "serve_sec", "rerank_delta_sec"):
        b, g = out["sf0.1"][k], out["grown"][k]
        out[f"decade_{k}"] = round(g / b, 2) if b > 0 else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()

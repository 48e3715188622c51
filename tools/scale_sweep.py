"""Per-round scale-trend sweep (round-7 verdict #5): regenerate the
three-point decade evidence every round instead of hand-running it.

One committed harness folds tools/scale_documents.py and
tools/scale_events.py into a single run, adds the embeddings family
(round-7 ops), and writes ``SCALE_r{N}.json`` at the repo root with,
per (family, variant, query): the sf0.1 baseline, the ~sf1 (10×)
timing, and the decade ratio — so the round-over-round diff is a
one-line ``diff <(jq . SCALE_r6) <(jq . SCALE_r7)`` instead of an
archaeology session. tests/test_registry_rotation.py asserts the
artifact for the CURRENT round exists, which is the forcing function
that keeps the trend regenerated.

Families and their adversarial variants (rationales in the two
source scripts and SCALE.md):

- documents: ``grown`` (honest 10× corpus) and ``dup90`` (90%
  duplicates — keeper/gram hot-key stress); round-7 adds the BPE
  train/tokenize pair, the samplers, the indexed incremental dedup
  the unigram/bigram-NLL scores, the adaptive
  per-source quality cut and BM25 retrieval.
- events: ``grown`` (10× users) and ``skew10`` (same users, 10×
  history — per-user window serialization stress); round-7 adds the
  SCD-2 history build.
- embeddings (new, round 7): ``grown`` — 10 deterministic copies,
  each shifted by +0.001·i per dimension so vectors stay DISTINCT
  with the same geometry; measures q129 SemDeDup (within-cell pair
  cost: cells hold 10× more, so this is the sum(cell²) bound the
  operator's docstring claims) and q130 quantized retrieval (corpus
  scoring scales linearly; probe count held constant).

Usage: python tools/scale_sweep.py [round_no] [workdir=/tmp/scale-sweep]
Round defaults to max(CORRECTNESS_r*.json) + 1 — the round being
built now. Variant tables are rebuilt from the driver's sf0.1
fixtures on every run (they live in /tmp, never committed).
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import re
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
COPIES = 10

DOC_QUERIES = (
    "q24_exact_dedup",
    "q113_exact_substring_dup",
    "q119_paragraph_dedup",
    "q112_repetition_quality",
    "q118_pii_redaction",
    "q120_epoch_mix",
    "q121_simhash_hamming_pairs",
    "q123_minhash_lsh_pairs_exact",
    "q127_bpe_merges",
    "q131_bpe_tokenize",
    "q132_hash_rate_sample",
    "q133_stratified_exact_sample",
    "q146_weighted_sample",
    "q134_indexed_incremental_dedup",
    "q138_unigram_nll_quality",
    "q139_adaptive_quality_cut",
    "q140_bigram_nll_quality",
    "q141_bm25_retrieval",
    "q147_quality_keeper_dedup",
    "q148_heavy_hitter_words",
    "q151_persisted_bm25_serve",
    "q152_heavy_hitter_bigrams",
    # round 11. q155/q157 are excluded not by oversight: the variant
    # dirs carry ONLY the scaled table, and the hybrid queries join
    # documents ⊕ embeddings; their fusion stage is rank-bounded
    # (SCALE.md round 11) and each leg is swept via q141/q151/q130/q150.
    "q158_leakage_safe_split",
    # round 11 continuation. q159/q163/q164 (lineitem/orders) are
    # excluded not by oversight: the variant dirs carry only the
    # scaled documents/events/embeddings tables; their scale shapes
    # are single-pass hash aggs (q159/q164) and the oriented wedge
    # join (q163, bound argued in operators/triangles.py).
    "q162_psi_drift",
)
EVENT_QUERIES = (
    "q16_sessionize",
    "q111_session_funnel",
    "q100_retention_cohorts",
    "q101_rolling_dau",
    "q102_purchase_intervals",
    "q137_scd2_history",
    "q142_interval_coalesce",
    "q160_hll_sketch_rollup",  # round 11 continuation
    "q161_exact_distinct_rollup",  # round 11 continuation
)
EMB_QUERIES = (
    "q129_semantic_dedup",
    "q130_quantized_retrieval",
    "q150_persisted_ann_serve",
    "q156_retrieval_eval",  # round 11
)


def _load(name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def current_round() -> int:
    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    ]
    return (max(rounds) + 1) if rounds else 1


def build_embeddings(outdir: str) -> None:
    con = duckdb.connect()
    src = f"{SF01}/embeddings.parquet"
    n = con.execute(f"SELECT count(*) FROM read_parquet('{src}')").fetchone()[0]
    d = os.path.join(outdir, "grown")
    os.makedirs(d, exist_ok=True)
    out = os.path.join(d, "embeddings.parquet")
    con.execute(
        f"""
        COPY (
          SELECT vec_id + c.i * {n} AS vec_id,
                 list_transform(embedding, x -> CAST(x + 0.001 * c.i AS FLOAT))
                     AS embedding,
                 label
          FROM read_parquet('{src}'), (SELECT unnest(range({COPIES})) AS i) c
          ORDER BY vec_id
        ) TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE {max(1024, n * COPIES // 32)})
        """
    )
    print(f"built {out}: {os.path.getsize(out) >> 20} MiB", file=sys.stderr)


def _measure(spark, queries, sf_dir, runs: int = 3) -> dict[str, float]:
    from morphl_community_edition_spark.queries import QUERIES

    out: dict[str, float] = {}
    for name in queries:
        best = float("inf")
        for _ in range(runs):  # first run warms; keep best
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"{sf_dir.rsplit('/', 1)[-1]} {name}: {best:.2f}s", file=sys.stderr)
    return out


def main() -> None:
    round_no = int(sys.argv[1]) if len(sys.argv) > 1 else current_round()
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale-sweep"
    docs_dir = os.path.join(workdir, "docs")
    events_dir = os.path.join(workdir, "events")
    emb_dir = os.path.join(workdir, "emb")

    _load("scale_documents").build(docs_dir)
    _load("scale_events").build(events_dir)
    build_embeddings(emb_dir)

    from morphl_community_edition_spark.engine import get_spark

    spark = get_spark(app_name=f"scale-sweep-r{round_no}")
    report: dict = {
        "round": round_no,
        "copies": COPIES,
        "protocol": "best-of-3 warm per (variant, query); baselines at the driver sf0.1 fixture; variants rebuilt from it per run",
        "families": {},
    }
    for family, queries, base_dir, variants in (
        ("documents", DOC_QUERIES, SF01, [("grown", docs_dir), ("dup90", docs_dir)]),
        ("events", EVENT_QUERIES, SF01, [("grown", events_dir), ("skew10", events_dir)]),
        ("embeddings", EMB_QUERIES, SF01, [("grown", emb_dir)]),
    ):
        base = _measure(spark, queries, base_dir)
        fam: dict = {"sf0.1": base, "variants": {}}
        for vname, vroot in variants:
            timings = _measure(spark, queries, os.path.join(vroot, vname))
            fam["variants"][vname] = {
                "timings": timings,
                "decade_ratio": {
                    q: (round(timings[q] / base[q], 2) if base[q] > 0 else None)
                    for q in queries
                },
            }
        report["families"][family] = fam

    # the SemDeDup paper's scale knob: n_cells grows with the corpus
    # (cells ≈ corpus/const keeps within-cell pair cost flat). q129
    # pins 16 cells at every SF, so the honest 10× point also measures
    # the operator with cells scaled 10× (16 -> 160).
    from morphl_community_edition_spark.catalog import load_table
    from morphl_community_edition_spark.operators.semdedup import semantic_dedup

    emb_grown = load_table(spark, os.path.join(emb_dir, "grown"), "embeddings")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        semantic_dedup(emb_grown, threshold=0.4, n_cells=160).collect()
        best = min(best, time.perf_counter() - t0)
    report["families"]["embeddings"]["variants"]["grown"]["timings"][
        "semantic_dedup_cells_scaled_160"
    ] = round(best, 3)
    print(f"grown semantic_dedup(n_cells=160): {best:.2f}s", file=sys.stderr)

    # round 8: the enforced GEMM cell valve under a deliberate
    # mega-cell (n_cells=1 on the 10× corpus exceeds the derived
    # per-task cap, so the block-pair re-split actually fires —
    # the skewed-cell case the round-7 verdict flagged as an OOM risk
    # when it was only a documented caller contract)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        semantic_dedup(emb_grown, threshold=0.4, n_cells=1).collect()
        best = min(best, time.perf_counter() - t0)
    report["families"]["embeddings"]["variants"]["grown"]["timings"][
        "semantic_dedup_megacell_valved"
    ] = round(best, 3)
    print(f"grown semantic_dedup(mega-cell, valved): {best:.2f}s", file=sys.stderr)

    # round 9 (verdict r8 #6): the clustered q129 config is the one
    # registry entry whose output the driver cannot hash — its
    # refinement property (edges ⊆ exact) is suite-asserted, but the
    # artifact should carry a NUMBER: duplicate-recall of the
    # clustered config vs the q128 exact config at the driver sf0.1
    # fixture. Expect it LOW here by fixture construction (SURVEY §8:
    # the synthetic embeddings are uniform-random, so KMeans cells
    # carry no geometric structure and near-dup pairs are mostly
    # cross-cell); on a real corpus SemDeDup's premise is that dups
    # co-locate in cells. The row exists to pin the measured value —
    # a regression in the cell pipeline (e.g. dropping within-cell
    # pairs) would crater it to ~0 and the suite floor would trip.
    emb_sf01 = load_table(spark, SF01, "embeddings")
    ex_dups = {
        r["vec_id"]
        for r in semantic_dedup(emb_sf01, threshold=0.4, n_cells=1).collect()
        if not r["keep"]
    }
    cl_dups = {
        r["vec_id"]
        for r in semantic_dedup(emb_sf01, threshold=0.4, n_cells=16).collect()
        if not r["keep"]
    }
    dup_recall = round(len(cl_dups & ex_dups) / max(1, len(ex_dups)), 4)
    report["families"]["embeddings"]["q129_dup_recall_vs_exact_sf0.1"] = {
        "exact_dups": len(ex_dups),
        "clustered_dups": len(cl_dups),
        "recall": dup_recall,
        "note": "uniform-random fixture -> cells carry no geometry; suite floor asserts > 0.15 and refinement (no invented dups)",
    }
    print(f"sf0.1 q129 dup recall vs exact: {dup_recall}", file=sys.stderr)

    # round 8: PageRank decade trend — the iteration loop is the
    # operator's scale claim (edge side shuffles once at build, each
    # iteration moves node-sized frames only), so measure the operator
    # on the sf0.1 trade graph vs 10 disjoint shifted copies of it
    # (nodes ×10, edges ×10; the per-iteration join/agg frames grow
    # linearly and the decade ratio should track that)
    from pyspark.sql import functions as F  # noqa: N812

    from morphl_community_edition_spark.operators.pagerank import pagerank
    from morphl_community_edition_spark.queries.workload import trade_graph_edges

    base_edges = trade_graph_edges(spark, SF01).localCheckpoint(eager=True)
    grown_edges = None
    for i in range(COPIES):
        c = base_edges.select(
            F.concat(F.col("src"), F.lit(f"#{i}")).alias("src"),
            F.concat(F.col("dst"), F.lit(f"#{i}")).alias("dst"),
        )
        grown_edges = c if grown_edges is None else grown_edges.union(c)
    grown_edges = grown_edges.localCheckpoint(eager=True)
    from morphl_community_edition_spark.operators.labelprop import label_propagation

    gr_rows: dict[str, float] = {}
    for op_name, op in (
        ("q143_pagerank_operator", lambda e: pagerank(e, iters=4)),
        # round 8: LPA shares the iteration doctrine (src-partitioned
        # persisted edges, node-sized per-round traffic) — same decade
        # evidence requirement
        ("q145_lpa_operator", lambda e: label_propagation(e, iters=4)),
    ):
        for tag, ed_frame in (("base", base_edges), ("grown10x", grown_edges)):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                op(ed_frame).collect()
                best = min(best, time.perf_counter() - t0)
            gr_rows[f"{op_name}:{tag}"] = round(best, 3)
            print(f"{op_name} {tag}: {best:.2f}s", file=sys.stderr)
    report["families"]["graph"] = {
        "sf0.1": {
            op: gr_rows[f"{op}:base"]
            for op in ("q143_pagerank_operator", "q145_lpa_operator")
        },
        "variants": {
            "grown": {
                "timings": {
                    op: gr_rows[f"{op}:grown10x"]
                    for op in ("q143_pagerank_operator", "q145_lpa_operator")
                },
                "decade_ratio": {
                    op: (
                        round(gr_rows[f"{op}:grown10x"] / gr_rows[f"{op}:base"], 2)
                        if gr_rows[f"{op}:base"] > 0
                        else None
                    )
                    for op in ("q143_pagerank_operator", "q145_lpa_operator")
                },
            }
        },
    }

    # round 8 (verdict #7): exact-Jaccard family decomposition. The
    # q77/q93 tail is the candidate volume Σ df·(df−1)/2 — a property
    # of the corpus' shingle-df distribution, not a plan defect. Two
    # engines, dispatched by corpus shape (operators/dedup.py):
    # postings (default — fastest on benign df) and PPJoin prefix
    # (q144 — the EXACT escape hatch when boilerplate df² dominates).
    # Evidence: measure both on the driver fixture AND on a
    # boilerplate variant (shared template header on every doc, the
    # realistic web shape), recording each corpus' direct-join volume
    # next to the prefix candidate count.
    from morphl_community_edition_spark.operators.dedup import (
        prefix_jaccard_candidates,
        word_shingles,
    )
    from morphl_community_edition_spark.queries import QUERIES

    boiler_dir = os.path.join(workdir, "docs", "boiler")
    os.makedirs(boiler_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT doc_id,
                     'terms of use apply to all content here . ' || text AS text,
                     lang, source, n_chars
              FROM read_parquet('{SF01}/documents.parquet') ORDER BY doc_id)
        TO '{os.path.join(boiler_dir, "documents.parquet")}'
        (FORMAT PARQUET, ROW_GROUP_SIZE 1024)
        """
    )
    jac: dict = {}
    for tag, sfd in (("sf0.1", SF01), ("boiler", boiler_dir)):
        docs = load_table(spark, sfd, "documents")
        vol = int(
            word_shingles(docs.select("doc_id", "text"))
            .select(F.explode("shingles").alias("s"))
            .groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(F.sum(F.expr("df*(df-1)/2")).alias("v"))
            .collect()[0]["v"]
        )
        _base, cand = prefix_jaccard_candidates(docs, threshold=0.5)
        n_cand = cand.count()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES["q144_prefix_neardup_pairs"](spark, sfd).collect()
            best = min(best, time.perf_counter() - t0)
        jac[tag] = {
            "direct_join_volume": vol,
            "prefix_candidates": n_cand,
            "q144_prefix_neardup_pairs": round(best, 3),
        }
        print(f"{tag} jaccard: volume={vol} cand={n_cand} q144={best:.2f}s", file=sys.stderr)
    # the default engine's end-to-end row at the driver fixture (the
    # former sweep tail, q77 = pairs + components closure)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        QUERIES["q77_dedup_components"](spark, SF01).collect()
        best = min(best, time.perf_counter() - t0)
    jac["sf0.1"]["q77_postings_engine_components_sec"] = round(best, 3)
    print(f"sf0.1 q77 (postings+closure): {best:.2f}s", file=sys.stderr)
    # family schema (the rotation test's contract): sf0.1 + variants;
    # 'boiler' is the variant, its ratio the flat-cost headline
    report["families"]["jaccard_decomposition"] = {
        "sf0.1": jac["sf0.1"],
        "variants": {
            "boiler": {
                "timings": {
                    "q144_prefix_neardup_pairs": jac["boiler"][
                        "q144_prefix_neardup_pairs"
                    ]
                },
                "decade_ratio": {
                    "q144_prefix_neardup_pairs": (
                        round(
                            jac["boiler"]["q144_prefix_neardup_pairs"]
                            / jac["sf0.1"]["q144_prefix_neardup_pairs"],
                            2,
                        )
                        if jac["sf0.1"]["q144_prefix_neardup_pairs"] > 0
                        else None
                    )
                },
                "direct_join_volume": jac["boiler"]["direct_join_volume"],
                "prefix_candidates": jac["boiler"]["prefix_candidates"],
            }
        },
    }

    out_path = os.path.join(REPO, f"SCALE_r{round_no:02d}.json")
    # Min-merge across passes (round 12): the sweep's base and variant
    # phases run ~15 minutes apart, so a load episode inside ONE phase
    # poisons the decade ratios asymmetrically (r12 pass 1: q113 grown
    # doubled on unchanged code while its base got FASTER). Re-running
    # the sweep and folding per-row minima is the same estimator
    # bench.py's passes and HEADLINE_SF1's independent runs use; the
    # artifact discloses the pass count and keeps the per-pass totals.
    prior = None
    if os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        if prior.get("round") != round_no:
            prior = None
    if prior is not None:
        report["passes"] = int(prior.get("passes", 1)) + 1

        def _merge(dst: dict, src: dict) -> None:
            for k, v in dst.items():
                if isinstance(v, dict) and isinstance(src.get(k), dict):
                    if k in ("timings", "sf0.1"):
                        for q, t in v.items():
                            s = src[k].get(q)
                            if isinstance(t, (int, float)) and isinstance(s, (int, float)):
                                v[q] = min(t, s)
                    else:
                        _merge(v, src[k])

        _merge(report["families"], prior.get("families", {}))
        # recompute every decade ratio from the merged minima
        for fam in report["families"].values():
            base = fam.get("sf0.1")
            if not isinstance(base, dict):
                continue
            for var in fam.get("variants", {}).values():
                t = var.get("timings", {})
                var["decade_ratio"] = {
                    q: (round(t[q] / base[q], 2) if base.get(q) else None)
                    for q in var.get("decade_ratio", {})
                }
    else:
        report["passes"] = 1
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(json.dumps({"written": out_path, "passes": report["passes"]}))


if __name__ == "__main__":
    main()

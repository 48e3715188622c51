"""SemDeDup-style semantic deduplication (K2/K3 composition, round
7; integer-exact scoring + enforced cell valve round 8): embedding-
space near-duplicate removal following the public SemDeDup recipe
(Abbas et al. 2023, arXiv:2303.09540) — cluster the corpus embeddings
into cells, compare pairs only WITHIN a cell, connect pairs above a
cosine threshold into duplicate groups, keep one representative per
group.

Composition of existing machinery, not new physics:

- similarity scoring runs on the INT8 CODES from
  operators/similarity.quantize_embeddings_int8 (q94's hash-checked
  quantizer; per-vector scales cancel out of the cosine, q130's
  device). This is both the 100 TB serving representation (4× less
  memory traffic than float32) and the exactness device: the ONLY
  accumulation anywhere is an integer dot product (≤ dim·127² —
  exact in int64 and in float64), and everything after it is a fixed
  chain of single IEEE scalar ops (multiply, sqrt, divide, crnd-6) —
  bit-identical no matter which tier, which blocking, or which
  engine computes it. The round-7 "GEMM-vs-fold agreement is
  EMPIRICAL" caveat is thereby closed BY CONSTRUCTION: float
  accumulation order, the one thing BLAS reorders, no longer exists
  in the pipeline.
- cell assignment = the IVF KMeans router (operators/similarity
  ivf_cosine_topk's corpus side), on the raw float embeddings;
- within-cell pairs = equi-join on cell id with ``a_vec < b_vec`` —
  the candidate-volume-bounded join shape shared by every near-dup
  path (cost sum(cell_size²)/2, never corpus²);
- duplicate closure + keeper election = operators/components
  (min-label connected components; keeper = the row whose id IS the
  component label — deterministic, same rule as dedup_clusters and
  exact_dedup). Deviation from the paper noted: SemDeDup elects the
  member FARTHEST from the cell centroid to maximize diversity; a
  min-id keeper is decided-at-a-glance deterministic and makes the
  result oracle-checkable — the cluster membership, which is the
  expensive part, is identical.

Scale (100 TB): KMeans state is n_cells × dim on the driver;
assignments are one narrow transform pass; the pair join shuffles on
cell id, so skew is bounded by the largest cell. The GEMM worker's
memory bound is ENFORCED IN CODE (round 8, was caller contract):
cells larger than ``max_cell_rows`` (default derived from the
session's memory conf, the gemm_row_ceiling device) are re-split into
hash blocks and processed as BLOCK-PAIR tasks — every (block i,
block j ≥ i) pair of a cell becomes its own applyInPandas group, so
one task never holds more than ~2·cap rows while the emitted edge
set stays IDENTICAL to the unsplit cell's (all within-cell pairs are
covered exactly once; integer scoring makes the equality bitwise,
asserted by the suite's mega-cell test). Cost of the re-split is the
inherent all-pairs row duplication (each row visits n_blocks tasks),
not a semantic change. Component state is proportional to the
above-threshold subgraph, orders of magnitude smaller than the
corpus.

Exactness contract (the q124 full-probe device): at ``n_cells=1``
the cell partition is trivial, nothing depends on KMeans, and the
result is exact brute-force semantic dedup over the quantized codes —
that configuration is DuckDB-oracle-checked (q128, oracle replays the
same int8 quantization), certifying the pair math, closure, and
keeper election. The clustered configuration (q129) prunes the SAME
pipeline; its edge set is provably a subset of the exact one
(clustering only removes cross-cell comparisons), asserted by the
suite's refinement test; fold-vs-GEMM equality at n_cells=1 is
asserted directly (exact by construction since round 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from morphl_community_edition_spark.functions.rounding import crnd
from morphl_community_edition_spark.operators.components import connected_components
from morphl_community_edition_spark.operators.similarity import (
    _worker_mem_bytes,
    dot,
    quantize_embeddings_int8,
)

# row-block height for the per-task GEMM inner loop (peak scratch is
# ~2 · GEMM_BLOCK_ROWS · task_rows · 8 bytes)
GEMM_BLOCK_ROWS = 1024


def cell_row_cap(spark, dim: int = 64, safety_frac: float = 0.05) -> int:
    """Max rows one GEMM task may hold, derived from the session's
    memory conf (the gemm_row_ceiling device): a task materializes its
    code matrix (rows·dim·8 B) plus two row-block scratch panels
    (2·GEMM_BLOCK_ROWS·rows·8 B), charged against a small fraction of
    EXECUTOR Python-worker memory (round-8 review: the tasks run in
    executor workers, so a big-driver/small-executor cluster must not
    size the valve from the driver; similarity._worker_mem_bytes
    resolves pyspark.memory → executor.memory → local=driver). At the
    default 8g/64-dim this is ~24k rows per task — cells above it
    re-split into block-pair tasks."""
    per_row = dim * 8 + 2 * GEMM_BLOCK_ROWS * 8
    return max(2, int(_worker_mem_bytes(spark) * safety_frac / per_row))


def assign_cells(
    emb: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(n_vec, code, n2, cell): int8 code + integer norm² + KMeans
    cell per vector; n_cells=1 skips ML entirely (single trivial cell
    — the exact configuration). Codes ride as array<double> holding
    exact integers (the q130 convention: every engine sums them
    exactly), n2 as the integer self-dot — hoisted here so neither
    pair tier re-folds it per pair."""
    base = emb.select(
        F.col(id_col).alias("n_vec"),
        F.col(vec_col).cast("array<double>").alias("n_emb"),
    )

    def _code(df: DataFrame) -> DataFrame:
        qz = quantize_embeddings_int8(df, "n_emb", out_q="__q", out_scale="__s")
        return qz.withColumn(
            "code", F.col("__q").cast("array<double>")
        ).withColumn("n2", dot(F.col("code"), F.col("code")))

    if n_cells <= 1:
        return _code(base).select("n_vec", "code", "n2", F.lit(0).alias("cell"))
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # Round 13 (guide §1.2 per-task work): the fit consumes ONLY
    # ``features``, but the old lineage computed the int8 code + norm²
    # below it, so the ML-internal input cache materialized (and held)
    # the quantization for all fit iterations. Cluster first on the
    # raw vectors, quantize ONCE on the transformed output — same
    # rows, order and features reach the seeded fit, so the model and
    # every cell id are unchanged.
    feat = base.withColumn("features", array_to_vector(F.col("n_emb")))
    km = KMeans(k=n_cells, seed=42, featuresCol="features", predictionCol="cell").fit(feat)
    return _code(km.transform(feat)).select("n_vec", "code", "n2", "cell")


def _quantized_sims(dot_int, na2, nb2):
    """The shared numpy tier of the scoring contract: crnd-6 of
    int-dot / (sqrt(na²·nb²) + 1e-30). All inputs are exact int64;
    every op after the integer dot is a single correctly-rounded IEEE
    scalar op, so the result is bit-identical to the JVM fold
    expression and the DuckDB oracle."""
    import numpy as np

    den = np.sqrt((na2[:, None] * nb2[None, :]).astype(np.float64)) + 1e-30
    sims = dot_int.astype(np.float64) / den
    return np.floor(sims * 1e6 + 0.5) / 1e6


def _gemm_cell_edges(
    assigned: DataFrame, threshold: float, max_cell_rows: int | None = None
) -> DataFrame:
    """Per-cell dense-GEMM pair generation (grouped applyInPandas):
    each task's codes become one numpy FLOAT64 matrix holding exact
    small integers (|code| ≤ 127, so every product ≤ 127²·dim ≈ 10⁶
    and every partial sum stays far below 2⁵³ — float64 addition of
    such integers is EXACT and therefore order-independent), and
    similarities one row-blocked M·Mᵀ that dispatches to BLAS DGEMM —
    the literal per-cluster similarity matrix from the SemDeDup paper,
    Arrow-batched, at BLAS speed (an int64 matrix would silently fall
    back to numpy's generic integer loop, 10-50× slower — the round-8
    review caught that regression). Scoring stays the integer
    contract (_quantized_sims): the dot values are integers whichever
    representation carries them, so this tier equals the JVM fold
    bit-for-bit BY CONSTRUCTION.

    Memory bound, enforced (round 8): cells larger than
    ``max_cell_rows`` (default cell_row_cap at the frame's ACTUAL
    code dimension, probed with one first() row) are hash-re-split
    into blocks and each (bi ≤ bj) block pair becomes its own task —
    within-block pairs run at bi == bj, cross-block pairs at
    bi < bj — so the task memory cap holds for ANY cell size while
    the emitted edge set is identical to the unsplit cell's."""
    spark = assigned.sparkSession
    # one tiny job resolves BOTH valve inputs (cell sizes + code dim):
    # ≤ n_cells rows of partial-agg output, so the driver read is
    # bounded (round-9 fast path; the r8 shape paid a dim-probe job
    # plus a broadcast-join + explode even when every cell fit)
    stats = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("__cn"), F.max(F.size("code")).alias("__d")
    ).localCheckpoint(eager=True)  # ≤ n_cells rows; the valve-active
    # path's broadcast join reuses this materialization instead of
    # re-aggregating the corpus-sized frame (round-9 review)
    top = stats.agg(
        F.max("__cn").alias("mx"), F.max("__d").alias("d")
    ).first()
    max_cn = int(top["mx"]) if top and top["mx"] is not None else 0
    if max_cell_rows is None:
        max_cell_rows = cell_row_cap(spark, int(top["d"]) if top and top["d"] else 64)
    if max_cn <= max_cell_rows:
        # valve inactive everywhere: one task per cell, no block
        # join, no explode, zero duplicated rows — the common shape
        # (nb == 1) pays nothing beyond the stats probe
        blocked = assigned.select(
            "cell",
            F.lit(0).alias("__bi"),
            F.lit(0).alias("__bj"),
            F.lit(0).alias("__blk"),
            "n_vec",
            "code",
            "n2",
        )
        return _group_tasks(blocked).applyInPandas(
            _gemm_pairs_fn(threshold), schema="a_vec bigint, b_vec bigint, sim double"
        )
    # cell-count-sized frame, broadcast back: how many hash blocks
    # each cell needs (1 = valve inactive, zero extra rows)
    nb = F.greatest(
        F.ceil(F.col("__cn") / F.lit(max_cell_rows)).cast("int"), F.lit(1)
    )
    blocked = (
        assigned.join(F.broadcast(stats.select("cell", nb.alias("__nb"))), "cell")
        .withColumn("__blk", F.pmod(F.xxhash64("n_vec"), F.col("__nb")).cast("int"))
        # one output row per (row, counterpart block): the task for
        # blocks (b, o) is keyed (min(b,o), max(b,o)), so each task
        # receives exactly the rows of its two blocks (or one, when
        # bi == bj) and all within-cell pairs are covered exactly once
        .withColumn(
            "__task",
            F.explode(
                F.expr(
                    "transform(sequence(0, __nb - 1), o -> "
                    "struct(least(__blk, o) AS bi, greatest(__blk, o) AS bj))"
                )
            ),
        )
        .select(
            "cell",
            F.col("__task.bi").alias("__bi"),
            F.col("__task.bj").alias("__bj"),
            "__blk",
            "n_vec",
            "code",
            "n2",
        )
    )

    return _group_tasks(blocked).applyInPandas(
        _gemm_pairs_fn(threshold), schema="a_vec bigint, b_vec bigint, sim double"
    )


def _group_tasks(blocked: DataFrame):
    """groupBy (cell, bi, bj) at a partition count that can actually
    occupy the machine (round 10, the similarity._gemm_id_frame
    contract applied to the grouped-GEMM path): a bare groupBy's
    exchange lands in spark.sql.shuffle.partitions partitions, and a
    small setting — the sf0.1 bench profile pins 2 — serializes the
    per-cell O(rows²) GEMM tasks onto 2 workers (measured: q129
    3.26 → 2.66 s at 32). The explicit hash repartition on the SAME
    keys satisfies the groupBy's clustering requirement, so no second
    exchange appears; the count only ever raises the conf value."""
    spark = blocked.sparkSession
    n_part = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
    )
    return blocked.repartition(n_part, "cell", "__bi", "__bj").groupBy(
        "cell", "__bi", "__bj"
    )


def _gemm_pairs_fn(threshold: float):
    """The per-task GEMM kernel shared by both valve paths: scores one
    (cell, block-pair) group — whole cell when __bi == __bj == 0 —
    and emits its above-threshold (a_vec < b_vec, sim) edges."""

    def pairs(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({"a_vec": [], "b_vec": [], "sim": []}).astype(
            {"a_vec": "int64", "b_vec": "int64", "sim": "float64"}
        )
        bi, bj = int(pdf["__bi"].iloc[0]), int(pdf["__bj"].iloc[0])
        out_a, out_b, out_s = [], [], []

        def block(sub):
            order = np.argsort(sub["n_vec"].to_numpy())
            ids = sub["n_vec"].to_numpy()[order]
            # float64 carrier for the int8 codes: keeps M·Mᵀ on BLAS
            # DGEMM while every product/sum stays an exactly
            # representable integer (≤ 127²·dim ≪ 2⁵³)
            M = np.vstack(sub["code"].to_numpy()[order]).astype(np.float64)
            n2 = sub["n2"].to_numpy()[order].astype(np.int64)
            return ids, M, n2

        if bi == bj:
            if len(pdf) < 2:
                return empty
            ids, M, n2 = block(pdf)
            n = len(ids)
            jj = np.arange(n)
            for s0 in range(0, n, GEMM_BLOCK_ROWS):
                hi = min(s0 + GEMM_BLOCK_ROWS, n)
                sims = _quantized_sims(M[s0:hi] @ M.T, n2[s0:hi], n2)
                ii = np.arange(s0, hi)
                mask = (sims >= threshold) & (jj[None, :] > ii[:, None])
                r, c = np.nonzero(mask)
                out_a.append(ids[r + s0])
                out_b.append(ids[c])
                out_s.append(sims[r, c])
        else:
            a_side = pdf[pdf["__blk"] == bi]
            b_side = pdf[pdf["__blk"] == bj]
            if not len(a_side) or not len(b_side):
                return empty
            ida, Ma, n2a = block(a_side)
            idb, Mb, n2b = block(b_side)
            for s0 in range(0, len(ida), GEMM_BLOCK_ROWS):
                hi = min(s0 + GEMM_BLOCK_ROWS, len(ida))
                sims = _quantized_sims(Ma[s0:hi] @ Mb.T, n2a[s0:hi], n2b)
                mask = sims >= threshold
                r, c = np.nonzero(mask)
                # blocks are disjoint row sets, so orient each pair
                # by id to keep the a_vec < b_vec edge convention
                x, y = ida[r + s0], idb[c]
                out_a.append(np.minimum(x, y))
                out_b.append(np.maximum(x, y))
                out_s.append(sims[r, c])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "a_vec": np.concatenate(out_a),
                "b_vec": np.concatenate(out_b),
                "sim": np.concatenate(out_s),
            }
        )

    return pairs


def semantic_dup_edges(
    assigned: DataFrame,
    threshold: float,
    method: str = "fold",
    max_cell_rows: int | None = None,
) -> DataFrame:
    """(a_vec, b_vec, sim) within-cell pairs with the crnd-6 quantized
    cosine >= threshold. Scoring is the integer contract (module
    docstring): int8-code dot products are the only accumulation, so
    the edge set is engine- AND tier-deterministic by construction.

    ``method``: 'fold' = pure-JVM array-fold expressions (the
    oracle-twin shape; memory-safe at any cell size — the equi-join
    streams and spills); 'gemm' = per-cell numpy GEMM via
    applyInPandas with the enforced ``max_cell_rows`` task valve (the
    scale tier — what semantic_dedup executes; bitwise-equal to the
    fold, asserted at n_cells=1 by the suite)."""
    if method == "gemm":
        return _gemm_cell_edges(assigned, threshold, max_cell_rows)
    if method != "fold":
        raise ValueError(f"method must be 'fold' or 'gemm', got {method!r}")
    a = assigned.select(
        "cell",
        F.col("n_vec").alias("a_vec"),
        F.col("code").alias("a_code"),
        F.col("n2").alias("a_n2"),
    )
    b = assigned.select(
        "cell",
        F.col("n_vec").alias("b_vec"),
        F.col("code").alias("b_code"),
        F.col("n2").alias("b_n2"),
    )
    # same op chain as _quantized_sims: integer dot, sqrt of the
    # integer product, +1e-30, divide, crnd-6
    sim = crnd(
        dot(F.col("a_code"), F.col("b_code"))
        / (F.sqrt(F.col("a_n2") * F.col("b_n2")) + F.lit(1e-30)),
        6,
    )
    return (
        a.join(b, "cell")
        .filter(F.col("a_vec") < F.col("b_vec"))
        .select("a_vec", "b_vec", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.4,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_rows: int | None = None,
) -> DataFrame:
    """Per-vector verdict (vec_id, comp, cluster_size, keep): comp is
    the duplicate-group label (min reachable id; singletons label
    themselves), keep marks the elected representative. Pair tier:
    GEMM for both configurations (single cell = one whole-corpus
    group, re-split by the task valve when it exceeds the memory cap;
    the round-7 sweep read 12.5 s at sf0.1 through the fold vs ~3 s
    GEMM). Since round 8 the GEMM tier is bitwise-equal to the fold
    tier by construction (integer scoring contract), so running the
    oracle-checked q128 configuration through GEMM is exact, not an
    empirical posture; the fold tier stays live through the suite's
    direct equality and refinement tests."""
    # truncate once: assigned feeds the pair tier, the valve's
    # cell-size agg, the dim probe, AND the final verdict join — an
    # un-materialized frame would re-run the quantization + KMeans
    # transform for each (round-8 review finding)
    assigned = assign_cells(emb, n_cells, id_col, vec_col).localCheckpoint(eager=True)
    edges = semantic_dup_edges(
        assigned, threshold, method="gemm", max_cell_rows=max_cell_rows
    )
    comp = connected_components(edges, "a_vec", "b_vec")
    full = (
        assigned.select("n_vec")
        .join(comp, F.col("n_vec") == F.col("n"), "left")
        .select(
            F.col("n_vec").alias("vec_id"),
            F.coalesce(F.col("comp"), F.col("n_vec")).alias("comp"),
        )
    )
    sizes = full.groupBy("comp").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return full.join(sizes, "comp").select(
        "vec_id",
        "comp",
        "cluster_size",
        (F.col("vec_id") == F.col("comp")).alias("keep"),
    )

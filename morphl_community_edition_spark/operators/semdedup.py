"""SemDeDup-style semantic deduplication (K2/K3 composition, round
7): embedding-space near-duplicate removal following the public
SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540) — cluster the
corpus embeddings into cells, compare pairs only WITHIN a cell,
connect pairs above a cosine threshold into duplicate groups, keep
one representative per group.

Composition of existing machinery, not new physics:

- cell assignment = the IVF KMeans router (operators/similarity
  ivf_cosine_topk's corpus side);
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
cell id, so skew is bounded by the largest cell (pick n_cells ≈
corpus/10⁵ and re-split outlier cells — the paper does the same);
component state is proportional to the above-threshold subgraph,
orders of magnitude smaller than the corpus.

Exactness contract (the q124 full-probe device): at ``n_cells=1``
the cell partition is trivial, nothing depends on KMeans, and the
result is exact brute-force semantic dedup — that configuration is
DuckDB-oracle-checked (q128), certifying the pair math, closure, and
keeper election. The clustered configuration (q129) prunes the SAME
pipeline; its edge set is provably a subset of the exact one
(clustering only removes cross-cell comparisons), asserted by the
suite's refinement test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from morphl_community_edition_spark.functions.rounding import crnd
from morphl_community_edition_spark.operators.components import connected_components
from morphl_community_edition_spark.operators.similarity import dot


def assign_cells(
    emb: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(n_vec, n_emb, cell): KMeans cell per vector; n_cells=1 skips
    ML entirely (single trivial cell — the exact configuration)."""
    base = emb.select(
        F.col(id_col).alias("n_vec"),
        F.col(vec_col).cast("array<double>").alias("n_emb"),
    )
    if n_cells <= 1:
        return base.withColumn("cell", F.lit(0))
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = base.withColumn("features", array_to_vector(F.col("n_emb")))
    km = KMeans(k=n_cells, seed=42, featuresCol="features", predictionCol="cell").fit(feat)
    return km.transform(feat).select("n_vec", "n_emb", "cell")


def _gemm_cell_edges(assigned: DataFrame, threshold: float) -> DataFrame:
    """Per-cell dense-GEMM pair generation (grouped applyInPandas):
    each cell's vectors become one numpy matrix, similarities one
    blocked M·Mᵀ — the literal per-cluster similarity matrix from the
    SemDeDup paper, and the Arrow-batched fast path for the quadratic
    inner loop (measured 38.6 s -> ~4 s on the 10×-corpus sweep
    variant vs the JVM fold). Identical crnd-6 rounding FORMULA — but
    BLAS M·Mᵀ accumulates in a different order than the sequential
    JVM fold, so agreement of the rounded values is EMPIRICAL, not
    proven: a cosine within 1 ulp of a floor boundary (or of the
    threshold) could in principle round apart. The refinement suite
    is the standing guard (it runs one side on each tier and asserts
    the gemm edge set ⊆ the fold edge set); same accepted posture as
    the q38/q12 GEMM dispatcher, oracle-hash-green across rounds.

    Memory bound: one cell must fit a worker — row-blocked at 1024
    rows so peak is 1024 × cell_size doubles, plus the cell's
    vectors; cells are sized (and outliers re-split) so this holds,
    per the module contract."""

    def pairs(pdf):
        import numpy as np
        import pandas as pd

        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"a_vec": [], "b_vec": [], "sim": []}).astype(
                {"a_vec": "int64", "b_vec": "int64", "sim": "float64"}
            )
        order = np.argsort(pdf["n_vec"].to_numpy())
        ids = pdf["n_vec"].to_numpy()[order]
        M = np.vstack(pdf["n_emb"].to_numpy()[order]).astype(np.float64)
        nr = np.sqrt((M * M).sum(axis=1))
        jj = np.arange(n)
        out_a, out_b, out_s = [], [], []
        B = 1024
        for s0 in range(0, n, B):
            blk = M[s0 : s0 + B] @ M.T
            sims = blk / np.outer(nr[s0 : s0 + B], nr)
            sims = np.floor(sims * 1e6 + 0.5) / 1e6
            ii = np.arange(s0, min(s0 + B, n))
            mask = (sims >= threshold) & (jj[None, :] > ii[:, None])
            r, c = np.nonzero(mask)
            out_a.append(ids[r + s0])
            out_b.append(ids[c])
            out_s.append(sims[r, c])
        return pd.DataFrame(
            {
                "a_vec": np.concatenate(out_a),
                "b_vec": np.concatenate(out_b),
                "sim": np.concatenate(out_s),
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        pairs, schema="a_vec bigint, b_vec bigint, sim double"
    )


def semantic_dup_edges(
    assigned: DataFrame, threshold: float, method: str = "fold"
) -> DataFrame:
    """(a_vec, b_vec, sim) within-cell pairs with rounded cosine >=
    threshold. The compare runs on the 6-decimal canonical rounding
    (functions/rounding) so the edge SET is engine-deterministic.

    ``method``: 'fold' = pure-JVM array-fold expressions (the
    oracle-twin shape, used by the exact q128 configuration);
    'gemm' = per-cell numpy GEMM via applyInPandas (the scale tier —
    what semantic_dedup picks whenever it actually clusters)."""
    if method == "gemm":
        return _gemm_cell_edges(assigned, threshold)
    if method != "fold":
        raise ValueError(f"method must be 'fold' or 'gemm', got {method!r}")
    # norms hoisted to one fold per VECTOR before the join — inside
    # the pair expression they would re-fold both self-dots per PAIR,
    # tripling the dominant cost (measured 144 s -> ~50 s on the 10×
    # sweep corpus). sqrt(dot(v, v)) on the same rows is bitwise the
    # same value either side of the join, so the oracle contract is
    # untouched.
    withn = assigned.withColumn(
        "__n", F.sqrt(dot(F.col("n_emb"), F.col("n_emb")))
    )
    a = withn.select(
        "cell",
        F.col("n_vec").alias("a_vec"),
        F.col("n_emb").alias("a_emb"),
        F.col("__n").alias("a_n"),
    )
    b = withn.select(
        "cell",
        F.col("n_vec").alias("b_vec"),
        F.col("n_emb").alias("b_emb"),
        F.col("__n").alias("b_n"),
    )
    sim = crnd(
        dot(F.col("a_emb"), F.col("b_emb")) / (F.col("a_n") * F.col("b_n")),
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
) -> DataFrame:
    """Per-vector verdict (vec_id, comp, cluster_size, keep): comp is
    the duplicate-group label (min reachable id; singletons label
    themselves), keep marks the elected representative. Pair tier:
    GEMM for both configurations (single cell = one whole-corpus
    group; the round-7 sweep read 12.5 s at sf0.1 through the fold vs
    ~3 s GEMM, and the GEMM-under-oracle posture has the q38/q12
    precedent). The fold tier remains the oracle-twin FORMULA and
    keeps live coverage through the refinement suite, which runs the
    exact side on fold against this gemm path."""
    assigned = assign_cells(emb, n_cells, id_col, vec_col)
    edges = semantic_dup_edges(assigned, threshold, method="gemm")
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

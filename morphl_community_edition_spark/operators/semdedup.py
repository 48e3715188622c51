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


def semantic_dup_edges(assigned: DataFrame, threshold: float) -> DataFrame:
    """(a_vec, b_vec, sim) within-cell pairs with rounded cosine >=
    threshold. The compare runs on the 6-decimal canonical rounding
    (functions/rounding) so the edge SET is engine-deterministic."""
    a = assigned.select(
        "cell", F.col("n_vec").alias("a_vec"), F.col("n_emb").alias("a_emb")
    )
    b = assigned.select(
        "cell", F.col("n_vec").alias("b_vec"), F.col("n_emb").alias("b_emb")
    )
    sim = crnd(
        dot(F.col("a_emb"), F.col("b_emb"))
        / (
            F.sqrt(dot(F.col("a_emb"), F.col("a_emb")))
            * F.sqrt(dot(F.col("b_emb"), F.col("b_emb")))
        ),
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
    themselves), keep marks the elected representative."""
    assigned = assign_cells(emb, n_cells, id_col, vec_col)
    edges = semantic_dup_edges(assigned, threshold)
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

"""Embedding clustering (M5): seeded KMeans on the embeddings table,
quality-checked by adjusted Rand index against the fixture's label
column (0-9) — never hash-checked (RNG/init differ across engines).
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 42


def kmeans_embeddings(emb: DataFrame, k: int = 10) -> DataFrame:
    vecs = emb.select(
        "vec_id", "label", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = KMeans(k=k, seed=SEED, featuresCol="features", predictionCol="cluster").fit(vecs)
    return model.transform(vecs).select("vec_id", "label", "cluster")


def adjusted_rand_index(assigned: DataFrame) -> float:
    """ARI between `label` and `cluster`, computed distributively from
    the pair-count contingency sums (no collect of the full table)."""
    n = assigned.count()
    comb2 = lambda c: c * (c - 1) / 2  # noqa: E731
    cont = assigned.groupBy("label", "cluster").count()
    sum_ij = cont.select(F.sum(F.col("count") * (F.col("count") - 1) / 2)).collect()[0][0]
    a = cont.groupBy("label").agg(F.sum("count").alias("c"))
    sum_a = a.select(F.sum(F.col("c") * (F.col("c") - 1) / 2)).collect()[0][0]
    b = cont.groupBy("cluster").agg(F.sum("count").alias("c"))
    sum_b = b.select(F.sum(F.col("c") * (F.col("c") - 1) / 2)).collect()[0][0]
    expected = sum_a * sum_b / comb2(n)
    max_index = (sum_a + sum_b) / 2
    return float((sum_ij - expected) / (max_index - expected))

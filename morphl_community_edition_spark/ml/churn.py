"""Churn model (M1-M4): the reference's flagship pipeline re-expressed.

MorphL's GA-churning-users pipeline computes per-user engagement
features in PySpark, labels churn by an inactivity threshold, trains a
classifier and batch-scores all users back into storage [PUBLIC,
SURVEY.md §1, §3 L1-L3/M1-M4]. Here:

    events → engagement_features (queries/workload.py, the SAME
    oracle-checked Q31 aggregation) → VectorAssembler → StandardScaler
    → LogisticRegression (seeded) → batch scoring

Fixture note: the synthetic events table has users uniformly active
through the whole window (per-user recency is 1-3 days at every SF),
so the reference's inactivity label is constant=1 here. The pipeline
is therefore label-parametric: the contract churn label exercises the
plumbing; ``label_high_purchaser`` (above-median purchase count,
predicted from the NON-purchase features) provides a label with
variation for a real learning check.

Scale: training data is one row per user (≪ raw events); the heavy
lifting is the feature aggregation, which is a single shuffle. Batch
scoring is embarrassingly parallel (model broadcast by
``model.transform``; at extreme scale export + mapInPandas scoring
avoids JVM<->Python churn per stage).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_COLS = ["n_events", "sum_value", "avg_value", "types", "purchases"]
BEHAVIOR_COLS = ["n_events", "sum_value", "avg_value", "types"]  # excludes purchases
SEED = 42


def label_high_purchaser(features: DataFrame, label_col: str = "label") -> DataFrame:
    """1 if the user's purchase count is >= the dataset median —
    balanced by construction, learnable from engagement volume."""
    median = features.agg(F.percentile("purchases", 0.5)).collect()[0][0]
    return features.withColumn(label_col, (F.col("purchases") >= median).cast("int"))


def build_pipeline(
    feature_cols: list[str] | None = None,
    label_col: str = "churned",
    algorithm: str = "lr",
) -> Pipeline:
    """M2: LogisticRegression (GLM-first per SURVEY.md §3 M2) or
    GBTClassifier — both behind the same assemble→scale→fit shape."""
    if algorithm == "lr":
        clf = LogisticRegression(featuresCol="features", labelCol=label_col, maxIter=50, regParam=0.01)
    elif algorithm == "gbt":
        from pyspark.ml.classification import GBTClassifier

        clf = GBTClassifier(featuresCol="features", labelCol=label_col, maxIter=20, maxDepth=3, seed=SEED)
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}; expected 'lr' or 'gbt'")
    return Pipeline(
        stages=[
            VectorAssembler(inputCols=feature_cols or FEATURE_COLS, outputCol="raw_features"),
            StandardScaler(inputCol="raw_features", outputCol="features", withMean=True, withStd=True),
            clf,
        ]
    )


def cross_validated_lr(
    features: DataFrame,
    feature_cols: list[str] | None = None,
    label_col: str = "churned",
    n_folds: int = 3,
):
    """M2's CrossValidator path: seeded 2-D grid over LR
    regularization strength × elastic-net mixing (3×2 = 6 candidate
    pipelines, k-fold each). Training data is one row per user (tiny
    next to the raw events), so k-fold CV is cheap even at 100 TB of
    events — the fold splits, fits, and metric evaluation are all
    seeded, so the selected model and avgMetrics are run-to-run
    deterministic (M-suite asserts this)."""
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    pipeline = build_pipeline(feature_cols, label_col, "lr")
    lr = pipeline.getStages()[-1]
    grid = (
        ParamGridBuilder()
        .addGrid(lr.regParam, [0.001, 0.01, 0.1])
        .addGrid(lr.elasticNetParam, [0.0, 0.5])
        .build()
    )
    cv = CrossValidator(
        estimator=pipeline,
        estimatorParamMaps=grid,
        evaluator=BinaryClassificationEvaluator(labelCol=label_col, rawPredictionCol="rawPrediction"),
        numFolds=n_folds,
        seed=SEED,
        parallelism=4,
    )
    return cv.fit(features)


def train_churn_model(
    features: DataFrame,
    train_frac: float = 0.8,
    feature_cols: list[str] | None = None,
    label_col: str = "churned",
    algorithm: str = "lr",
) -> tuple[PipelineModel, DataFrame, float]:
    """Seeded train/test split (M4 — split is seeded but never
    oracle-checked: RNG differs across engines by design), fit, and
    AUC on the held-out fraction."""
    train, test = features.randomSplit([train_frac, 1 - train_frac], seed=SEED)
    model = build_pipeline(feature_cols, label_col, algorithm).fit(train)
    scored = model.transform(train if test.isEmpty() else test)
    auc = BinaryClassificationEvaluator(labelCol=label_col, rawPredictionCol="rawPrediction").evaluate(scored)
    return model, scored, auc


def score_users(model: PipelineModel, features: DataFrame) -> DataFrame:
    """M3 batch scoring: user_id → probability (the row shape the
    reference upserts into Cassandra daily; our sink is
    sources.batch.write_parquet_partitioned)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(features)
    return scored.select(
        "user_id", vector_to_array("probability").getItem(1).alias("churn_probability")
    )


def score_users_arrow(model: PipelineModel, features: DataFrame) -> DataFrame:
    """M3 scale path: extract the fitted LR's affine form (coefficients
    over STANDARDIZED features + intercept), broadcast those few
    hundred bytes, and score inside mapInPandas with numpy — no JVM
    MLlib transform in the hot loop, one Arrow exchange per batch.

    This is how daily scoring runs at 100 TB: model.transform drags a
    VectorAssembler→StandardScaler→LR stage pipeline through the JVM
    per row-batch, while the algebra is just sigmoid(x·w + b); the
    scaler folds into the weights (w' = w/σ, b' = b − Σ μᵢwᵢ/σᵢ), so
    the scoring job is a pure vectorized map over raw feature columns.
    Only valid for LR pipelines (assembler→scaler→lr); parity with
    model.transform is asserted in tests/test_ml.py."""
    import numpy as np
    import pandas as pd
    from pyspark.ml.classification import LogisticRegressionModel

    scaler, lr = model.stages[1], model.stages[2]
    if not isinstance(lr, LogisticRegressionModel):
        raise ValueError(
            "score_users_arrow folds scaler+LR into an affine form and only "
            f"supports LogisticRegression pipelines; got {type(lr).__name__} "
            "(use score_users / model.transform for tree models)"
        )
    assembled_cols = model.stages[0].getInputCols()
    sigma = scaler.std.toArray()
    mu = scaler.mean.toArray() if scaler.getWithMean() else np.zeros_like(sigma)
    w = lr.coefficients.toArray() / np.where(sigma == 0.0, 1.0, sigma)
    b = float(lr.intercept) - float((mu * w).sum())

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("churn_probability", T.DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            x = pdf[assembled_cols].to_numpy(dtype="float64")
            z = x @ w + b
            yield pd.DataFrame(
                {"user_id": pdf["user_id"], "churn_probability": 1.0 / (1.0 + np.exp(-z))}
            )

    return features.select("user_id", *assembled_cols).mapInPandas(run, out_schema)

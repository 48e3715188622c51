"""Reshape + sequence operators: pivot/unpivot (q53/q54), daily
gap-fill resample (q55), edit distance (q56).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from morphl_community_edition_spark.catalog import load_table
from morphl_community_edition_spark.functions.rounding import crnd, sql_crnd
from morphl_community_edition_spark.operators.resample import daily_gapfill
from morphl_community_edition_spark.queries import query
from morphl_community_edition_spark.queries.windows import EVENTS_US

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "q53_pivot",
    oracle=f"""
    SELECT user_id,
           {", ".join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in EVENT_TYPES)}
    FROM {EVENTS_US} e
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q53_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type count matrix (the reference's
    shopping-stage feature shape). Explicit value list — at scale an
    unbounded pivot would first scan for distinct values."""
    ev = load_table(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    renamed = pivoted.select(
        "user_id", *[F.col(t).alias(f"n_{t}") for t in EVENT_TYPES]
    )
    return renamed.orderBy("user_id")


@query(
    "q54_unpivot",
    oracle=f"""
    WITH p AS (
      SELECT user_id,
             {", ".join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in EVENT_TYPES)}
      FROM {EVENTS_US} e GROUP BY user_id)
    SELECT user_id, kind, cnt FROM p
    UNPIVOT (cnt FOR kind IN ({", ".join(f"n_{t}" for t in EVENT_TYPES)}))
    ORDER BY user_id, kind
    """,
)
def q54_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) back to long form — pivot∘unpivot round-trips
    the q53 matrix."""
    wide = q53_pivot(spark, sf_dir)
    return (
        wide.unpivot(
            ["user_id"], [f"n_{t}" for t in EVENT_TYPES], "kind", "cnt"
        )
        .orderBy("user_id", "kind")
    )


@query(
    "q55_daily_gapfill",
    oracle=f"""
    WITH e AS (SELECT * FROM {EVENTS_US}),
    daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n_obs,
             max({{'t': ts, 'v': value}}) AS last_pair
      FROM e GROUP BY user_id, day),
    d2 AS (SELECT user_id, day, n_obs, last_pair.v AS day_value FROM daily),
    spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM d2 GROUP BY user_id),
    cal AS (SELECT user_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
            FROM spans),
    j AS (SELECT c.user_id, c.day, coalesce(d.n_obs, 0) AS n_obs, d.day_value
          FROM cal c LEFT JOIN d2 d ON d.user_id = c.user_id AND d.day = c.day)
    SELECT user_id, day, CAST(n_obs AS BIGINT) AS n_obs,
           {sql_crnd("last_value(day_value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 2)} AS ffill_value
    FROM j
    ORDER BY user_id, day
    LIMIT 5000
    """,
)
def q55_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resample with forward-fill (operators/resample.py)."""
    ev = load_table(spark, sf_dir, "events")
    out = daily_gapfill(ev)
    return (
        out.select("user_id", "day", "n_obs", crnd(F.col("ffill_value"), 2).alias("ffill_value"))
        .orderBy("user_id", "day")
        .limit(5000)
    )


@query(
    "q56_edit_distance",
    oracle="""
    WITH d AS (SELECT doc_id, substring(text, 1, 24) AS prefix FROM documents WHERE doc_id < 40)
    SELECT a.doc_id AS a_doc, b.doc_id AS b_doc,
           CAST(levenshtein(a.prefix, b.prefix) AS INTEGER) AS dist
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE levenshtein(a.prefix, b.prefix) <= 12
    ORDER BY a_doc, b_doc
    """,
)
def q56_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup (bounded input: 40-doc prefix block —
    levenshtein is O(m·n) per pair; at scale it's the REFINE step after
    LSH/SimHash candidate generation, never the generator)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", F.substring("text", 1, 24).alias("prefix"))
    )
    a = docs.select(F.col("doc_id").alias("a_doc"), F.col("prefix").alias("a_p"))
    b = docs.select(F.col("doc_id").alias("b_doc"), F.col("prefix").alias("b_p"))
    return (
        a.join(F.broadcast(b), F.col("a_doc") < F.col("b_doc"))
        .withColumn("dist", F.levenshtein("a_p", "b_p"))
        .filter(F.col("dist") <= 12)
        .select("a_doc", "b_doc", "dist")
        .orderBy("a_doc", "b_doc")
    )

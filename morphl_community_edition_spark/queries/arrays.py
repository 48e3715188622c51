"""Array + higher-order function gauntlets (H4 depth): q58, q59.

Order-sensitive array results are canonicalized (sort + string-join)
before comparison — Spark's array_intersect keeps left-operand order
while DuckDB's list_intersect makes no ordering promise, so raw array
outputs would be an unfair oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from morphl_community_edition_spark.catalog import load_table
from morphl_community_edition_spark.queries import query

STOPLIST = ("the", "a", "and", "value", "table")
_SQL_STOPLIST = "[" + ", ".join(f"'{w}'" for w in STOPLIST) + "]"


@query(
    "q58_array_ops",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    SELECT doc_id,
           array_to_string(ws[1:3], ' ')                                   AS first3,
           array_to_string(list_sort(list_distinct(ws))[1:5], ',')         AS sorted5,
           CAST(len(list_intersect(list_distinct(ws), {_SQL_STOPLIST})) AS INTEGER) AS n_stop,
           list_contains(ws, 'the')                                        AS has_the,
           ws[-1]                                                          AS last_word,
           CAST(len(ws) AS INTEGER)                                        AS n_words
    FROM t ORDER BY doc_id
    """,
)
def q58_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    stop = F.array(*[F.lit(w) for w in STOPLIST])
    return (
        docs.select(
            "doc_id",
            F.array_join(F.slice(ws, 1, 3), " ").alias("first3"),
            F.array_join(F.slice(F.array_sort(F.array_distinct(ws)), 1, 5), ",").alias("sorted5"),
            F.size(F.array_intersect(F.array_distinct(ws), stop)).alias("n_stop"),
            F.array_contains(ws, "the").alias("has_the"),
            F.element_at(ws, -1).alias("last_word"),
            F.size(ws).alias("n_words"),
        )
        .orderBy("doc_id")
    )


@query(
    "q59_higher_order",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    SELECT doc_id,
           CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT) AS total_chars,
           CAST(len(list_filter(ws, x -> length(x) > 5)) AS INTEGER)    AS n_long,
           len(list_filter(ws, x -> length(x) > 7)) > 0                 AS any_very_long,
           len(list_filter(ws, x -> length(x) >= 20)) = 0               AS all_short
    FROM t ORDER BY doc_id
    """,
)
def q59_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform / filter / exists / forall / aggregate — all
    JVM-side lambda expressions inside codegen, the no-UDF way to do
    per-row collection math at scale."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    total_chars = F.aggregate(
        F.transform(ws, lambda x: F.length(x).cast("long")), F.lit(0).cast("long"), lambda s, x: s + x
    )
    return (
        docs.select(
            "doc_id",
            total_chars.alias("total_chars"),
            F.size(F.filter(ws, lambda x: F.length(x) > 5)).alias("n_long"),
            F.exists(ws, lambda x: F.length(x) > 7).alias("any_very_long"),
            F.forall(ws, lambda x: F.length(x) < 20).alias("all_short"),
        )
        .orderBy("doc_id")
    )

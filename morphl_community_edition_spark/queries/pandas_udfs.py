"""Pandas-UDF surface completion: grouped-map applyInPandas (J2, q45)
and grouped-aggregate pandas UDF (J3, q46).

Both mirror their oracle SQL through the exact-integer-moments trick
(functions/rounding.py): the Python side recovers the same scaled
integers the SQL side sums, so the float results are bit-identical
despite pandas' pairwise summation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from morphl_community_edition_spark.catalog import load_table
from morphl_community_edition_spark.functions.rounding import sql_crnd
from morphl_community_edition_spark.queries import query
from morphl_community_edition_spark.queries.windows import EVENTS_US

_ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("z", T.DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # exact integer moments (value is 2-decimal): identical doubles to
    # the SQL twin regardless of summation order
    cents = np.floor(pdf["value"].to_numpy() * 1e2 + 0.5).astype(np.int64)
    n = float(len(cents))
    s = float(int(cents.sum()))
    s2 = float(int((cents * cents).sum()))
    sd_scaled = np.sqrt((n * s2 - s * s) / (n * (n - 1)))
    mean_scaled = s / n
    z = (cents - mean_scaled) / sd_scaled
    z = np.floor(z * 1e6 + 0.5) / 1e6
    return pd.DataFrame({"event_id": pdf["event_id"], "event_type": pdf["event_type"], "z": z})


@query(
    "q45_grouped_map_zscore",
    oracle=f"""
    WITH e AS (SELECT * FROM {EVENTS_US}),
    m AS (SELECT event_type,
            CAST(count(*) AS DOUBLE) AS n,
            CAST(sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) AS s,
            CAST(sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT) * CAST(floor(value * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) AS s2
          FROM e GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           {sql_crnd("(CAST(floor(e.value * 1e2 + 0.5) AS BIGINT) - m.s / m.n) / sqrt((m.n * m.s2 - m.s * m.s) / (m.n * (m.n - 1)))", 6)} AS z
    FROM e JOIN m USING (event_type)
    ORDER BY event_id
    LIMIT 2000
    """,
)
def q45_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 grouped-map: per-event_type z-score via applyInPandas — the
    reference's per-cohort normalization shape. Each group becomes one
    Arrow-batched pandas frame on a worker."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return (
        ev.groupBy("event_type")
        .applyInPandas(_zscore_group, schema=_ZSCORE_SCHEMA)
        .orderBy("event_id")
        .limit(2000)
    )


@pandas_udf(T.LongType())
def _sum_cents(v: pd.Series) -> int:
    return int(np.floor(v.to_numpy() * 1e2 + 0.5).astype(np.int64).sum())


@pandas_udf(T.LongType())
def _count_rows(v: pd.Series) -> int:
    # Spark refuses to mix pandas grouped-agg UDFs with JVM aggregates
    # in one agg() (INVALID_PANDAS_UDF_PLACEMENT) — so count is a
    # pandas UDAF here too.
    return int(len(v))


@query(
    "q46_grouped_agg_udaf",
    oracle=f"""
    SELECT event_type,
           CAST(sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents,
           count(*) AS cnt
    FROM {EVENTS_US} e
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q46_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 grouped-agg pandas UDF (vectorized UDAF): exact integer sum
    per group, hash-matching the SQL twin."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(_sum_cents(F.col("value")).alias("value_cents"), _count_rows(F.col("value")).alias("cnt"))
        .orderBy("event_type")
    )

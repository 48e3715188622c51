"""Round-14 graph node-id dictionary encoding (verdict r13 #1): the
LPA/PageRank iteration shuffles carry BIGINT node ids instead of
'c…'/'s…' strings (guide §2.3 — narrower shuffle types). Correctness
hinges on ONE property: the encoding preserves the names' ASCII
order exactly (LPA's min-label tie-break and both queries' final
ORDER BY are over the names), and decodes back to the same name.
These tests pin that property in the engine's own SQL expressions,
against both an exhaustive small range and adversarial digit-length
boundaries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from morphl_community_edition_spark.queries.workload import (
    NODE_ENC_OFFSET,
    node_enc,
    node_dec,
)


def _enc_model(tag: int, k: int) -> int:
    """Independent Python model of the encoding (the ab_nodeenc proof
    device): Horner over 17 base-11 positions, digits mapped d+1,
    right-padded with 0."""
    s = str(k)
    acc = 0
    for i in range(17):
        acc = acc * 11 + ((ord(s[i]) - 47) if i < len(s) else 0)
    return tag * NODE_ENC_OFFSET + acc


KEYS = (
    list(range(0, 1500))
    + [9, 10, 11, 99, 100, 101, 999, 1000, 1001]
    + [10**n for n in range(2, 17)]
    + [10**n - 1 for n in range(2, 18)]
    + [10**17 - 1, 31415926535897932, 27182818284590452]
)


def test_encoding_matches_model_and_decodes(spark):
    df = spark.createDataFrame([(k,) for k in KEYS], "k bigint")
    rows = (
        df.select(
            "k",
            node_enc(0, "k").alias("ec"),
            node_enc(1, "k").alias("es"),
        )
        .select(
            "k", "ec", "es",
            node_dec("ec").alias("dc"),
            node_dec("es").alias("ds"),
        )
        .collect()
    )
    for r in rows:
        assert r.ec == _enc_model(0, r.k), r
        assert r.es == _enc_model(1, r.k), r
        assert r.dc == f"c{r.k}", r
        assert r.ds == f"s{r.k}", r


def test_encoding_preserves_ascii_order(spark):
    """Sorting by the encoded BIGINT must equal sorting by the string
    name (Spark's string ordering = binary/ASCII for these names) —
    the exact property LPA's min(struct(-cnt, label)) tie-break and
    the final ORDER BY node rely on."""
    names = [(t, k) for k in KEYS for t in (0, 1)]
    df = spark.createDataFrame(names, "t int, k bigint").select(
        F.concat(
            F.when(F.col("t") == 0, F.lit("c")).otherwise(F.lit("s")),
            F.col("k").cast("string"),
        ).alias("name"),
        F.when(F.col("t") == 0, node_enc(0, "k"))
        .otherwise(node_enc(1, "k"))
        .alias("node_enc_col"),
    )
    by_name = [r.name for r in df.orderBy("name").collect()]
    by_enc = [r.name for r in df.orderBy("node_enc_col").collect()]
    assert by_name == by_enc
    # injectivity: exactly one code per DISTINCT name (KEYS contains
    # deliberate duplicates across its sublists)
    n_distinct_names = len({(t, k) for t, k in names})
    assert df.select("node_enc_col").distinct().count() == n_distinct_names


def test_encoding_out_of_range_raises(spark):
    df = spark.createDataFrame([(10**17,)], "k bigint")
    with pytest.raises(Exception, match="encodable range"):
        df.select(node_enc(0, "k")).collect()
    df2 = spark.createDataFrame([(-1,)], "k bigint")
    with pytest.raises(Exception, match="encodable range"):
        df2.select(node_enc(0, "k")).collect()

"""Executable paths for the two honest seams (round-4 verdict #5/#6).

A4 (Cassandra source) and K5 (real image decode) depend on artifacts
absent from this container — the spark-cassandra-connector jar and
pillow. Each seam gets (a) an always-run test pinning the documented
failure mode (clear NotImplementedError carrying the enablement
recipe), and (b) a skipif-gated integration test that runs the REAL
path the moment the dependency lands in the environment. So neither
row in the SURVEY §3 table is untestable: today (a) runs and (b)
skips cleanly; on a provisioned deployment both run.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

CASSANDRA_HOST = os.environ.get("SPARK_CASSANDRA_HOST")
HAS_PIL = importlib.util.find_spec("PIL") is not None


def _cassandra_connector_on_classpath(spark) -> bool:
    """Is the spark-cassandra-connector jar loadable in this JVM?"""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.cassandra.DefaultSource"
        )
        return True
    except Exception:
        return False


def test_a4_shim_raises_with_recipe(spark):
    """Without the connector jar the A4 source must fail loudly with
    the exact --packages recipe, never an obscure ClassNotFound."""
    from morphl_community_edition_spark.sources.batch import read_cassandra

    if _cassandra_connector_on_classpath(spark):
        pytest.skip("connector jar present — the real-read test covers A4")
    with pytest.raises(NotImplementedError, match="spark-cassandra-connector"):
        read_cassandra(spark, "system", "local")


@pytest.mark.skipif(
    not CASSANDRA_HOST,
    reason="no Cassandra endpoint (set SPARK_CASSANDRA_HOST and launch with "
    "--packages com.datastax.spark:spark-cassandra-connector_2.13)",
)
def test_a4_cassandra_read_system_local(spark):
    """Real A4 read against a live cluster: system.local always holds
    exactly one row describing the contacted node."""
    from morphl_community_edition_spark.sources.batch import read_cassandra

    if not _cassandra_connector_on_classpath(spark):
        pytest.skip("SPARK_CASSANDRA_HOST set but connector jar not on classpath")
    spark.conf.set("spark.cassandra.connection.host", CASSANDRA_HOST)
    df = read_cassandra(spark, "system", "local")
    rows = df.select("cluster_name", "release_version").collect()
    assert len(rows) == 1 and rows[0]["release_version"]


def test_k5_real_decode_raises_without_pil():
    """Driver-side check of the import seam (executor tasks raise the
    same way — the function is shipped whole into mapInPandas)."""
    if HAS_PIL:
        pytest.skip("pillow present — the real-decode test covers K5")
    from morphl_community_edition_spark.operators.multimodal import decode_image_real

    with pytest.raises(NotImplementedError, match="pillow"):
        decode_image_real(b"\x89PNG\r\n\x1a\n")


@pytest.mark.skipif(not HAS_PIL, reason="pillow not installed in this container")
def test_k5_real_image_decode_pipeline(spark):
    """Full K5 real path: generate PNGs with PIL, run them through the
    extract_image_features mapInPandas stage, and check decoded
    dimensions and grayscale means against the generator's ground
    truth."""
    import io

    from PIL import Image

    from morphl_community_edition_spark.operators.multimodal import (
        extract_image_features,
    )

    def png(w: int, h: int, gray: int) -> bytes:
        buf = io.BytesIO()
        Image.new("L", (w, h), color=gray).save(buf, format="PNG")
        return buf.getvalue()

    rows = [(1, png(4, 3, 10)), (2, png(8, 2, 200)), (3, png(1, 1, 255))]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["width"], r["height"], r["mean_pixel"])
        for r in extract_image_features(media).collect()
    }
    assert got == {1: (4, 3, 10.0), 2: (8, 2, 200.0), 3: (1, 1, 255.0)}

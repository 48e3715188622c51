"""Multimodal columns (K5): opaque binary payloads + typed metadata.

Design for 100 TB (SURVEY.md §3 K5): media NEVER travels inline
through shuffles at scale — rows carry a *pointer struct*
(path, offset, length) plus small typed metadata; payload bytes are
materialized only inside the final mapInPandas stage that decodes
them. The fixture has no media files, so the payload here is the
document text encoded as bytes — the Spark-side plumbing (schema,
batching, UDF signature, partition shape) is identical to the real
thing, and decode is a deterministic stub.

Real decoders (PIL/librosa/av) are not in this container; see
decode_image_stub — the import seam is marked and the fake features
are deterministic so tests and oracles can check the plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("path", T.StringType()),
                    T.StructField("offset", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("fake_mean_pixel", T.DoubleType()),
    ]
)


def attach_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build the multimodal frame: binary payload + metadata struct."""
    payload = F.col(text_col).cast("binary")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit("inline").alias("path"),
            F.lit(0).cast("long").alias("offset"),
        ).alias("meta"),
    )


def decode_image_stub(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decode.

    Replace with e.g. PIL.Image.open(io.BytesIO(payload)) when the
    decode libraries are available:

        raise NotImplementedError("image decode requires PIL")

    The fake features below are pure functions of the bytes so the
    whole pipeline stays oracle-checkable.
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "first_byte": payload[0] if n else -1,
        "fake_mean_pixel": float(sum(payload[:64]) % 256),
    }


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas decode stage: Arrow-batched, one Python worker per
    partition, emits fixed-schema features. This is the shape a real
    image/audio feature extractor runs in at scale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload (missing blob) decodes as empty — the same
            # rule extract_features_arrow applies, so the twins agree
            # on degraded input instead of this path crashing on None
            feats = [decode_image_stub(p if p is not None else b"") for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """mapInArrow twin of extract_features — the scale path for BINARY
    payloads. mapInPandas converts every Arrow batch to a pandas
    DataFrame, which COPIES each binary cell into a Python bytes
    object before the decoder ever runs; mapInArrow hands the decoder
    the Arrow RecordBatch itself, so payload bytes stay in the Arrow
    buffer (zero-copy) until the decoder slices exactly what it needs.
    For media columns (payloads ~MBs) that copy is the dominant cost
    of the exchange, so this path wins precisely when rows are big.
    Identical output contract to extract_features (same FEATURE_SCHEMA,
    same deterministic stub features) — asserted equal in tests."""
    import pyarrow as pa

    def run(batches):
        for batch in batches:
            ids = batch.column("doc_id")
            payloads = batch.column("payload")
            feats = [
                decode_image_stub(p.as_py() if p.is_valid else b"")
                for p in payloads
            ]
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": ids,
                    "n_bytes": pa.array([f["n_bytes"] for f in feats], pa.int64()),
                    "first_byte": pa.array([f["first_byte"] for f in feats], pa.int32()),
                    "fake_mean_pixel": pa.array([f["fake_mean_pixel"] for f in feats], pa.float64()),
                }
            )

    return media.mapInArrow(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_stub(payload: bytes, target: int) -> bytes:
    """Deterministic stand-in for an image resize: stride-sample the
    bytes down to <= target. Replace with PIL's Image.resize when the
    decode libs exist — the Spark plumbing around it doesn't change."""
    if payload is None:
        payload = b""
    if len(payload) <= target:
        return bytes(payload)
    stride = len(payload) // target
    return bytes(payload[::stride][:target])


def resize_media(media: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Batch resize stage: MEDIA_SCHEMA in → MEDIA_SCHEMA out with the
    payload resized and meta.n_bytes updated (meta.path/offset keep the
    provenance pointer). Runs binary→binary inside one mapInPandas —
    at scale this is the 'thumbnail the corpus' job: embarrassingly
    parallel, no shuffle, output written straight back to partitioned
    parquet."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [resize_stub(p, target_bytes) for p in pdf["payload"]]
            # a NULL meta struct (missing-blob provenance, the degraded
            # input the extract paths already tolerate) arrives as
            # None — dict-unpacking it would crash the stage
            # (round-8 review); synthesize the update over an empty
            # base instead
            meta = [
                {**(m or {}), "n_bytes": len(r), "mime": "application/x-resized"}
                for m, r in zip(pdf["meta"], resized)
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": resized, "meta": meta})

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stage: one media row fans out to n_frames rows
    (video → evenly-spaced frame payloads; here the frame extractor is
    an equal-split stub). The Spark shape is the point: mapInPandas
    yielding MORE rows than it consumes — the row-explosion pattern a
    real video pipeline uses, keeping frames Arrow-batched instead of
    materializing an array<binary> column through a shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": [], "n_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = payload or b""
                step = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    frame = bytes(payload[i * step : (i + 1) * step])
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append(frame)
                    out["n_bytes"].append(len(frame))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def decode_image_real(payload: bytes) -> dict:
    """REAL image decode — the K5 seam, PIL-backed.

    Raises NotImplementedError when pillow is absent (this container),
    with the stub path named as the fallback; when pillow IS present
    the function decodes any PIL-readable format and the skipif-gated
    integration test (tests/test_integration_seams.py) drives the full
    mapInPandas pipeline on generated PNGs. Malformed payloads
    propagate PIL's error — a real decoder failing on garbage is
    signal, not something to mask."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires pillow (pip install pillow); "
            "decode_image_stub / extract_features is the deterministic "
            "fake path that keeps the plumbing testable without it"
        ) from exc
    img = Image.open(io.BytesIO(payload))
    px = list(img.convert("L").getdata())
    return {
        "width": int(img.width),
        "height": int(img.height),
        "mode": img.mode,
        "mean_pixel": (sum(px) / len(px)) if px else 0.0,
    }


def extract_image_features(media: DataFrame) -> DataFrame:
    """mapInPandas REAL-decode stage: identical plumbing to
    extract_features (Arrow batches, fixed output schema, one Python
    worker per partition) with decode_image_real doing the pixel work.
    Import-gated: on a cluster without pillow every task raises the
    NotImplementedError above instead of failing obscurely."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_image_real(p if p is not None else b"")
                for p in pdf["payload"]
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(run, schema=IMAGE_SCHEMA)

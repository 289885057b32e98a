"""Multimodal (binary) column plumbing.

Treats image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, processed by Arrow-batched ``mapInPandas``
UDFs. The decode step itself is STUBBED (no image/audio libs in this
container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder produces
stable feature rows so the Spark-side plumbing — schema, batch shape,
partitioning — is fully real and tested.

Scale notes: binary payloads ride the scan; mapInPandas streams Arrow
batches so a 100 MB image row never materializes twice; feature
extraction is embarrassingly parallel with zero shuffles until the
caller aggregates.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), True),   # image|audio|video
    StructField("payload", BinaryType(), True),
    StructField("meta", StructType([
        StructField("source", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("mime", StringType(), True),
    ]), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("sha256", StringType(), True),
    StructField("feature", ArrayType(FloatType()), True),
])


def assemble_media(df: DataFrame, id_col: str, payload_expr, media_type: str, source_col) -> DataFrame:
    """Build a MEDIA_SCHEMA-shaped DataFrame from any table with a
    binary-encodable column (testdata: documents.text -> bytes)."""
    payload = payload_expr if not isinstance(payload_expr, str) else F.encode(F.col(payload_expr), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.col(source_col).cast("string").alias("source"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decoder': sha256 bytes -> dim floats in
    [0,1). Stands in for image/audio decoding; same signature and
    batch shape as a real decoder would have."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i] / 255.0 for i in range(dim)]


def extract_features(media: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    With ``fake=False`` this is where a real decoder (PIL/libav/
    torchaudio) would run per Arrow batch; not available in this
    container, so it raises NotImplementedError — the surrounding
    plumbing (Arrow batching, schema, partition preservation) is the
    deliverable and is exercised with fake=True.
    """
    if not fake:
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; use fake=True for the deterministic stub"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                "sha256": payloads.map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()
                ),
                "feature": payloads.map(lambda b: _fake_decode(bytes(b or b""), dim)),
            })

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 16) -> DataFrame:
    """'Frame sampling' for the stub modality: slice the payload into
    fixed-stride byte windows (stands in for video frame extraction).
    Pure column expressions — slicing binary JVM-side."""
    idx = F.sequence(
        F.lit(1),
        F.least(
            F.greatest((F.length("payload") / every_n_bytes).cast("int"), F.lit(1)),
            F.lit(max_frames),
        ),
    )
    exploded = media.select("media_id", "payload", F.explode(idx).alias("frame_no"))
    return exploded.select(
        "media_id",
        "frame_no",
        F.substring(
            F.col("payload"), (F.col("frame_no") - 1) * every_n_bytes + 1, F.lit(every_n_bytes)
        ).alias("frame_bytes"),
    )


RESIZE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("orig_bytes", LongType(), True),
    StructField("resized", BinaryType(), True),
])


def resize(media: DataFrame, target_bytes: int = 64) -> DataFrame:
    """'Resize' for the stub modality: deterministic linear
    downsample of the payload to ``target_bytes`` (index-sampled — the
    1-D stand-in for bilinear image resize; a real implementation
    would decode, interpolate pixels, re-encode in the same Arrow
    batch loop). Payloads shorter than the target pass through
    unchanged."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def one(b):
                if b is None:
                    return None
                raw = bytes(b)
                if len(raw) <= target_bytes:
                    return raw
                idx = np.linspace(0, len(raw) - 1, target_bytes).astype(np.int64)
                return np.frombuffer(raw, dtype=np.uint8)[idx].tobytes()

            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "orig_bytes": pdf["payload"].map(
                    lambda b: len(b) if b is not None else 0
                ),
                "resized": pdf["payload"].map(one),
            })

    return media.mapInPandas(gen, schema=RESIZE_SCHEMA)

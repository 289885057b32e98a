"""Multimodal (binary) column plumbing.

Treats image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, processed by Arrow-batched ``mapInPandas``
UDFs. ``decode_media`` is a real, dependency-free decoder for the
uncompressed formats parseable from raw bytes — binary PPM (P6) and
24-bit BMP images (dimensions + per-channel means) and PCM WAV audio
(sample rate, channels, duration, RMS); payloads in any other format
decode to NULL features (the hook where PIL/libav would slot in per
Arrow batch). ``fake=True`` keeps the deterministic hash-based
pseudo-decoder for payloads that are not media at all (e.g. text
bytes in the testdata).

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
    [0,1). Stands in for decoding payloads that are not images (the
    testdata's text bytes); same signature and batch shape as the
    real decoder."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i] / 255.0 for i in range(dim)]


def _ppm_decode(raw: bytes):
    """Binary PPM (P6): ASCII header ``P6 <w> <h> <maxval>`` with
    #-comments, one whitespace byte, then w*h*3 raw RGB bytes."""
    i, fields = 2, []
    while len(fields) < 3 and i < len(raw):
        c = raw[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            nl = raw.find(b"\n", i)
            i = nl + 1 if nl != -1 else len(raw)
        else:
            j = i
            while j < len(raw) and not raw[j : j + 1].isspace():
                j += 1
            fields.append(int(raw[i:j]))
            i = j
    if len(fields) < 3:
        return None
    w, h, maxval = fields
    data = raw[i + 1 : i + 1 + w * h * 3]
    if w <= 0 or h <= 0 or maxval <= 0 or len(data) < w * h * 3:
        return None
    import numpy as np

    px = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.float64)
    means = px.mean(axis=0) / maxval
    return w, h, float(means[0]), float(means[1]), float(means[2])


def _bmp_decode(raw: bytes):
    """24-bit uncompressed BMP: BITMAPINFOHEADER, 4-byte-padded
    bottom-up BGR rows (orientation irrelevant for channel means)."""
    if len(raw) < 54:
        return None
    off = int.from_bytes(raw[10:14], "little")
    w = int.from_bytes(raw[18:22], "little", signed=True)
    h = int.from_bytes(raw[22:26], "little", signed=True)
    bpp = int.from_bytes(raw[28:30], "little")
    compression = int.from_bytes(raw[30:34], "little")
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    import numpy as np

    height = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    data = raw[off : off + stride * height]
    if len(data) < stride * height:
        return None
    rows = np.frombuffer(data, dtype=np.uint8).reshape(height, stride)
    px = rows[:, : w * 3].reshape(-1, 3).astype(np.float64)  # B,G,R
    means = px.mean(axis=0) / 255.0
    return w, h, float(means[2]), float(means[1]), float(means[0])


def decode_image(raw: bytes | None):
    """Decode a supported image payload to
    ``(width, height, mean_r, mean_g, mean_b)`` (means in [0,1]), or
    None for unsupported/corrupt payloads. Pure byte parsing + numpy
    — no imaging libraries required."""
    if not raw:
        return None
    raw = bytes(raw)
    if raw[:2] == b"P6":
        return _ppm_decode(raw)
    if raw[:2] == b"BM":
        return _bmp_decode(raw)
    return None


def _wav_parse(raw: bytes | None):
    """RIFF/WAVE chunk walk -> (sample_rate, n_channels, norm) with
    ``norm`` the interleaved samples scaled to [-1, 1], or None for
    unsupported/corrupt payloads. Shared by the metadata decoder and
    the fingerprint path."""
    if not raw:
        return None
    raw = bytes(raw)
    if len(raw) < 44 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    import numpy as np

    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = int.from_bytes(raw[pos + 4 : pos + 8], "little")
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or n_channels < 1 or sample_rate <= 0:
        return None  # PCM only
    if bits == 16:
        x = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2")
        norm = x.astype(np.float64) / 32768.0
    elif bits == 8:
        x = np.frombuffer(data, dtype=np.uint8)
        norm = (x.astype(np.float64) - 128.0) / 128.0
    else:
        return None
    if norm.size == 0:
        return None
    return sample_rate, n_channels, norm


def decode_audio(raw: bytes | None):
    """Decode a PCM WAV payload (RIFF/WAVE, 8- or 16-bit integer
    samples) to ``(sample_rate, n_channels, duration_s, rms)`` with
    rms normalized to [0,1]. Chunk-walks the RIFF structure, so extra
    chunks (LIST, fact, ...) are fine. None for unsupported/corrupt
    payloads. Pure byte parsing + numpy."""
    import numpy as np

    parsed = _wav_parse(raw)
    if parsed is None:
        return None
    sample_rate, n_channels, norm = parsed
    n_frames = norm.size // n_channels
    duration = n_frames / sample_rate
    rms = float(np.sqrt(np.mean(norm * norm)))
    return sample_rate, n_channels, float(duration), rms


def decode_media(raw: bytes | None):
    """Route a binary payload to its decoder by magic bytes: images
    -> [w, h, mean_r, mean_g, mean_b]; WAV audio -> [sample_rate,
    n_channels, duration_s, rms]; anything else -> None."""
    d = decode_image(raw)
    if d is None:
        d = decode_audio(raw)
    return d


def extract_features(media: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    ``fake=False`` runs the real decoder per Arrow batch: feature =
    [width, height, mean_r, mean_g, mean_b] for PPM/BMP payloads,
    NULL for undecodable ones. ``fake=True`` emits the deterministic
    hash features instead (for non-image payloads). Either way the
    plumbing is identical: Arrow batching, one pass, no shuffle.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if fake:
                feats = payloads.map(lambda b: _fake_decode(bytes(b or b""), dim))
            else:
                feats = payloads.map(
                    lambda b: (lambda d: list(map(float, d)) if d else None)(
                        decode_media(b)
                    )
                )
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                "sha256": payloads.map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()
                ),
                "feature": feats,
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


# ---------------------------------------------------------------------------
# Perceptual image hashing (pHash) — image near-dup dedup
# ---------------------------------------------------------------------------

def _image_pixels(raw: bytes):
    """Full pixel matrix (h, w, 3) float64 for the supported formats
    (same header parsing as decode_image, kept separate because the
    metadata path deliberately never materializes whole images)."""
    import numpy as np

    if not raw:
        return None
    raw = bytes(raw)
    if raw[:2] == b"P6":
        i, fields = 2, []
        while len(fields) < 3 and i < len(raw):
            c = raw[i : i + 1]
            if c.isspace():
                i += 1
            elif c == b"#":
                nl = raw.find(b"\n", i)
                i = nl + 1 if nl != -1 else len(raw)
            else:
                j = i
                while j < len(raw) and not raw[j : j + 1].isspace():
                    j += 1
                fields.append(int(raw[i:j]))
                i = j
        if len(fields) < 3:
            return None
        w, h, maxval = fields
        data = raw[i + 1 : i + 1 + w * h * 3]
        if w <= 0 or h <= 0 or maxval <= 0 or len(data) < w * h * 3:
            return None
        return (
            np.frombuffer(data, dtype=np.uint8)
            .reshape(h, w, 3)
            .astype(np.float64)
            / maxval
        )
    if raw[:2] == b"BM":
        if len(raw) < 54:
            return None
        off = int.from_bytes(raw[10:14], "little")
        w = int.from_bytes(raw[18:22], "little", signed=True)
        h = int.from_bytes(raw[22:26], "little", signed=True)
        bpp = int.from_bytes(raw[28:30], "little")
        comp = int.from_bytes(raw[30:34], "little")
        if bpp != 24 or comp != 0 or w <= 0 or h == 0:
            return None
        height = abs(h)
        stride = ((w * 3 + 3) // 4) * 4
        data = raw[off : off + stride * height]
        if len(data) < stride * height:
            return None
        rows = np.frombuffer(data, dtype=np.uint8).reshape(height, stride)
        bgr = rows[:, : w * 3].reshape(height, w, 3).astype(np.float64) / 255.0
        return bgr[:, :, ::-1]  # RGB order
    return None


def phash64_bytes(raw: bytes | None) -> int | None:
    """Classic 64-bit perceptual hash: grayscale -> 32x32 block-mean
    resize -> 2D DCT-II (explicit cosine-basis matmuls, float64 — no
    scipy dependency, bit-deterministic) -> top-left 8x8 low-frequency
    band minus DC -> median threshold. Robust to resizing, small
    noise, and brightness scaling; hamming distance between hashes
    approximates visual difference."""
    import numpy as np

    px = _image_pixels(raw)
    if px is None:
        return None
    gray = px @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    n = 32
    # block-mean resize via integer bucket assignment (deterministic
    # for any h, w — no interpolation kernel to disagree about)
    ri = np.minimum((np.arange(h) * n) // max(h, 1), n - 1)
    ci = np.minimum((np.arange(w) * n) // max(w, 1), n - 1)
    small = np.zeros((n, n))
    cnt = np.zeros((n, n))
    np.add.at(small, (ri[:, None], ci[None, :]), gray)
    np.add.at(cnt, (ri[:, None], ci[None, :]), 1.0)
    small = small / np.maximum(cnt, 1.0)
    k = np.arange(n)
    basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    dct = basis @ small @ basis.T
    band = dct[:8, :8].flatten()[1:]  # drop the DC term
    med = np.median(band)
    bits = 0
    for i, v in enumerate(band):
        if v > med:
            bits |= 1 << i
    # fold into a signed 64-bit value (Spark LongType)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def image_phash(media: DataFrame) -> DataFrame:
    """(media_id, payload) -> (media_id, phash) via Arrow-batched
    mapInPandas; NULL phash for non-image payloads. Downstream
    near-dup pairing is operators/dedup.blocked_hamming_pairs — the
    pigeonhole block-LSH shared with simhash, so image dedup at
    100 TB is a (block, key) shuffle, never an all-pairs compare."""
    out_schema = StructType([
        StructField("media_id", LongType()),
        StructField("phash", LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame({
                "media_id": b["media_id"],
                "phash": [
                    phash64_bytes(p) for p in b["payload"]
                ],
            })

    return media.select("media_id", "payload").mapInPandas(gen, out_schema)


def audio_fingerprint64(raw: bytes | None) -> int | None:
    """64-bit spectral audio fingerprint (Haitsma-Kalker shape,
    folded to one word): mono signal -> 8 equal time windows -> per
    window an rfft split into 9 log-spaced frequency bands -> bit =
    sign of the energy difference between adjacent bands (8 x 8 =
    64 bits). Energy RATIOS make the hash invariant to volume
    scaling; band-level pooling makes it robust to small noise;
    different content produces different band shapes. Hamming
    distance between fingerprints approximates audible difference —
    pair with dedup.blocked_hamming_pairs exactly like pHash."""
    import numpy as np

    parsed = _wav_parse(raw)
    if parsed is None:
        return None
    rate, ch, norm = parsed
    mono = norm[: (norm.size // ch) * ch].reshape(-1, ch).mean(axis=1)
    if mono.size < 16:
        return None
    bits = 0
    bit = 0
    windows = np.array_split(mono, 8)
    for w in windows:
        spec = np.abs(np.fft.rfft(w)) ** 2
        # 9 log-spaced band edges over the positive spectrum
        edges = np.unique(
            np.round(
                np.logspace(0, np.log10(max(spec.size - 1, 1)), 10)
            ).astype(int)
        )
        while edges.size < 10:  # degenerate tiny windows: pad edges
            edges = np.append(edges, edges[-1] + 1)
        bands = [
            float(spec[edges[i]:max(edges[i + 1], edges[i] + 1)].sum())
            for i in range(9)
        ]
        for i in range(8):
            if bands[i] > bands[i + 1]:
                bits |= 1 << bit
            bit += 1
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """(media_id, payload) -> (media_id, afp) via Arrow-batched
    mapInPandas; NULL for non-audio payloads."""
    out_schema = StructType([
        StructField("media_id", LongType()),
        StructField("afp", LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame({
                "media_id": b["media_id"],
                "afp": [audio_fingerprint64(p) for p in b["payload"]],
            })

    return media.select("media_id", "payload").mapInPandas(gen, out_schema)

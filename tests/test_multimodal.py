"""Multimodal binary-column plumbing tests: real PPM/BMP decode +
the deterministic fake decoder for non-image payloads."""

import hashlib

import pytest
from pyspark.sql import functions as F

from ngafid_cpat_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [
            {"doc_id": 1, "text": "hello world", "source": "s1"},
            {"doc_id": 2, "text": "x" * 300, "source": "s2"},
        ]
    )
    return M.assemble_media(docs, "doc_id", "text", "text", "source")


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "media_type", "payload", "meta"]
    row = media.filter("media_id = 1").first()
    assert bytes(row["payload"]) == b"hello world"
    assert row["meta"]["n_bytes"] == 11
    assert row["meta"]["source"] == "s1"


def test_extract_features_fake(media):
    out = {r["media_id"]: r for r in M.extract_features(media, fake=True).collect()}
    r = out[1]
    assert r["sha256"] == hashlib.sha256(b"hello world").hexdigest()
    assert r["n_bytes"] == 11
    assert len(r["feature"]) == 8
    assert all(0.0 <= x <= 1.0 for x in r["feature"])
    # deterministic
    again = M.extract_features(media, fake=True).filter("media_id = 1").first()
    assert list(again["feature"]) == list(r["feature"])


def _ppm(w, h, pixels):
    return b"P6\n# test image\n%d %d\n255\n" % (w, h) + bytes(pixels)


def _bmp_24(w, h, rows_bgr):
    """Minimal bottom-up 24-bit BMP from per-row BGR byte lists."""
    stride = ((w * 3 + 3) // 4) * 4
    body = b"".join(
        bytes(row) + b"\x00" * (stride - len(row)) for row in reversed(rows_bgr)
    )
    header = (
        b"BM"
        + (54 + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + body


def test_decode_image_ppm_and_bmp():
    # 2x2 PPM: red, green, blue, white
    ppm = _ppm(2, 2, [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    assert M.decode_image(ppm) == (2, 2, pytest.approx(0.5), pytest.approx(0.5), pytest.approx(0.5))
    # 2x1 BMP, pixels (BGR on disk): pure red, pure blue
    bmp = _bmp_24(2, 1, [[0, 0, 255, 255, 0, 0]])
    w, h, r, g, b = M.decode_image(bmp)
    assert (w, h) == (2, 1)
    assert (r, g, b) == (pytest.approx(0.5), pytest.approx(0.0), pytest.approx(0.5))
    # unsupported / corrupt payloads decode to None, never raise
    assert M.decode_image(b"hello world") is None
    assert M.decode_image(b"") is None
    assert M.decode_image(b"P6\n2 2\n255\n\x00") is None  # truncated
    assert M.decode_image(None) is None


def test_extract_features_real_decode(spark):
    """fake=False runs the real decoder inside mapInPandas: image
    payloads get [w, h, mean_r, mean_g, mean_b], others NULL."""
    ppm = _ppm(2, 2, [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    media = spark.createDataFrame(
        [
            {"media_id": 1, "media_type": "image", "payload": bytearray(ppm),
             "meta": {"source": "s", "n_bytes": len(ppm), "mime": "image/x-portable-pixmap"}},
            {"media_id": 2, "media_type": "text", "payload": bytearray(b"not an image"),
             "meta": {"source": "s", "n_bytes": 12, "mime": "text/plain"}},
        ],
        schema=M.MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in M.extract_features(media, fake=False).collect()}
    assert out[1]["feature"] == [
        pytest.approx(2.0), pytest.approx(2.0),
        pytest.approx(0.5), pytest.approx(0.5), pytest.approx(0.5),
    ]
    assert out[1]["sha256"] == hashlib.sha256(ppm).hexdigest()
    assert out[2]["feature"] is None  # undecodable -> NULL, row kept
    assert out[2]["n_bytes"] == 12


def test_frame_sample(media):
    frames = M.frame_sample(media, every_n_bytes=64, max_frames=16)
    got = frames.filter("media_id = 2").collect()
    assert len(got) == 4  # 300 bytes // 64 = 4 frames
    assert all(len(bytes(r["frame_bytes"])) <= 64 for r in got)
    joined = b"".join(bytes(r["frame_bytes"]) for r in sorted(got, key=lambda r: r["frame_no"]))
    assert joined == b"x" * 256  # 4 full strides


def test_resize_downsamples_deterministically(spark):
    from ngafid_cpat_spark.operators import multimodal as M

    docs = spark.createDataFrame(
        [
            {"doc_id": 1, "text": "x" * 500, "source": "s"},
            {"doc_id": 2, "text": "short", "source": "s"},
        ]
    )
    media = M.assemble_media(docs, "doc_id", "text", "image", "source")
    out = {r["media_id"]: r for r in M.resize(media, target_bytes=64).collect()}
    assert out[1]["orig_bytes"] == 500 and len(out[1]["resized"]) == 64
    assert out[2]["orig_bytes"] == 5 and bytes(out[2]["resized"]) == b"short"
    # deterministic: second run bit-identical
    again = {r["media_id"]: r for r in M.resize(media, target_bytes=64).collect()}
    assert bytes(again[1]["resized"]) == bytes(out[1]["resized"])


def _wav_pcm16(sample_rate, samples):
    """Minimal RIFF/WAVE with one fmt + data chunk, 16-bit mono PCM."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


def test_decode_audio_wav():
    # 4 samples at 8 kHz: +/- half scale -> rms = 0.5
    wav = _wav_pcm16(8000, [16384, -16384, 16384, -16384])
    sr, ch, dur, rms = M.decode_audio(wav)
    assert (sr, ch) == (8000, 1)
    assert dur == pytest.approx(4 / 8000)
    assert rms == pytest.approx(0.5)
    # routed through decode_media too
    assert M.decode_media(wav) == (8000, 1, pytest.approx(4 / 8000), pytest.approx(0.5))
    # corrupt / non-audio payloads: None, never raise
    assert M.decode_audio(b"RIFFxxxxWAVE") is None
    assert M.decode_audio(b"not audio") is None
    assert M.decode_media(b"neither image nor audio") is None


def _ppm_gen(w, h, fn):
    body = bytearray()
    for y in range(h):
        for x in range(w):
            r, g, b = fn(x, y)
            body += bytes([r, g, b])
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(body)


def test_phash_invariance_and_discrimination():
    import math

    from ngafid_cpat_spark.operators.multimodal import phash64_bytes

    def tex(x, y):
        v = int(127 + 60 * math.sin(x / 5.0) * math.cos(y / 7.0)
                + 40 * math.sin((x + y) / 11.0))
        return (v, 255 - v, (v * 2) % 256)

    def tex_noisy(x, y):
        r, g, b = tex(x, y)
        if (x * 31 + y * 17) % 97 == 0:
            r = min(255, r + 8)
        return (r, g, b)

    def tex2(x, y):
        v = int(127 + 60 * math.sin(y / 3.0) * math.cos(x / 13.0)
                - 40 * math.sin((2 * x - y) / 7.0))
        return (v % 256, v % 256, v % 256)

    a = phash64_bytes(_ppm_gen(64, 64, tex))
    a2 = phash64_bytes(_ppm_gen(64, 64, tex))
    a_big = phash64_bytes(_ppm_gen(128, 128, lambda x, y: tex(x // 2, y // 2)))
    a_noise = phash64_bytes(_ppm_gen(64, 64, tex_noisy))
    c = phash64_bytes(_ppm_gen(64, 64, tex2))

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert a == a2                      # deterministic
    assert ham(a, a_big) <= 8           # scale-invariant (resize path)
    assert ham(a, a_noise) <= 8         # noise-robust
    assert ham(a, c) >= 16              # visually different stays far
    assert phash64_bytes(b"not an image") is None


def test_image_phash_blocked_pairing(spark):
    import math

    from ngafid_cpat_spark.operators.dedup import blocked_hamming_pairs
    from ngafid_cpat_spark.operators.multimodal import image_phash

    def tex(x, y):
        v = int(127 + 60 * math.sin(x / 5.0) * math.cos(y / 7.0)
                + 40 * math.sin((x + y) / 11.0))
        return (v, 255 - v, (v * 2) % 256)

    def tex2(x, y):
        v = int(127 + 60 * math.sin(y / 3.0) * math.cos(x / 13.0)
                - 40 * math.sin((2 * x - y) / 7.0))
        return (v % 256, v % 256, v % 256)

    rows = [
        (1, bytearray(_ppm_gen(64, 64, tex))),
        (2, bytearray(_ppm_gen(128, 128, lambda x, y: tex(x // 2, y // 2)))),
        (3, bytearray(_ppm_gen(64, 64, tex2))),
        (4, bytearray(b"not an image")),
    ]
    media = spark.createDataFrame(rows, "media_id LONG, payload BINARY")
    hashes = image_phash(media).filter("phash IS NOT NULL")
    pairs = blocked_hamming_pairs(
        hashes, id_col="media_id", hash_col="phash", max_hamming=8
    ).collect()
    got = {(r["id1"], r["id2"]) for r in pairs}
    assert (1, 2) in got          # resized twin found
    assert (1, 3) not in got and (2, 3) not in got


def test_audio_fingerprint_invariance_and_discrimination():
    import math

    from ngafid_cpat_spark.operators.multimodal import audio_fingerprint64

    n = 8000

    def sig(t):
        # broadband: 12 inharmonic partials (a pure tone would leave
        # most bands empty and the sign bits tie-unstable — same
        # degenerate-flat caveat as pHash on gradient images)
        return sum(
            3000 / math.sqrt(k)
            * math.sin(2 * math.pi * (90 * k + 17 * k * k % 211) * t / n + k)
            for k in range(1, 13)
        )

    def sig2(t):
        return sum(
            3000 / math.sqrt(k)
            * math.sin(2 * math.pi * (55 * k * k % 997 + 130) * t / n + 2 * k)
            for k in range(1, 13)
        )

    tone = [sig(t) for t in range(n)]
    a = audio_fingerprint64(_wav_pcm16(n, [int(s) for s in tone]))
    a2 = audio_fingerprint64(_wav_pcm16(n, [int(s) for s in tone]))
    quiet = audio_fingerprint64(_wav_pcm16(n, [int(s * 0.3) for s in tone]))
    noisy = audio_fingerprint64(_wav_pcm16(
        n, [int(s + (120 if (t * 31) % 97 == 0 else 0))
            for t, s in enumerate(tone)]
    ))
    other = audio_fingerprint64(
        _wav_pcm16(n, [int(sig2(t)) for t in range(n)])
    )

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert a == a2                  # deterministic
    assert ham(a, quiet) <= 4       # volume-invariant (energy ratios)
    assert ham(a, noisy) <= 4       # noise-robust
    assert ham(a, other) >= 12      # different content stays far
    assert audio_fingerprint64(b"not audio") is None


def test_audio_fingerprint_blocked_pairing(spark):
    import math

    from ngafid_cpat_spark.operators.dedup import blocked_hamming_pairs
    from ngafid_cpat_spark.operators.multimodal import audio_fingerprint

    n = 8000

    def sig(t):
        return sum(
            3000 / math.sqrt(k)
            * math.sin(2 * math.pi * (90 * k + 17 * k * k % 211) * t / n + k)
            for k in range(1, 13)
        )

    def sig2(t):
        return sum(
            3000 / math.sqrt(k)
            * math.sin(2 * math.pi * (55 * k * k % 997 + 130) * t / n + 2 * k)
            for k in range(1, 13)
        )

    rows = [
        (1, bytearray(_wav_pcm16(n, [int(sig(t)) for t in range(n)]))),
        (2, bytearray(_wav_pcm16(n, [int(sig(t) * 0.3) for t in range(n)]))),
        (3, bytearray(_wav_pcm16(n, [int(sig2(t)) for t in range(n)]))),
    ]
    media = spark.createDataFrame(rows, "media_id LONG, payload BINARY")
    fps = audio_fingerprint(media).filter("afp IS NOT NULL")
    pairs = blocked_hamming_pairs(
        fps, id_col="media_id", hash_col="afp", max_hamming=8
    ).collect()
    got = {(r["id1"], r["id2"]) for r in pairs}
    assert (1, 2) in got          # volume-scaled twin found
    assert (1, 3) not in got and (2, 3) not in got

"""Multimodal binary-column plumbing tests (decode stubbed)."""

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


def test_extract_features_real_decode_is_stubbed(media):
    with pytest.raises(NotImplementedError):
        M.extract_features(media, fake=False)


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

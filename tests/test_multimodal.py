"""Multimodal plumbing: schema, sentinel failure semantics (ort_runtime.rs:956-960),
metadata sniffing, frame sampling stub."""

import pytest

from lantern_extras_spark.multimodal import (
    decode_image_features,
    fake_image_feature,
    frame_sample,
    with_media_metadata,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, bytearray(b"\xff\xd8\xff\xe0" + b"jpegdata" * 10), "image"),
        (2, None, "image"),                      # null payload -> sentinel
        (3, bytearray(b""), "image"),            # empty payload -> sentinel
        (4, bytearray(b"\x89PNG\r\n" + b"x" * 50), "image"),
        (5, bytearray(b"plain bytes, unknown format"), "blob"),
    ]
    return spark.createDataFrame(rows, "media_id long, media binary, media_type string")


def test_decode_sentinel_semantics(media):
    out = {r["media_id"]: r["feature"] for r in decode_image_features(media, dim=8).collect()}
    assert out[2] == [-1.0] * 8 and out[3] == [-1.0] * 8  # sentinel, NOT null
    assert out[1] != [-1.0] * 8 and len(out[1]) == 8
    # deterministic (feature column is float32; compare with tolerance)
    expect = fake_image_feature(bytes(b"\xff\xd8\xff\xe0" + b"jpegdata" * 10), 8)
    assert out[1] == pytest.approx(expect, abs=1e-6)


def test_oversized_payload_sentinel(spark):
    big = spark.createDataFrame(
        [(1, bytearray(b"x" * 1000), "image")], "media_id long, media binary, media_type string"
    )
    out = decode_image_features(big, dim=4, max_bytes=100).first()
    assert out["feature"] == [-1.0] * 4  # reference 20MB-cap behavior, scaled down


def test_metadata_sniffing(media):
    got = {r["media_id"]: (r["media_format"], r["media_bytes"]) for r in with_media_metadata(media).collect()}
    assert got[1][0] == "jpeg"
    assert got[4][0] == "png"
    assert got[5][0] == "unknown"
    assert got[2] == (None, None) or got[2][1] is None


def test_pil_decoder_is_clearly_stubbed(media):
    with pytest.raises((NotImplementedError, Exception)):
        decode_image_features(media, decoder="pil").collect()


def test_frame_sample(media):
    out = {r["media_id"]: r["frames"] for r in frame_sample(media, n_frames=3).collect()}
    assert out[2] is None and out[3] is None
    assert len(out[1]) == 3

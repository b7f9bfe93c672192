"""Multimodal operator tests: fake-codec payload roundtrips, feature math
golden values, frame-explode shape, resize geometry, and batching behavior."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from core_etl_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.synthetic_media(spark, n_per_kind=10).cache()


def test_fixture_shape(media):
    counts = {r.kind: r.n for r in media.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    assert counts == {"image": 10, "audio": 10, "video": 10}
    # payload sizes agree with metadata
    img = media.filter(F.col("kind") == "image").select(
        F.length("payload").alias("len"), "meta.width", "meta.height", "meta.channels"
    )
    bad = img.filter(F.col("len") != 6 + F.col("width") * F.col("height") * F.col("channels"))
    assert bad.count() == 0


def test_image_features_golden(spark):
    # hand-built 2x2 single... 3-channel image with known bytes
    w, h, c = 2, 2, 3
    pix = bytes(range(12))  # 0..11
    payload = b"I" + struct.pack("<HH", w, h) + bytes([c]) + pix
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload), None)], M.MEDIA_DDL
    )
    r = M.image_features(df, bins=16).collect()[0]
    assert (r.width, r.height, r.channels) == (2, 2, 3)
    assert r.mean_intensity == pytest.approx(np.mean(range(12)))
    assert r.std_intensity == pytest.approx(np.std(range(12)))
    assert r.histogram[0] == 12 and sum(r.histogram) == 12  # all bytes < 16


def test_image_features_distributed(media):
    feats = M.image_features(media)
    assert feats.count() == 10
    rows = feats.collect()
    assert all(0 <= r.mean_intensity <= 255 for r in rows)
    assert all(sum(r.histogram) == r.width * r.height * r.channels for r in rows)


def test_resize_roundtrip(media):
    out = M.resize_images(media, 4, 4)
    rows = out.collect()
    assert len(rows) == 10
    for r in rows:
        assert (r.width, r.height) == (4, 4)
        img = M._decode_image_fake(bytes(r.payload))
        assert img.shape[:2] == (4, 4)
    # resizing to the original size is identity
    src = media.filter(F.col("kind") == "image").limit(1).collect()[0]
    same = M.resize_images(
        media.filter(F.col("media_id") == src.media_id),
        src.meta.width, src.meta.height,
    ).collect()[0]
    assert bytes(same.payload) == bytes(src.payload)


def test_audio_features_golden(spark):
    rate = 8000
    samples = np.array([1000, -1000, 1000, -1000], dtype="<i2")
    payload = b"A" + struct.pack("<I", rate) + samples.tobytes()
    df = spark.createDataFrame([(7, "audio", bytearray(payload), None)], M.MEDIA_DDL)
    r = M.audio_features(df).collect()[0]
    assert r.sample_rate == rate and r.n_samples == 4
    assert r.rms == pytest.approx(1000.0)
    assert r.zero_crossings == 3


def test_frame_sampling_explode(media):
    frames = M.sample_frames(media, every_k=2)
    metas = {r.media_id: r.meta.n_frames
             for r in media.filter(F.col("kind") == "video").collect()}
    got = {r.media_id: r.n for r in
           frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    assert got == {mid: -(-n // 2) for mid, n in metas.items()}  # ceil(n/2)
    f = frames.collect()[0]
    vid = media.filter(F.col("media_id") == f.media_id).collect()[0]
    assert len(bytes(f.frame_payload)) == vid.meta.width * vid.meta.height


def test_real_decoder_is_gated():
    with pytest.raises(NotImplementedError, match="Pillow"):
        M._decode_image_real(b"\xff\xd8\xff")  # a JPEG header, no codec here


def _img_payload(pix: np.ndarray) -> bytearray:
    h, w, c = pix.shape
    return bytearray(
        b"I" + struct.pack("<HH", w, h) + bytes([c]) + pix.astype(np.uint8).tobytes()
    )


def test_image_ahash_identical_and_noise_robust(spark):
    """Identical payloads share a hash; a pixel edit BETWEEN the 8x8
    sample points leaves the hash unchanged (perceptual robustness); a
    structurally different image hashes differently."""
    rng_shape = (16, 16, 3)
    base = np.zeros(rng_shape, dtype=np.uint8)
    base[:, 8:, :] = 200  # right half bright → strong bit pattern
    noisy = base.copy()
    noisy[1, 1, 0] = 30  # off-grid tweak (samples hit rows/cols 0,2,4,...)
    different = np.zeros(rng_shape, dtype=np.uint8)
    different[8:, :, :] = 200  # bottom half bright instead

    rows = [
        (1, "image", _img_payload(base), None),
        (2, "image", _img_payload(base), None),
        (3, "image", _img_payload(noisy), None),
        (4, "image", _img_payload(different), None),
    ]
    df = spark.createDataFrame(rows, M.MEDIA_DDL)
    got = {r.media_id: r.ahash for r in M.image_ahash(df).collect()}
    assert got[1] == got[2] == got[3]
    assert got[4] != got[1]
    assert len(got[1]) == 16 and int(got[1], 16) >= 0


def test_image_dedup_groups_buckets(spark):
    a = np.full((8, 8, 3), 10, dtype=np.uint8)
    a[0:4, :, :] = 240
    b = np.full((8, 8, 3), 10, dtype=np.uint8)
    b[:, 0:4, :] = 240
    rows = [
        (1, "image", _img_payload(a), None),
        (2, "image", _img_payload(a), None),
        (7, "image", _img_payload(b), None),
    ]
    df = spark.createDataFrame(rows, M.MEDIA_DDL)
    got = {r.keeper: r.n_images for r in M.image_dedup_groups(df).collect()}
    assert got == {1: 2, 7: 1}

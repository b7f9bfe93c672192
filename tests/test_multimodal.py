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


# --- real-codec paths (VERDICT r08 stretch 7) --------------------------------

def _wav_bytes(samples: np.ndarray, rate: int = 16000) -> bytes:
    """PCM16 mono WAV via the stdlib — the real-codec audio payload."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_audio_features_real_wav_codec_matches_fake(spark):
    """The real-codec swap claim, proven end-to-end for audio: the same
    samples through a genuine WAV container (stdlib wave decode) and
    through the fake codec must produce identical features — only the
    decode boundary differs."""
    rng = np.random.RandomState(7)
    samples = (rng.randint(-3000, 3000, size=500)).astype("<i2")
    wav = _wav_bytes(samples)
    fake = b"A" + struct.pack("<I", 16000) + samples.tobytes()
    rows = [(1, "audio", bytearray(wav)), (2, "audio", bytearray(fake))]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    real = M.audio_features(media.filter("media_id = 1"), codec="real").first()
    fk = M.audio_features(media.filter("media_id = 2"), codec="fake").first()
    assert real.sample_rate == fk.sample_rate == 16000
    assert real.n_samples == fk.n_samples == 500
    assert real.rms == pytest.approx(fk.rms)
    assert real.zero_crossings == fk.zero_crossings


def test_audio_real_codec_downmixes_stereo(spark):
    import io
    import wave

    left = np.array([100, 200, 300], dtype="<i2")
    right = np.array([-1, -2, -3], dtype="<i2")
    inter = np.empty(6, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(inter.tobytes())
    rate, got = M._decode_audio_real(buf.getvalue())
    assert rate == 8000 and list(got) == [100, 200, 300]  # channel 0


def test_image_features_real_codec_pillow_gated(spark):
    """Pillow-gated mirror of the fake-codec golden test (the protobuf-gate
    pattern): SKIPS in this codec-less container, runs wherever PIL is
    installed — same features from a genuine PNG as from fake-raw pixels."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.RandomState(11)
    pix = rng.randint(0, 256, size=(9, 7, 3)).astype(np.uint8)
    png = io.BytesIO()
    PIL_Image.fromarray(pix).save(png, format="PNG")
    rows = [
        (1, "image", bytearray(png.getvalue())),
        (2, "image", _img_payload(pix)),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    real = M.image_features(media.filter("media_id = 1"), codec="real").first()
    fake = M.image_features(media.filter("media_id = 2"), codec="fake").first()
    assert (real.width, real.height, real.channels) == (7, 9, 3)
    assert real.mean_intensity == pytest.approx(fake.mean_intensity)
    assert real.std_intensity == pytest.approx(fake.std_intensity)
    assert list(real.histogram) == list(fake.histogram)


def test_resize_real_codec_pillow_gated(spark):
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    pix = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(6, 8, 3)
    png = io.BytesIO()
    PIL_Image.fromarray(pix).save(png, format="PNG")
    media = spark.createDataFrame(
        [(1, "image", bytearray(png.getvalue())), (2, "image", _img_payload(pix))],
        "media_id long, kind string, payload binary",
    )
    real = M.resize_images(media.filter("media_id = 1"), 4, 3, codec="real").first()
    fake = M.resize_images(media.filter("media_id = 2"), 4, 3, codec="fake").first()
    assert bytes(real.payload) == bytes(fake.payload)


def test_video_real_codec_is_gated():
    with pytest.raises(NotImplementedError, match="PyAV"):
        M._decode_video_real(b"\x00\x00\x00\x18ftypmp42")


# --- stdlib PNG real-codec path (VERDICT r09 stretch 8): runs EVERYWHERE ------

def _png_encode(pix: np.ndarray, filters=None) -> bytes:
    """Minimal stdlib PNG encoder for tests: 8-bit gray/gray+alpha/RGB/RGBA,
    non-interlaced, one IDAT. ``filters`` assigns a filter type per row
    (default all-0) by applying the FORWARD filter transform, so the
    decoder's unfilter of every type 0-4 is exercised against known pixels."""
    import zlib

    h, w, ch = pix.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    filters = filters or [0] * h
    flat = pix.reshape(h, w * ch).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y, f in zip(range(h), filters):
        cur = flat[y]
        if f == 0:
            enc = cur
        elif f == 1:  # Sub
            a = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]])
            enc = (cur - a) & 0xFF
        elif f == 2:  # Up
            enc = (cur - prev) & 0xFF
        elif f == 3:  # Average
            a = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]])
            enc = (cur - ((a + prev) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            enc = np.zeros(w * ch, dtype=np.int32)
            for x in range(w * ch):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[x] = (int(cur[x]) - pred) & 0xFF
        raw.append(f)
        raw += enc.astype(np.uint8).tobytes()
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_stdlib_roundtrip_all_filters():
    """Every PNG filter type (0-4) decodes back to the exact pixels, for
    RGB and for grayscale (lifted to HxWx1)."""
    rng = np.random.RandomState(7)
    pix = rng.randint(0, 256, size=(10, 5, 3)).astype(np.uint8)
    png = _png_encode(pix, filters=[0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    got = M._decode_image_real(png)
    assert got.shape == (10, 5, 3)
    assert np.array_equal(got, pix)
    gray = rng.randint(0, 256, size=(6, 9, 1)).astype(np.uint8)
    got_g = M._decode_image_real(_png_encode(gray, filters=[4, 3, 2, 1, 0, 4]))
    assert got_g.shape == (6, 9, 1)
    assert np.array_equal(got_g, gray)


def test_png_stdlib_rejects_unsupported():
    # 16-bit depth → NotImplementedError pointing at Pillow
    import zlib as _z
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", _z.crc32(b"IHDR" + ihdr))
    )
    with pytest.raises(NotImplementedError, match="Pillow"):
        M._decode_png_stdlib(bad)
    with pytest.raises(ValueError, match="PNG"):
        M._decode_png_stdlib(b"not a png at all")


def test_image_features_real_codec_stdlib_png(spark):
    """The real-codec swap claim, proven end-to-end for images WITHOUT
    Pillow: identical features from a genuine PNG payload (stdlib decode)
    as from the fake-raw pixels — schema, batching, and feature math all
    shared; only the decode differs."""
    rng = np.random.RandomState(11)
    pix = rng.randint(0, 256, size=(9, 7, 3)).astype(np.uint8)
    rows = [
        (1, "image", bytearray(_png_encode(pix, filters=[2, 4, 1, 3, 0, 4, 2, 1, 3]))),
        (2, "image", _img_payload(pix)),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    real = M.image_features(media.filter("media_id = 1"), codec="real").first()
    fake = M.image_features(media.filter("media_id = 2"), codec="fake").first()
    assert (real.width, real.height, real.channels) == (7, 9, 3)
    assert real.mean_intensity == fake.mean_intensity
    assert real.std_intensity == fake.std_intensity
    assert list(real.histogram) == list(fake.histogram)


def test_resize_real_codec_stdlib_png(spark):
    pix = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(6, 8, 3)
    media = spark.createDataFrame(
        [(1, "image", bytearray(_png_encode(pix))), (2, "image", _img_payload(pix))],
        "media_id long, kind string, payload binary",
    )
    real = M.resize_images(media.filter("media_id = 1"), 4, 3, codec="real").first()
    fake = M.resize_images(media.filter("media_id = 2"), 4, 3, codec="fake").first()
    assert bytes(real.payload) == bytes(fake.payload)


def test_unknown_codec_rejected(spark):
    media = spark.createDataFrame(
        [(1, "image", bytearray(b"I"))], "media_id long, kind string, payload binary"
    )
    with pytest.raises(ValueError, match="codec"):
        M.image_features(media, codec="jpeg")


# --- real-codec video: uncompressed AVI via the stdlib demuxer (r11) ---------

def _avi_bytes(frames: np.ndarray, bits: int = 8) -> bytes:
    """Minimal uncompressed AVI writer (RIFF layout per the public spec):
    LIST hdrl {avih, LIST strl {strh vids, strf BITMAPINFOHEADER}},
    LIST movi {one 00db DIB per frame, bottom-up rows, 4-byte stride}."""
    n, h, w = frames.shape
    bypp = bits // 8
    stride = (w * bypp + 3) & ~3

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(list_type: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", list_type + data)

    avih = struct.pack("<14I", 33333, 0, 0, 0, n, 0, 1, 0, w, h, 0, 0, 0, 0)
    strh = b"vids" + b"RGB2" + struct.pack("<IHHiIIIIIIIhhhh",
        0, 0, 0, 0, 0, 1, 30, 0, n, 0, 0, 0, 0, 0, 0)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bits, 0,
                       stride * h, 0, 0, 256 if bits == 8 else 0, 0)
    if bits == 8:  # identity gray palette (BGRA quads)
        strf += b"".join(bytes([v, v, v, 0]) for v in range(256))
    movi_frames = []
    for f in frames:
        rows = []
        for y in range(h - 1, -1, -1):  # bottom-up
            if bits == 8:
                row = f[y].tobytes()
            else:
                row = np.stack([f[y]] * 3, axis=-1).tobytes()  # B=G=R=gray
            rows.append(row + b"\x00" * (stride - len(row)))
        movi_frames.append(chunk(b"00db", b"".join(rows)))
    body = b"AVI " + lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    ) + lst(b"movi", b"".join(movi_frames))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_video_real_codec_decodes_uncompressed_avi():
    # w=3 exercises the 4-byte DIB stride padding; bottom-up row order
    # must come back top-down.
    rng = np.random.RandomState(11)
    frames = rng.randint(0, 256, size=(4, 2, 3), dtype=np.uint8)
    n, w, h, got = M._decode_video_real(_avi_bytes(frames, bits=8))
    assert (n, w, h) == (4, 3, 2)
    assert got == frames.tobytes()


def test_video_real_codec_24bit_luma_and_gray_parity():
    # A gray-valued 24-bit AVI (B=G=R) must collapse to the same frames
    # as the 8-bit palette encoding: BT.601 luma of (v,v,v) is v.
    rng = np.random.RandomState(12)
    frames = rng.randint(0, 256, size=(3, 4, 5), dtype=np.uint8)
    assert M._decode_video_real(_avi_bytes(frames, bits=24)) == \
        M._decode_video_real(_avi_bytes(frames, bits=8))


def test_sample_frames_real_avi_matches_fake(spark):
    """The codec-swap claim end-to-end for video: identical frames through
    a genuine AVI container and through the fake codec must yield
    identical sampled frame payloads — only the decode boundary
    differs."""
    rng = np.random.RandomState(13)
    frames = rng.randint(0, 256, size=(5, 6, 4), dtype=np.uint8)  # n, h, w
    avi = _avi_bytes(frames, bits=8)
    fake = b"V" + struct.pack("<HHH", 5, 4, 6) + frames.tobytes()
    rows = [(1, "video", bytearray(avi)), (2, "video", bytearray(fake))]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    real = {r.frame_index: bytes(r.frame_payload)
            for r in M.sample_frames(media.filter("media_id = 1"), codec="real").collect()}
    fk = {r.frame_index: bytes(r.frame_payload)
          for r in M.sample_frames(media.filter("media_id = 2"), codec="fake").collect()}
    assert real == fk and sorted(real) == [0, 2, 4]


def _avi_multi(streams, movi_chunks) -> bytes:
    """Hand-rolled multi-stream AVI: ``streams`` is a list of
    (stream_type_fourcc, strf_bytes) in strl order; ``movi_chunks`` is the
    movi body as (chunk_fourcc, dib_bytes) in file order."""
    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(t: bytes, d: bytes) -> bytes:
        return chunk(b"LIST", t + d)

    avih = struct.pack("<14I", 33333, 0, 0, 0, 0, 0, len(streams), 0,
                       0, 0, 0, 0, 0, 0)
    strls = b""
    for fcc, strf in streams:
        strh = fcc + b"RGB2" + struct.pack(
            "<IHHiIIIIIIIhhhh", 0, 0, 0, 0, 0, 1, 30, 0, 0, 0, 0, 0, 0, 0, 0
        )
        strls += lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    body = b"AVI " + lst(b"hdrl", chunk(b"avih", avih) + strls) + lst(
        b"movi", b"".join(chunk(f, d) for f, d in movi_chunks)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _strf8(w: int, h: int, palette) -> bytes:
    stride = (w + 3) & ~3
    head = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, stride * h,
                       0, 0, len(palette), 0)
    return head + b"".join(bytes([b_, g, r, 0]) for (r, g, b_) in palette)


def _dib8(frame: np.ndarray) -> bytes:
    h, w = frame.shape
    stride = (w + 3) & ~3
    return b"".join(
        frame[y].tobytes() + b"\x00" * (stride - w)
        for y in range(h - 1, -1, -1)
    )


def test_video_real_codec_skips_second_stream(spark=None):
    # ADVICE r11: ##db/##dc chunks carry the two-digit STREAM number; a
    # second video stream's frames must not interleave into stream 0's
    # geometry. Stream 1 here has a different (wider) frame size, so the
    # old prefix-blind collector would have mis-shaped the output.
    rng = np.random.RandomState(15)
    f0 = rng.randint(0, 256, size=(3, 2, 4), dtype=np.uint8)  # n, h, w
    f1 = rng.randint(0, 256, size=(3, 4, 8), dtype=np.uint8)
    ident = [(v, v, v) for v in range(256)]
    movi = []
    for i in range(3):  # interleaved, the layout a muxer actually writes
        movi.append((b"00db", _dib8(f0[i])))
        movi.append((b"01db", _dib8(f1[i])))
    payload = _avi_multi(
        [(b"vids", _strf8(4, 2, ident)), (b"vids", _strf8(8, 4, ident))],
        movi,
    )
    n, w, h, got = M._decode_video_real(payload)
    assert (n, w, h) == (3, 4, 2)
    assert got == f0.tobytes()


def test_video_real_codec_applies_nonidentity_palette():
    # ADVICE r11's second half: the declared strf palette must be applied,
    # not assumed identity. An inverted gray palette (index v -> gray
    # 255-v) must invert the decoded frames.
    rng = np.random.RandomState(16)
    f = rng.randint(0, 256, size=(2, 3, 5), dtype=np.uint8)
    inverted = [(255 - v, 255 - v, 255 - v) for v in range(256)]
    payload = _avi_multi(
        [(b"vids", _strf8(5, 3, inverted))],
        [(b"00db", _dib8(fr)) for fr in f],
    )
    n, w, h, got = M._decode_video_real(payload)
    assert (n, w, h) == (2, 5, 3)
    assert got == (255 - f).tobytes()


def test_video_real_codec_compressed_avi_still_gated():
    # an MJPG-compressed AVI must keep naming the missing library
    rng = np.random.RandomState(14)
    frames = rng.randint(0, 256, size=(1, 2, 2), dtype=np.uint8)
    avi = bytearray(_avi_bytes(frames, bits=24))
    i = avi.index(struct.pack("<IiiHH", 40, 2, 2, 1, 24))
    struct.pack_into("<I", avi, i + 16, 0x47504A4D)  # biCompression = 'MJPG'
    with pytest.raises(NotImplementedError, match="PyAV"):
        M._decode_video_real(bytes(avi))


# --- corrupt-payload quarantine (r12: on_error="skip" + decode-error audit) ---

def _with_corrupt(media, ids):
    """Truncate the listed media_ids' payloads to 3 bytes — magic byte
    survives, every header unpack fails (struct.error)."""
    return media.withColumn(
        "payload",
        F.when(
            F.col("media_id").isin(list(ids)), F.expr("substring(payload, 1, 3)")
        ).otherwise(F.col("payload")),
    )


def test_on_error_skip_quarantines_corrupt_payloads(spark):
    # one corrupt payload per kind (0=image, 1=audio, 2=video); default
    # on_error="fail" keeps the r11 behavior (stage fails), "skip" drops
    # exactly the bad rows, and media_decode_errors names them with the
    # error class — the quarantine pair a 100 TB ingest needs.
    media = _with_corrupt(M.synthetic_media(spark, n_per_kind=4), [0, 1, 2])
    with pytest.raises(Exception):
        M.image_features(media).collect()
    ok_imgs = {r.media_id for r in M.image_features(media, on_error="skip").collect()}
    assert ok_imgs == {3, 6, 9}
    ok_aud = {r.media_id for r in M.audio_features(media, on_error="skip").collect()}
    assert ok_aud == {4, 7, 10}
    ok_vid = {r.media_id for r in M.sample_frames(media, on_error="skip")
              .select("media_id").distinct().collect()}
    assert ok_vid == {5, 8, 11}
    ok_hash = {r.media_id for r in M.image_ahash(media, on_error="skip").collect()}
    assert ok_hash == {3, 6, 9}
    errs = {(r.media_id, r.kind): r.error
            for r in M.media_decode_errors(media).collect()}
    assert set(errs) == {(0, "image"), (1, "audio"), (2, "video")}
    assert all(e.startswith(("error", "ValueError", "struct.error"))
               for e in errs.values())


def test_on_error_skip_empty_output_when_all_corrupt(spark):
    # the all-quarantined batch must come back as 0 rows with the right
    # schema, not a column-less pandas frame that breaks the projection.
    media = _with_corrupt(
        M.synthetic_media(spark, n_per_kind=2), [0, 3]
    ).filter(F.col("kind") == "image")
    out = M.image_features(media, on_error="skip")
    assert out.count() == 0
    assert "mean_intensity" in out.columns


def test_on_error_skip_does_not_swallow_missing_codec(spark):
    # NotImplementedError is an ENVIRONMENT problem (missing codec
    # library / unsupported compression): under "skip" it must still
    # fail loudly — otherwise a missing Pillow/PyAV silently drops the
    # whole corpus.
    rows = [(1, "video", bytearray(b"\x00\x00\x00\x18ftypmp42" + b"x" * 64))]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    with pytest.raises(Exception, match="PyAV"):
        M.sample_frames(media, codec="real", on_error="skip").collect()


def test_on_error_rejects_unknown_mode(spark):
    media = M.synthetic_media(spark, n_per_kind=1)
    with pytest.raises(ValueError, match="on_error"):
        M.image_features(media, on_error="ignore")


def test_ddl_columns_handles_nested_commas():
    # ADVICE r12: a naive split(",") would mangle DDLs with commas inside
    # a type — struct<...,...>, decimal(p,s), map<k,v>. _frame's column
    # derivation must split on top-level commas only.
    assert M._ddl_columns("a int, b string") == ["a", "b"]
    assert M._ddl_columns(
        "a int, b struct<x:int,y:string>, c decimal(10,2), d map<int,string>"
    ) == ["a", "b", "c", "d"]
    # every DDL constant in the module round-trips
    for ddl in (M.MEDIA_DDL, M.IMAGE_FEATURE_DDL, M.AUDIO_FEATURE_DDL,
                M.FRAME_DDL, M.RESIZE_DDL, M.AHASH_DDL, M.DECODE_ERROR_DDL):
        cols = M._ddl_columns(ddl)
        assert all(c.isidentifier() for c in cols), (ddl, cols)


# --- one-pass quarantine mode (r13: features + error list from ONE decode) ---

def test_on_error_quarantine_emits_features_and_errors_one_pass(spark):
    # VERDICT r12 directive 2: quarantine mode's combined output must be
    # exactly skip-mode's features PLUS one NULL-feature row per bad
    # payload carrying the reason — all from a single mapInPandas (one
    # decode per payload), where skip + media_decode_errors decoded twice.
    media = _with_corrupt(M.synthetic_media(spark, n_per_kind=4), [0, 1, 2])
    combined = M.image_features(media, on_error="quarantine")
    assert "decode_error" in combined.columns
    # exactly one payload-scanning python stage beyond the fixture's own
    # encode (the feature UDF is named `run`, the fixture's `encode`)
    plan = combined._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas run(") == 1
    assert plan.count("MapInPandas") - plan.count("MapInPandas encode(") == 1

    good, bad = M.quarantine_split(combined)
    skip_rows = sorted(
        map(tuple, M.image_features(media, on_error="skip").collect())
    )
    assert sorted(map(tuple, good.collect())) == skip_rows
    bad_rows = {r.media_id: r.error for r in bad.collect()}
    audit = {r.media_id: r.error for r in M.media_decode_errors(media)
             .filter(F.col("kind") == "image").collect()}
    assert bad_rows == audit  # same rows, same reasons — one pass instead of two


def test_on_error_quarantine_all_operators(spark):
    # every payload operator supports the mode with its own schema:
    # survivors match skip-mode, quarantined ids match the planted set.
    media = _with_corrupt(M.synthetic_media(spark, n_per_kind=4), [0, 1, 2])
    cases = [
        (M.image_features, {0}, {3, 6, 9}),
        (M.audio_features, {1}, {4, 7, 10}),
        (M.sample_frames, {2}, {5, 8, 11}),
        (M.image_ahash, {0}, {3, 6, 9}),
        (lambda m, **kw: M.resize_images(m, 4, 4, **kw), {0}, {3, 6, 9}),
    ]
    for op, bad_ids, good_ids in cases:
        good, bad = M.quarantine_split(op(media, on_error="quarantine"))
        assert {r.media_id for r in bad.collect()} == bad_ids
        assert {r.media_id for r in good.select("media_id").distinct()
                .collect()} == good_ids


def test_quarantine_video_one_row_per_bad_payload(spark):
    # a corrupt video contributes ONE quarantine row, not ceil(n/k) —
    # the frame count is unknowable for a payload that didn't decode.
    media = _with_corrupt(M.synthetic_media(spark, n_per_kind=4), [2])
    out = M.sample_frames(media, on_error="quarantine")
    bad = out.filter(F.col("decode_error").isNotNull())
    assert bad.count() == 1
    row = bad.collect()[0]
    assert row.media_id == 2 and row.frame_index is None \
        and row.frame_payload is None


def test_quarantine_dedup_groups_exclude_null_hash(spark):
    # image_dedup_groups under quarantine must not pool the NULL-hash
    # quarantine rows into a bogus bucket.
    media = _with_corrupt(M.synthetic_media(spark, n_per_kind=4), [0])
    groups = M.image_dedup_groups(media, on_error="quarantine").collect()
    assert all(g.ahash is not None for g in groups)
    assert sum(g.n_images for g in groups) == 3  # ids 3, 6, 9


def test_quarantine_mode_does_not_swallow_missing_codec(spark):
    # NotImplementedError stays fatal under quarantine, same as skip —
    # a missing codec library must never become 100% quarantined corpus.
    rows = [(1, "video", bytearray(b"\x00\x00\x00\x18ftypmp42" + b"x" * 64))]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    with pytest.raises(Exception, match="PyAV"):
        M.sample_frames(media, codec="real", on_error="quarantine").collect()


def test_cli_media_quarantine_out_writes_both(spark, tmp_path):
    # the CLI flow: features + quarantine table from one decode pass.
    from core_etl_spark import cli as C

    out, qout = str(tmp_path / "feats"), str(tmp_path / "quar")
    rc = C.main([
        "media", "features", "--synthetic", "4", "--skip-errors",
        "--quarantine-out", qout, "--out", out,
    ])
    assert rc == 0
    feats = spark.read.parquet(out)
    quar = spark.read.parquet(qout)
    # the synthetic fixture is clean: all 4 images survive, 0 quarantined
    assert feats.count() == 4 and quar.count() == 0
    assert set(quar.columns) == {"media_id", "error"}
    assert "decode_error" not in feats.columns


def test_cli_media_quarantine_out_requires_skip_errors():
    from core_etl_spark import cli as C

    with pytest.raises(SystemExit, match="skip-errors"):
        C.main(["media", "features", "--synthetic", "2",
                "--quarantine-out", "/tmp/nope"])


def test_cli_media_errors_action_rejects_quarantine_out():
    # ADVICE r13: the errors action's output has no decode_error column,
    # so the quarantine split crashed with AnalysisException. It IS the
    # error table already — reject the flag up front.
    from core_etl_spark import cli as C

    with pytest.raises(SystemExit, match="redundant"):
        C.main(["media", "errors", "--synthetic", "2", "--skip-errors",
                "--quarantine-out", "/tmp/nope"])


def test_streaming_quarantine_foreachbatch_two_tables_one_decode(spark, tmp_path):
    # the production wiring of the r13 one-pass mode: a media STREAM
    # (file source, exactly-once checkpoint) runs quarantine-mode
    # features inside foreachBatch, persisting each micro-batch's
    # combined frame once and writing survivors and quarantine rows to
    # two tables. After draining, the union of both tables covers every
    # image exactly once and matches the batch answer.
    import os

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    feats_out = str(tmp_path / "feats")
    quar_out = str(tmp_path / "quar")
    os.makedirs(src)

    media = _with_corrupt(M.synthetic_media(spark, n_per_kind=6), [0, 9])
    imgs = media.filter(F.col("kind") == "image")
    # two micro-batch drops
    imgs.filter(F.col("media_id") < 9).write.mode("append").parquet(f"{src}/d1")
    imgs.filter(F.col("media_id") >= 9).write.mode("append").parquet(f"{src}/d2")

    stream = (
        spark.readStream.schema(imgs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/d*")
    )

    def process(batch, _bid):
        combined = M.image_features(batch, on_error="quarantine").persist()
        try:
            good, bad = M.quarantine_split(combined)
            good.write.mode("append").parquet(feats_out)
            bad.write.mode("append").parquet(quar_out)
        finally:
            combined.unpersist()

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    feats = spark.read.parquet(feats_out)
    quar = spark.read.parquet(quar_out)
    assert {r.media_id for r in quar.collect()} == {0, 9}
    got_ids = {r.media_id for r in feats.collect()} | {
        r.media_id for r in quar.collect()
    }
    assert got_ids == {r.media_id for r in imgs.select("media_id").collect()}
    # survivors' features equal the batch skip-mode answer
    want = sorted(map(tuple, M.image_features(media, on_error="skip").collect()))
    assert sorted(map(tuple, feats.collect())) == want


# --- r15 review fixes --------------------------------------------------------


def test_zero_dimension_image_is_quarantined_not_stage_killed(spark):
    # a zero-width "image" decoded fine but its first real indexing
    # (resize grid / ahash sample points) raised IndexError OUTSIDE the
    # _try_decode guard — one bad blob killed the stage despite
    # skip/quarantine (r15 review)
    import struct

    bad = b"I" + struct.pack("<HH", 0, 5) + bytes([3])
    good = b"I" + struct.pack("<HH", 2, 2, ) + bytes([1]) + bytes(4)
    df = spark.createDataFrame(
        [(1, "image", bad, None), (2, "image", good, None)],
        M.MEDIA_DDL,
    )
    out = M.resize_images(df, 2, 2, on_error="quarantine").collect()
    assert {r.media_id for r in out} == {1, 2}
    errs = {r.media_id: r.decode_error for r in out}
    assert errs[1] is not None and "zero-dimension" in errs[1]
    assert errs[2] is None
    hashes = M.image_ahash(df, on_error="skip").collect()
    assert [r.media_id for r in hashes] == [2]


def test_truncated_video_is_quarantined(spark):
    # a lying video header decoded "successfully" and emitted short/empty
    # frame payloads downstream as valid rows (r15 review)
    import struct

    lying = b"V" + struct.pack("<HHH", 10, 6, 4) + bytes(24)  # claims 240
    ok = b"V" + struct.pack("<HHH", 2, 2, 2) + bytes(8)
    df = spark.createDataFrame(
        [(1, "video", lying, None), (2, "video", ok, None)],
        M.MEDIA_DDL,
    )
    frames = M.sample_frames(df, every_k=1, on_error="quarantine").collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id[1]) == 1 and by_id[1][0].decode_error is not None
    assert len(by_id[2]) == 2
    assert all(len(r.frame_payload) == 4 for r in by_id[2])


def test_histogram_bins_not_dividing_256(spark):
    # bins=10 used to emit 11 buckets (pixel 255 // 25 == 10); the
    # exact-integer form stays bit-identical for divisor bins
    import struct

    payload = b"I" + struct.pack("<HH", 2, 2) + bytes([1]) + bytes([0, 100, 200, 255])
    df = spark.createDataFrame([(1, "image", payload, None)], M.MEDIA_DDL)
    row = M.image_features(df, bins=10).collect()[0]
    assert len(row.histogram) == 10
    assert sum(row.histogram) == 4
    row8 = M.image_features(df, bins=8).collect()[0]
    assert row8.histogram == [1, 0, 0, 1, 0, 0, 1, 1]  # same as iv//32


def test_image_ahash_codec_param(spark):
    # image_ahash hardcoded the fake decoder: a real-codec (PNG) corpus
    # under "skip" silently dropped EVERY row — the exact whole-corpus
    # drop _payload_errors' docstring forbids (r15 review). Build a tiny
    # valid PNG by hand (the stdlib decoder does not verify CRCs).
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return struct.pack(">I", len(data)) + ctype + data + b"\x00" * 4

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # 2x2 gray8
    raw = b"\x00" + bytes([10, 20]) + b"\x00" + bytes([30, 250])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    df = spark.createDataFrame([(1, "image", png, None)], M.MEDIA_DDL)
    assert M.image_ahash(df, on_error="skip").count() == 0  # fake codec: dropped
    got = M.image_ahash(df, codec="real", on_error="skip").collect()
    assert len(got) == 1 and got[0].ahash is not None
    groups = M.image_dedup_groups(df, codec="real").collect()
    assert len(groups) == 1 and groups[0].n_images == 1


def test_null_payload_survives_skip_and_quarantine(spark):
    """r16 review: a NULL payload (nullable binary column — a certainty at
    scale) must be treated as a malformed payload by every error mode,
    not raise bytes(None) TypeError outside the guard and kill the stage
    in ALL modes."""
    pix = np.full((4, 4, 1), 9, dtype=np.uint8)
    rows = [
        (1, "image", _img_payload(pix), None),
        (2, "image", None, None),
    ]
    df = spark.createDataFrame(rows, M.MEDIA_DDL)

    got = M.image_features(df, on_error="skip").collect()
    assert [r.media_id for r in got] == [1]

    q = M.image_features(df, on_error="quarantine").collect()
    by_id = {r.media_id: r for r in q}
    assert by_id[2].decode_error.startswith("ValueError: NULL payload")
    assert by_id[1].decode_error is None

    with pytest.raises(Exception, match="NULL payload"):
        M.image_features(df, on_error="fail").collect()

    errs = M.media_decode_errors(df).collect()
    assert len(errs) == 1 and errs[0].media_id == 2

    # the other three payload operators share the same central guard
    assert [r.media_id for r in M.image_ahash(df, on_error="skip").collect()] == [1]
    assert M.resize_images(df, 2, 2, on_error="skip").count() == 1


def test_bad_arguments_fail_at_the_driver(spark):
    """r16 review: argument errors must raise at the driver, not surface
    as per-row executor failures (or silent data loss) inside the UDF."""
    df = spark.createDataFrame(
        [(1, "image", _img_payload(np.ones((2, 2, 1), dtype=np.uint8)), None)],
        M.MEDIA_DDL,
    )
    with pytest.raises(ValueError, match="bins"):
        M.image_features(df, bins=0)
    with pytest.raises(ValueError, match="every_k"):
        M.sample_frames(df, every_k=0)
    with pytest.raises(ValueError, match="every_k"):
        M.sample_frames(df, every_k=-1)
    with pytest.raises(ValueError, match="out_w/out_h"):
        M.resize_images(df, 0, 8)
    with pytest.raises(ValueError, match="out_w/out_h"):
        M.resize_images(df, 70000, 8)
    with pytest.raises(ValueError, match="grid"):
        M.image_ahash(df, grid=0)

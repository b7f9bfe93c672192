"""Multimodal specs — the training-data-pipeline binary-column operators
(brief: image/audio/video as opaque binary + typed metadata, processed by
Arrow-batched ``mapInPandas``).

These were rows-only gates through r08 ("no SQL oracle exists for binary
codec work"), but that claim was too strong for the FAKE codec: its
pixel/sample stream is an md5 chain (``md5(f"{seed}{id}:{chunk}")`` hex
pairs — synthetic_media), DuckDB has ``md5()``, and after image_features
moved to exact-integer mean/std (r09, same rationale as image_ahash) every
spec output is either exact-integer or a single correctly-rounded float
division/sqrt of exact integers. So the full chain — header layout, byte
decode, feature math, resample indexing, frame slicing — replays in SQL
hash-exactly, the same way m05's aHash oracle has since r07. Only the
REAL-codec paths (Pillow/PyAV) stay SQL-free; those are import-gated tests
in tests/test_multimodal.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import multimodal as M
from .base import register


def _md5_byte(seed: str, idcol: str, pos: str) -> str:
    """SQL expression: byte value at offset ``pos`` of the fake-codec
    payload stream for id ``idcol`` — hex pair ``pos % 16`` of
    ``md5(f"{seed}{id}:{pos // 16}")``, exactly synthetic_media's chain."""
    return (
        f"CAST('0x'||substr(md5('{seed}'||CAST({idcol} AS VARCHAR)||':'||"
        f"CAST(({pos}) // 16 AS VARCHAR)), 2 * (({pos}) % 16) + 1, 2) AS INT)"
    )


# Image geometry (synthetic_media, n_per_kind=30): ids 3k, w=8+id%8,
# h=8+id%5, c=3 — nbytes = w*h*3 <= 540, so positions come from one
# range(540) spine joined on p < nbytes.
_M01_ORACLE = f"""
    WITH dims AS (
        SELECT 3 * range AS mid,
               8 + (3 * range) % 8 AS w, 8 + (3 * range) % 5 AS h,
               (8 + (3 * range) % 8) * (8 + (3 * range) % 5) * 3 AS nbytes
        FROM range(0, 30)
    ),
    bytes AS (
        SELECT d.mid, {_md5_byte('img', 'd.mid', 'p.range')} AS val
        FROM dims d JOIN range(0, 540) p ON p.range < d.nbytes
    ),
    agg AS (
        SELECT mid, COUNT(*) AS n, SUM(val) AS sx, SUM(val * val) AS sxx
        FROM bytes GROUP BY mid
    ),
    counts AS (
        SELECT mid, val // 16 AS k, COUNT(*) AS c FROM bytes GROUP BY mid, val // 16
    ),
    hist AS (
        SELECT d.mid,
               string_agg(CAST(COALESCE(c.c, 0) AS VARCHAR), ',' ORDER BY bn.range)
                   AS histogram
        FROM dims d CROSS JOIN range(0, 16) bn
        LEFT JOIN counts c ON c.mid = d.mid AND c.k = bn.range
        GROUP BY d.mid
    )
    SELECT d.mid AS media_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
           CAST(3 AS INT) AS channels,
           CAST(a.sx AS DOUBLE) / CAST(a.n AS DOUBLE) AS mean_intensity,
           sqrt(CAST(a.n * a.sxx - a.sx * a.sx AS DOUBLE)
                / CAST(a.n * a.n AS DOUBLE)) AS std_intensity,
           h.histogram
    FROM dims d JOIN agg a ON a.mid = d.mid JOIN hist h ON h.mid = d.mid
"""


@register(
    "m01_image_features",
    tables=(),
    oracle=_M01_ORACLE,  # exact-int mean/std + integer histogram over the
    # md5 pixel stream — promoted from rows-only in r09 (see module docstring)
    tags=("multimodal", "image", "pandas-udf", "mapInPandas"),
)
def m01(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Image decode + feature extraction (mean/std intensity, 16-bin
    histogram) over the binary payload column via mapInPandas.

    The histogram is serialized to a comma-joined string: the driver's
    canonicalizer sorts result frames with pandas, which cannot factorize
    Python list cells (r04: ``TypeError: unhashable type: 'list'``).
    The feature math itself is untouched — only the spec projection changes.
    """
    media = M.synthetic_media(spark, n_per_kind=30)
    feats = M.image_features(media)
    return feats.withColumn(
        "histogram",
        F.array_join(F.transform("histogram", lambda x: x.cast("string")), ","),
    ).orderBy("media_id")


# Resize replay: output pixel q (row-major over 4x4x3) samples source byte
# ((oy*h//4)*w + (ox*w//4))*3 + ch — resize_images' nearest-neighbor index
# arithmetic verbatim. The whole re-encoded payload (header + pixels) is
# compared as Spark's F.hex text, so the oracle checks CONTENT, not just
# geometry.
_M02_ORACLE = f"""
    WITH dims AS (
        SELECT 3 * range AS mid,
               8 + (3 * range) % 8 AS w, 8 + (3 * range) % 5 AS h
        FROM range(0, 30)
    ),
    outpix AS (
        SELECT d.mid, q.range AS q,
               (((q.range // 12) * d.h // 4) * d.w
                + ((q.range % 12) // 3) * d.w // 4) * 3 + q.range % 3 AS p
        FROM dims d CROSS JOIN range(0, 48) q
    ),
    pix AS (
        SELECT mid, q, printf('%02X', {_md5_byte('img', 'mid', 'p')}) AS hx
        FROM outpix
    )
    SELECT mid AS media_id, CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
           CAST(54 AS INT) AS payload_bytes,
           '490400040003' || string_agg(hx, '' ORDER BY q) AS payload_hex
    FROM pix GROUP BY mid
"""


@register(
    "m02_image_resize",
    tables=(),
    oracle=_M02_ORACLE,  # full payload replay (header + resampled pixels as
    # hex) — promoted from rows-only in r09
    tags=("multimodal", "image", "mapInPandas"),
)
def m02(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Nearest-neighbor image resize re-encoded to the payload format;
    returns the new geometry + the exact payload as hex text (binary cells
    don't survive the driver's pandas canonicalizer; hex text does)."""
    media = M.synthetic_media(spark, n_per_kind=30)
    return (
        M.resize_images(media, 4, 4)
        .select(
            "media_id",
            "width",
            "height",
            F.length("payload").alias("payload_bytes"),
            F.hex("payload").alias("payload_hex"),
        )
        .orderBy("media_id")
    )


# Audio replay: ids 3k+1, n = 256 + id%100 i16 samples, sample j = bytes
# (2j, 2j+1) little-endian, sign via the 32768 two's-complement fold.
# RMS = sqrt(Σv²/n) is one float division + sqrt of exact ints (numpy's
# pairwise sum of integer-valued squares is exact, so the engines agree
# bit-for-bit); zero-crossings is a lag() sign-change count.
_M03_ORACLE = f"""
    WITH clips AS (
        SELECT 3 * range + 1 AS mid, 256 + (3 * range + 1) % 100 AS n
        FROM range(0, 30)
    ),
    raw AS (
        SELECT c.mid, c.n, j.range AS j,
               {_md5_byte('aud', 'c.mid', '2 * j.range')}
               + 256 * {_md5_byte('aud', 'c.mid', '2 * j.range + 1')} AS u
        FROM clips c JOIN range(0, 356) j ON j.range < c.n
    ),
    samples AS (
        SELECT mid, n, j, CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v
        FROM raw
    ),
    flips AS (
        SELECT mid, n, v * v AS vv,
               CASE WHEN (v < 0) <> (lag(v) OVER (PARTITION BY mid ORDER BY j) < 0)
                    THEN 1 ELSE 0 END AS flip
        FROM samples
    )
    SELECT mid AS media_id, CAST(16000 AS INT) AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           sqrt(CAST(SUM(vv) AS DOUBLE) / CAST(n AS DOUBLE)) AS rms,
           CAST(COALESCE(SUM(flip), 0) AS BIGINT) AS zero_crossings
    FROM flips GROUP BY mid, n
"""


@register(
    "m03_audio_features",
    tables=(),
    oracle=_M03_ORACLE,  # i16 decode + RMS/zero-crossings over the md5
    # sample stream — promoted from rows-only in r09
    tags=("multimodal", "audio", "mapInPandas"),
)
def m03(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Audio RMS + zero-crossing features over i16 PCM payloads."""
    media = M.synthetic_media(spark, n_per_kind=30)
    return M.audio_features(media).orderBy("media_id")


# Frame replay: ids 3k+2, n = 4 + id%4 frames of 6x4 = 24 bytes; every-2nd
# sampling keeps frame_index i in (0, 2, 4, 6) with i < n, and frame i is
# the byte slice [i*24, (i+1)*24) — compared as hex text like m02.
_M04_ORACLE = f"""
    WITH vids AS (
        SELECT 3 * range + 2 AS mid, 4 + (3 * range + 2) % 4 AS n
        FROM range(0, 30)
    ),
    frames AS (
        SELECT v.mid, i.range AS i
        FROM vids v JOIN range(0, 8) i ON i.range < v.n AND i.range % 2 = 0
    ),
    bytepos AS (
        SELECT f.mid, f.i, b.range AS b,
               printf('%02X', {_md5_byte('vid', 'f.mid', 'f.i * 24 + b.range')}) AS hx
        FROM frames f CROSS JOIN range(0, 24) b
    )
    SELECT mid AS media_id, CAST(i AS INT) AS frame_index,
           CAST(24 AS INT) AS frame_bytes,
           string_agg(hx, '' ORDER BY b) AS frame_hex
    FROM bytepos GROUP BY mid, i
"""


@register(
    "m04_video_frame_sample",
    tables=(),
    oracle=_M04_ORACLE,  # sampled-frame payload replay as hex — promoted
    # from rows-only in r09
    tags=("multimodal", "video", "mapInPandas", "explode"),
)
def m04(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Every-2nd-frame sampling: 1 video row → ceil(n/2) frame rows (the
    binary-column analogue of the batchTransfer 1→N explode). Frame
    payloads ride along as hex text so the driver hash covers content."""
    media = M.synthetic_media(spark, n_per_kind=30)
    return (
        M.sample_frames(media, every_k=2)
        .select(
            "media_id",
            "frame_index",
            F.length("frame_payload").alias("frame_bytes"),
            F.hex("frame_payload").alias("frame_hex"),
        )
        .orderBy("media_id", "frame_index")
    )


def _m05_oracle() -> str:
    """DuckDB replay of the whole m05 chain: the fake-codec pixel stream is
    an md5 chain (``md5('img{id}:{chunk}')`` hex pairs), the aHash decision
    is exact-integer (cell·64 > total — see image_ahash), and the 64 bits
    pack nibble-wise into the 16-hex-char hash, so SQL reproduces every
    bucket bit-for-bit. Image ids are 0,3,…,87 (mid%3==0 of 90) plus the
    re-id'd +1000 copies sharing the ORIGINAL payload."""

    def hexbyte(off: str) -> str:
        # byte value at pixel-stream offset ``off`` of image ``orig``
        return (
            f"CAST('0x'||substr(md5('img'||CAST(orig AS VARCHAR)||':'||"
            f"CAST(({off}) // 16 AS VARCHAR)), 2 * (({off}) % 16) + 1, 2) AS INT)"
        )

    cs = " + ".join(hexbyte(f"p + {k}") for k in (0, 1, 2))
    return f"""
        WITH base AS (SELECT 3 * range AS orig FROM range(0, 30)),
        imgs AS (
            SELECT orig AS mid, orig FROM base
            UNION ALL SELECT orig + 1000 AS mid, orig FROM base
        ),
        dims AS (
            SELECT mid, orig, 8 + orig % 8 AS w, 8 + orig % 5 AS h FROM imgs
        ),
        g AS (SELECT unnest(generate_series(0, 7)) AS g),
        cells AS (
            SELECT d.mid, d.orig, gy.g AS yi, gx.g AS xi,
                   ((gy.g * d.h // 8) * d.w + (gx.g * d.w // 8)) * 3 AS p
            FROM dims d CROSS JOIN g gy CROSS JOIN g gx
        ),
        vals AS (SELECT mid, yi, xi, {cs} AS cs FROM cells),
        tot AS (SELECT mid, SUM(cs) AS total FROM vals GROUP BY mid),
        bits AS (
            SELECT v.mid, v.yi * 8 + v.xi AS idx,
                   CASE WHEN v.cs * 64 > t.total THEN 1 ELSE 0 END AS bit
            FROM vals v JOIN tot t USING (mid)
        ),
        nib AS (
            SELECT mid, idx // 4 AS nibidx,
                   SUM(bit << (3 - idx % 4)) AS nv
            FROM bits GROUP BY mid, idx // 4
        ),
        hashes AS (
            SELECT mid,
                   string_agg(lower(to_hex(nv)), '' ORDER BY nibidx) AS ahash
            FROM nib GROUP BY mid
        )
        SELECT ahash, CAST(count(*) AS BIGINT) AS n_images,
               MIN(mid) AS keeper
        FROM hashes GROUP BY ahash
    """


@register(
    "m05_image_dedup_ahash",
    tables=(),
    oracle=_m05_oracle(),  # exact-integer aHash over the md5 pixel stream —
    # the only float-free multimodal algorithm, so it graduates from the
    # rows-only gate (VERDICT r06 stretch 9); collision/robustness
    # invariants stay in tests/test_multimodal.py
    tags=("multimodal", "image", "dedup", "perceptual-hash"),
)
def m05(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Image-level dedup by perceptual average-hash: the media table is
    unioned with a re-id'd copy of itself, so every aHash bucket must
    hold exactly its duplicate pair (n_images == 2, keeper == the
    original id) — the deterministic witness that identical payloads
    collide and distinct ones don't."""
    media = M.synthetic_media(spark, n_per_kind=30)
    doubled = media.unionByName(
        media.withColumn("media_id", F.col("media_id") + 1000)
    )
    return M.image_dedup_groups(doubled).orderBy("keeper")


# Quarantine replay: the corrupt set is deterministic (mid % 9 == 0 →
# payload truncated to 3 bytes, so every header unpack fails), the
# survivors' mean replays m01's exact-integer chain, and the corrupt
# rows carry decoded=false with NULL mean — the oracle proves BOTH that
# skip drops exactly the malformed payloads and that the survivors'
# features are untouched by the quarantine path.
_M06_ORACLE = f"""
    WITH dims AS (
        SELECT 3 * range AS mid,
               (8 + (3 * range) % 8) * (8 + (3 * range) % 5) * 3 AS nbytes
        FROM range(0, 30)
    ),
    bytes AS (
        SELECT d.mid, {_md5_byte('img', 'd.mid', 'p.range')} AS val
        FROM dims d JOIN range(0, 540) p ON p.range < d.nbytes
        WHERE d.mid % 9 <> 0
    ),
    agg AS (
        SELECT mid, COUNT(*) AS n, SUM(val) AS sx FROM bytes GROUP BY mid
    )
    SELECT d.mid AS media_id,
           d.mid % 9 <> 0 AS decoded,
           CAST(a.sx AS DOUBLE) / CAST(a.n AS DOUBLE) AS mean_intensity
    FROM dims d LEFT JOIN agg a ON a.mid = d.mid
"""


@register(
    "m06_decode_quarantine",
    tables=(),
    oracle=_M06_ORACLE,
    tags=("multimodal", "image", "quarantine", "robustness", "mapInPandas"),
)
def m06(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Corrupt-payload quarantine (r12): at 100 TB malformed blobs are a
    statistical certainty, and a bare decode fails its task 4× and kills
    the stage. Every media_id % 9 == 0 image payload is truncated to 3
    bytes; ``image_features(on_error="skip")`` must return the OTHER
    images' exact features while ``media_decode_errors`` names exactly
    the truncated ones — joined into one per-image verdict row
    (decoded, mean_intensity NULL when quarantined). NotImplementedError
    (missing codec library) is deliberately NOT skippable — only the
    malformed-payload error class is (operators/multimodal.py
    _payload_errors)."""
    media = M.synthetic_media(spark, n_per_kind=30)
    imgs = media.filter(F.col("kind") == "image")
    corrupted = imgs.withColumn(
        "payload",
        F.when(
            F.col("media_id") % 9 == 0, F.expr("substring(payload, 1, 3)")
        ).otherwise(F.col("payload")),
    )
    feats = M.image_features(corrupted, on_error="skip").select(
        "media_id", "mean_intensity"
    )
    bad = (
        M.media_decode_errors(corrupted)
        .select("media_id")
        .withColumn("bad", F.lit(True))
    )
    return (
        imgs.select("media_id")
        .join(feats, "media_id", "left")
        .join(bad, "media_id", "left")
        .select(
            "media_id",
            F.col("bad").isNull().alias("decoded"),
            "mean_intensity",
        )
    )


@register(
    "m07_onepass_quarantine",
    tables=(),
    oracle=_M06_ORACLE,  # same per-image verdict as m06 — proving the
    # one-pass mode produces byte-identical features AND the identical
    # quarantine set without the second decode
    tags=("multimodal", "image", "quarantine", "one-pass", "mapInPandas"),
)
def m07(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """ONE-PASS corrupt-payload quarantine (r13, VERDICT r12 directive
    2): where m06 builds its per-image verdict from TWO decode passes
    (``image_features(on_error="skip")`` + ``media_decode_errors``),
    this spec builds the same verdict from ONE —
    ``image_features(on_error="quarantine")`` emits survivors' features
    and quarantined rows' reasons from a single mapInPandas, and
    ``quarantine_split`` separates them. Same oracle as m06, so the
    green hash proves the one-pass mode changes NOTHING about which
    rows survive or what their features are — it only deletes the
    second decode (the cost that dominates a 100 TB media corpus;
    measured in SCALE.md's one-decode-pass section)."""
    media = M.synthetic_media(spark, n_per_kind=30)
    imgs = media.filter(F.col("kind") == "image")
    corrupted = imgs.withColumn(
        "payload",
        F.when(
            F.col("media_id") % 9 == 0, F.expr("substring(payload, 1, 3)")
        ).otherwise(F.col("payload")),
    )
    combined = M.image_features(corrupted, on_error="quarantine")
    good, bad = M.quarantine_split(combined)
    return (
        imgs.select("media_id")
        .join(good.select("media_id", "mean_intensity"), "media_id", "left")
        .join(bad.select("media_id", F.lit(True).alias("bad")),
              "media_id", "left")
        .select(
            "media_id",
            F.col("bad").isNull().alias("decoded"),
            "mean_intensity",
        )
    )

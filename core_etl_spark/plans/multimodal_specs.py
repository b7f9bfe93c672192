"""Multimodal specs — the training-data-pipeline binary-column operators
(brief: image/audio/video as opaque binary + typed metadata, processed by
Arrow-batched ``mapInPandas``). No SQL oracle exists for binary codec work,
so these are rows-only gates; the golden-value assertions live in
tests/test_multimodal.py. Each spec returns a deterministic summary frame
over the synthetic fake-codec media table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import multimodal as M
from .base import register


@register(
    "m01_image_features",
    tables=(),
    oracle=None,  # binary decode + numpy feature math — rows-only gate
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


@register(
    "m02_image_resize",
    tables=(),
    oracle=None,
    tags=("multimodal", "image", "mapInPandas"),
)
def m02(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Nearest-neighbor image resize re-encoded to the payload format;
    returns the new geometry + payload size per image."""
    media = M.synthetic_media(spark, n_per_kind=30)
    return (
        M.resize_images(media, 4, 4)
        .select("media_id", "width", "height", F.length("payload").alias("payload_bytes"))
        .orderBy("media_id")
    )


@register(
    "m03_audio_features",
    tables=(),
    oracle=None,
    tags=("multimodal", "audio", "mapInPandas"),
)
def m03(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Audio RMS + zero-crossing features over i16 PCM payloads."""
    media = M.synthetic_media(spark, n_per_kind=30)
    return M.audio_features(media).orderBy("media_id")


@register(
    "m04_video_frame_sample",
    tables=(),
    oracle=None,
    tags=("multimodal", "video", "mapInPandas", "explode"),
)
def m04(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
    """Every-2nd-frame sampling: 1 video row → ceil(n/2) frame rows (the
    binary-column analogue of the batchTransfer 1→N explode)."""
    media = M.synthetic_media(spark, n_per_kind=30)
    return (
        M.sample_frames(media, every_k=2)
        .select("media_id", "frame_index", F.length("frame_payload").alias("frame_bytes"))
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

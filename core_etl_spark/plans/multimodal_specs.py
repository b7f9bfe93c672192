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


@register(
    "m05_image_dedup_ahash",
    tables=(),
    oracle=None,  # binary decode + numpy hash math — rows-only gate;
    # collision/robustness invariants asserted in tests/test_multimodal.py
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

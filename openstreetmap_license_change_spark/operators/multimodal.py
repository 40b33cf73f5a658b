"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side architecture is real and tested — schema (binary payload
+ typed metadata struct), partitioning, Arrow batch shape, mapInPandas
signatures — while the codec step itself is stubbed: the sandbox ships
no image/audio libraries, so ``decode_image``/``sample_frames`` either
raise NotImplementedError (strict mode) or produce a deterministic fake
(test mode) with the exact output schema a real decoder would emit.

At 100 TB the pattern is: binary columns live in their own parquet
column chunks (columnar pruning means metadata-only queries never read
the payload bytes), decode runs in ``mapInPandas`` with small
``maxRecordsPerBatch`` (payloads are MBs, not rows), and the decoded
features land in a separate table keyed by content hash.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("url", StringType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_duration_ms", IntegerType()),
        StructField("meta_codec", StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("feature_vec", ArrayType(FloatType())),
    ]
)

STRICT_DECODE = False  # flip on when a real codec library is present


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table exercising the binary-column path."""
    return (
        spark.range(0, n)
        .select(
            F.col("id").alias("media_id"),
            F.concat(F.lit("media://"), F.col("id").cast("string")).alias("url"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("media_type"),
            F.encode(
                F.repeat(F.concat(F.lit("payload-"), F.col("id").cast("string")), 8),
                "utf-8",
            ).cast("binary").alias("payload"),
            ((F.col("id") % 16 + 1) * 64).cast("int").alias("meta_width"),
            ((F.col("id") % 9 + 1) * 64).cast("int").alias("meta_height"),
            ((F.col("id") % 30 + 1) * 1000).cast("int").alias("meta_duration_ms"),
            F.lit("fake/1").alias("meta_codec"),
        )
    )


def _fake_decode(payload: bytes, width: int, height: int) -> list[float]:
    """Deterministic stand-in for a pixel decode + pooled feature:
    byte histogram moments of the payload."""
    if not payload:
        return [0.0] * 8
    n = len(payload)
    buckets = [0] * 8
    for b in payload:
        buckets[b >> 5] += 1
    return [round(c / n, 6) for c in buckets]


def extract_image_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode → feature vectors.

    The batch shape, schema and partitioning are production-real; only
    the innermost decode is a deterministic fake (STRICT_DECODE raises
    instead, marking where libjpeg/ffmpeg plug in)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if STRICT_DECODE:
                raise NotImplementedError(
                    "real image decode requires an image library not "
                    "present in this environment"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["meta_width"],
                    "height": pdf["meta_height"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature_vec": [
                        _fake_decode(p, w, h)
                        for p, w, h in zip(
                            pdf["payload"], pdf["meta_width"], pdf["meta_height"]
                        )
                    ],
                }
            )
            yield out

    return (
        media.where(F.col("media_type") == "image")
        .repartition("media_id")
        .mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode sample timestamps natively
    (pure metadata arithmetic — no decode), ready to feed a decoder."""
    return (
        media.where(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta_duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("sample_ms"),
        )
    )

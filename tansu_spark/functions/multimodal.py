"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the decode kernels are
deterministic fakes / NotImplementedError stubs behind the same interface
a real deployment would use (swap `_decode_image_bytes` for PIL/ffmpeg).
Everything Spark-side — schema, partition sizing, UDF batch shape,
metadata propagation — is real and tested.

Scale notes: media blobs dominate row size, so the iterator-of-batches
mapInPandas form matters: Arrow streams batches without materializing a
partition in memory, and `spark.sql.files.maxPartitionBytes` (not row
count) governs task sizing. Feature extraction emits small fixed-width
rows — output partitions are rebalanced by the downstream shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

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

# Schema of a multimodal asset row — binary payload + typed metadata,
# mirroring the reference's opaque-bytes record value with a schema'd
# envelope (FIXTURES.md "Envelope").
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime_type", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_digest", StringType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def _decode_image_bytes(content: bytes) -> Any:
    """Real deployments: PIL.Image.open(io.BytesIO(content)). This
    container has no codecs — deterministic fake keeps plumbing testable."""
    raise NotImplementedError("image codecs unavailable in this environment")


def _fake_feature(content: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decode→embed kernel: bytes → fixed-width
    feature from a rolling checksum. Replace with a real model at deploy."""
    if content is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, byte in enumerate(content):
        acc[i % dim] = (acc[i % dim] * 31 + byte) % 997
    return [a / 997.0 for a in acc]


def extract_features(assets: DataFrame, feature_dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over multimodal assets.

    Iterator form — batches stream through Arrow; nothing buffers a whole
    partition. Output: FEATURE_SCHEMA (+`feature` sized feature_dim).
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "content_digest": content.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "feature": content.map(lambda b: _fake_feature(b, feature_dim)),
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video assets: one output row per sampled
    timestamp (the decode itself is the stubbed kernel). Pure column ops —
    the expansion is `sequence()` per row, executed JVM-side."""
    return (
        assets.filter(F.col("modality") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("asset_id", "frame_ts_ms", "mime_type")
    )


def resize_plan(assets: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize planning: target dims preserving aspect ratio, computed as
    column arithmetic; the pixel work happens in the (stubbed) kernel."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return assets.filter(F.col("modality") == "image").select(
        "asset_id",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("target_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_height"),
    )


def audio_frame_plan(
    assets: DataFrame, window_ms: int = 25, hop_ms: int = 10
) -> DataFrame:
    """STFT-style framing plan for audio assets: the standard
    25 ms-window / 10 ms-hop layout every speech feature front end uses.
    n_frames = 1 + floor((duration - window) / hop) when the clip covers
    at least one window, else 0; covered_ms is the span the last frame
    reaches. Pure integer column math (the sample decode is the stubbed
    kernel) — the plan a 100 TB audio pipeline uses to budget feature
    storage before touching a single byte of PCM."""
    d = F.coalesce(F.col("duration_ms"), F.lit(0))
    n = F.when(
        d >= window_ms, F.lit(1) + ((d - window_ms) / hop_ms).cast("long")
    ).otherwise(F.lit(0))
    return (
        assets.filter(F.col("modality") == "audio")
        .select(
            "asset_id",
            d.alias("duration_ms"),
            n.alias("n_frames"),
            F.when(n > 0, (n - 1) * hop_ms + window_ms)
            .otherwise(F.lit(0))
            .cast("long")
            .alias("covered_ms"),
        )
    )

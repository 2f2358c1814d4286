"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio codecs, so the decode kernels are
STUBBED behind ``deterministic_fake=True`` (a seeded fake feature
vector derived from the bytes) or raise NotImplementedError — but the
Spark-side plumbing is real and tested: schema, Arrow batch shape,
partition-parallel mapInPandas, metadata projection. Swapping the
stub for PIL/librosa changes only the inner function.

Scale shape: decode/feature-extract is a narrow map (no shuffle);
frame sampling fans out rows via explode AFTER the cheap metadata
probe so the expensive decode only touches sampled frames.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media corpus (payload = seeded bytes)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("id") % 3 + 1).cast("int")).alias("kind"),
        F.encode(F.concat(F.lit("payload-"), F.sha2(F.col("id").cast("string"), 256)),
                 "UTF-8").alias("payload"),
        F.create_map(F.lit("width"), (F.col("id") % 640).cast("string"),
                     F.lit("duration_ms"),
                     (F.col("id") * 37 % 10000).cast("string")).alias("meta"),
    )
    return df


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decoder': bytes -> feature vector. Replace
    with a real decoder (PIL/librosa/ffmpeg) in production."""
    import hashlib

    d = hashlib.sha256(payload).digest()
    return [int.from_bytes(d[4 * i:4 * i + 4], "big") / 2**32
            for i in range(dim)]


def extract_features(media: DataFrame, dim: int = 8,
                     deterministic_fake: bool = True) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas."""
    if not deterministic_fake:
        raise NotImplementedError(
            "real media decoding requires PIL/librosa/ffmpeg — not "
            "available in this container; use deterministic_fake=True")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "feature": [_fake_feature(bytes(p), dim)
                            for p in pdf["payload"]],
            })

    return media.mapInPandas(gen, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling plan for video rows: cheap metadata math first
    (duration from the typed meta map), THEN fan out one row per
    sampled frame — the expensive decode happens after pruning."""
    video = media.where(F.col("kind") == "video")
    duration = F.element_at("meta", "duration_ms").cast("long")
    n_frames = F.greatest(F.lit(1), (duration / every_ms).cast("int"))
    return (video
            .withColumn("frame_idx", F.explode(
                F.sequence(F.lit(0), n_frames - 1)))
            .select("media_id", "frame_idx",
                    (F.col("frame_idx") * every_ms).alias("frame_ts_ms")))


def resize_images(media: DataFrame, width: int = 224,
                  deterministic_fake: bool = True) -> DataFrame:
    """Image resize stub: real implementation would decode, resize,
    re-encode inside the same Arrow batch loop."""
    if not deterministic_fake:
        raise NotImplementedError("image resize requires PIL")
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("out_width", T.IntegerType()),
    ])

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                # fake resize: truncate payload proportionally
                "resized": [bytes(p)[:width] for p in pdf["payload"]],
                "out_width": width,
            })

    return (media.where(F.col("kind") == "image")
            .mapInPandas(gen, out_schema))

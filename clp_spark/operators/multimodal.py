"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata, processed through Arrow-batched mapInPandas stages.

The decode/feature libraries (PIL, ffmpeg, torchaudio, ...) are NOT in this
container, so the codec step is stubbed behind `decoder=` hooks with a
deterministic fake (documented, tested); the Spark-side plumbing — schema,
batch shape, partition sizing, UDF signatures — is real. On a cluster you
inject a real decoder and nothing else changes.

Scale notes: binary payloads dominate partition size, so media tables should
be read with a smaller files.maxPartitionBytes (or written with
maxRecordsPerFile) to keep Arrow batches under executor memory; metadata-only
operations must select away the binary column BEFORE any shuffle (column
pruning keeps the bytes out of the exchange).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)


def fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: derive a (h, w) uint8
    array from the payload bytes. Replace with PIL/turbojpeg on a cluster."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "big", signed=False) % (2**32)
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(max(height, 1), max(width, 1)), dtype=np.uint8)


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = rng.bytes(128 + (i % 5) * 64)
        rows.append(
            (i, kind, bytearray(payload), f"x-fake/{kind}", 32 + i % 16, 24 + i % 8,
             1000 * (1 + i % 30))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, int, int], np.ndarray] = fake_decode_image,
    n_features: int = 8,
) -> DataFrame:
    """Decode -> pooled feature vector, one Arrow batch at a time.

    Raises NotImplementedError from the default decoder path ONLY if a real
    codec is required (`decoder=None`); the deterministic fake keeps the
    pipeline testable in this container."""
    if decoder is None:
        raise NotImplementedError("no media codec available in this container; inject decoder=")
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                img = decoder(bytes(payload), int(w), int(h))
                # mean-pool rows into n_features buckets — a stand-in for a
                # real embedding; shape/typing identical to the real thing
                buckets = np.array_split(img.astype(np.float32).mean(axis=0), n_features)
                feats.append([float(b.mean()) if len(b) else 0.0 for b in buckets])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": feats}
            )

    return media.mapInPandas(run, schema=schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms) without
    touching payloads (pure column ops; the decode happens downstream)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.expr(f"sequence(0, duration_ms - 1, {every_ms})")).alias("frame_ts_ms"),
        )
    )


def metadata_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation with the binary column pruned before the
    shuffle (verify with .explain: the exchange carries no `payload`)."""
    return (
        media.select("kind", "duration_ms", F.length("payload").alias("payload_bytes"))
        .groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum("payload_bytes").alias("total_bytes"),
            F.max("duration_ms").alias("max_duration_ms"),
        )
    )

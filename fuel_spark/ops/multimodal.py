"""Multimodal (image/audio) column operators.

Analogue of ``fuel.transformers.image`` and ``fuel.transformers.
defaults.ToBytes`` (reference ``fuel/transformers/image.py:18`` Images-
FromBytes, ``:105`` MinimumImageDimensions, ``:178`` RandomFixedSize-
Crop, ``:274`` Random2DRotation; ``defaults.py:12`` ToBytes).

Design for Spark: media payloads are opaque ``binary`` columns with
typed metadata (width/height/channels); heavy per-item decode work
runs in Arrow-batched ``mapInPandas`` so Python cost is amortized per
batch.  When PIL is importable the decode/resample/rotate branches
are real (bytes → PIL → (c,h,w) uint8 tensors, bicubic upscale,
bilinear rotation); without it — as in this build container — a
documented deterministic fake decoder (hash-derived pixels) keeps
every piece of the Spark plumbing runnable and asserted.
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


def _pil_decode(payload: bytes, channels: int) -> np.ndarray:
    """Real decode (reference fuel/transformers/image.py:40-60
    ImagesFromBytes.transform_source_example): bytes → PIL → uint8
    ndarray in (channels, height, width) layout; grayscale gets a
    length-1 channel axis."""
    from io import BytesIO

    from PIL import Image

    mode = "RGB" if channels == 3 else "L"
    arr = np.asarray(Image.open(BytesIO(payload)).convert(mode), dtype=np.uint8)
    if arr.ndim == 2:
        return arr[None, :, :]
    return arr.transpose(2, 0, 1)


def _decode_any(payload, channels: int) -> np.ndarray:
    """PIL decode when available and the payload is a real image;
    deterministic fake otherwise, so the pipeline stays runnable on
    non-image fixtures and in containers without image libs."""
    raw = payload if isinstance(payload, bytes) else bytes(payload or b"")
    if HAVE_PIL:
        try:
            return _pil_decode(raw, channels)
        except Exception:
            pass
    return _fake_decode(raw, channels)


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
            tensors = [_decode_any(b, channels) for b in pdf[bytes_col]]
            out = pd.DataFrame(
                {
                    "item_id": pdf[id_col].astype("int64"),
                    "channels": [t.shape[0] for t in tensors],
                    "height": [t.shape[1] for t in tensors],
                    "width": [t.shape[2] for t in tensors],
                    "pixels": [t.ravel().astype("int32").tolist() for t in tensors],
                }
            )
            yield out

    out = df.select(id_col, bytes_col).mapInPandas(decode, DECODED_SCHEMA)
    return with_axis_labels(out, "pixels", ("channel", "height", "width"))


def ensure_min_dims(
    df: DataFrame, min_height: int, min_width: int, resample: bool = False
) -> DataFrame:
    """MinimumImageDimensions (reference fuel/transformers/image.py:105):
    flag items below a minimum size; with ``resample=True`` and PIL
    present, upscale them preserving aspect ratio (image.py:141-152:
    multiplier = max(min_h/h, min_w/w), ceil dims, PIL resize).

    The decision predicate is metadata-only (no pixel reads —
    pushdown-friendly at scale); only flagged rows pay the Python
    resample cost.
    """
    import math

    needs = (F.col("height") < min_height) | (F.col("width") < min_width)
    out = df.withColumn("needs_upscale", needs)
    if not (resample and HAVE_PIL):
        return out

    schema = StructType(out.schema.fields)

    def upscale(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from PIL import Image

        for pdf in batches:
            for i in pdf.index:
                if not pdf.at[i, "needs_upscale"]:
                    continue
                c = int(pdf.at[i, "channels"])
                h = int(pdf.at[i, "height"])
                w = int(pdf.at[i, "width"])
                mult = max(min_height / h, min_width / w)
                nh, nw = int(math.ceil(h * mult)), int(math.ceil(w * mult))
                px = np.asarray(pdf.at[i, "pixels"], dtype=np.uint8).reshape(c, h, w)
                res = np.stack(
                    [
                        np.asarray(
                            Image.fromarray(ch).resize((nw, nh), Image.BICUBIC),
                            dtype=np.uint8,
                        )
                        for ch in px
                    ]
                )
                pdf.at[i, "pixels"] = res.ravel().astype("int32").tolist()
                pdf.at[i, "height"] = nh
                pdf.at[i, "width"] = nw
            yield pdf

    return out.mapInPandas(upscale, schema)


def random_crop(
    df: DataFrame, crop_h: int, crop_w: int, seed: int = 42, id_col: str = "item_id"
) -> DataFrame:
    """RandomFixedSizeCrop with *seeded, reproducible* offsets: the
    (row, seed) hash picks the crop origin, so re-running the pipeline
    crops identically — fuel used a driver RNG, which cannot reproduce
    under distributed reordering.

    Crops the flattened (c,h,w) pixel array with JVM slice arithmetic.
    """
    expect_axis_labels(df, "pixels", ("channel", "height", "width"))
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
    cropped = (
        out.withColumn("pixels", crop)
        .withColumn("height", F.lit(crop_h))
        .withColumn("width", F.lit(crop_w))
        .drop("_y0", "_x0")
    )
    # withColumn replaced the pixels column — re-attach the labels
    return with_axis_labels(cropped, "pixels", ("channel", "height", "width"))


def random_rotation(
    df: DataFrame,
    max_angle: float,
    seed: int = 42,
    id_col: str = "item_id",
    rotate_pixels: bool = True,
) -> DataFrame:
    """Random2DRotation (reference fuel/transformers/image.py:274):
    seeded per-row angle in [-max_angle, max_angle] degrees; with PIL
    present the pixel tensor is rotated per channel with bilinear
    resample (image.py:300-318).  Without PIL the angle column is
    still assigned (the deterministic, distributed part) and pixels
    pass through unchanged.

    Seeding is (row, seed)-hash based, so re-running the pipeline
    rotates identically under any partitioning — fuel's driver RNG
    cannot reproduce under distributed reordering.
    """
    expect_axis_labels(df, "pixels", ("channel", "height", "width"))
    u = (
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed), F.lit("rot")), F.lit(10_000))
        .cast("double")
        / 10_000.0
    )
    angle = (u * 2.0 - 1.0) * max_angle
    out = df.withColumn("angle", F.round(angle, 6))
    if not (rotate_pixels and HAVE_PIL):
        return out

    schema = StructType(out.schema.fields)

    def rotate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from PIL import Image

        for pdf in batches:
            for i in pdf.index:
                c = int(pdf.at[i, "channels"])
                h = int(pdf.at[i, "height"])
                w = int(pdf.at[i, "width"])
                px = np.asarray(pdf.at[i, "pixels"], dtype=np.uint8).reshape(c, h, w)
                rot = np.stack(
                    [
                        np.asarray(
                            Image.fromarray(ch).rotate(
                                float(pdf.at[i, "angle"]), resample=Image.BILINEAR
                            ),
                            dtype=np.uint8,
                        )
                        for ch in px
                    ]
                )
                pdf.at[i, "pixels"] = rot.ravel().astype("int32").tolist()
            yield pdf

    return out.mapInPandas(rotate, schema)


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


# ---------------------------------------------------------------------------
# Axis-label metadata (reference fuel/transformers/__init__.py:19
# ExpectsAxisLabels + fuel Dataset.axis_labels): fuel propagates
# ('batch', 'channel', 'height', 'width')-style labels with the data
# and transformers verify them before operating.  The Spark-native
# carrier is column metadata — it rides through select/withColumn
# renames in the logical plan, costs nothing at runtime, and survives
# parquet round-trips (written into the parquet field metadata).
# ---------------------------------------------------------------------------

AXIS_LABELS_KEY = "axis_labels"


def with_axis_labels(df: DataFrame, col: str, labels: tuple | list) -> DataFrame:
    """Attach semantic axis labels to a tensor-carrying column
    (e.g. ``('channel', 'height', 'width')`` on a flattened pixel
    array).  Pure metadata: no plan change, no runtime cost."""
    return df.withMetadata(col, {AXIS_LABELS_KEY: list(labels)})


def axis_labels(df: DataFrame, col: str) -> tuple | None:
    """Read back a column's axis labels (None if unlabeled)."""
    for f in df.schema.fields:
        if f.name == col:
            md = f.metadata or {}
            got = md.get(AXIS_LABELS_KEY)
            return tuple(got) if got is not None else None
    raise ValueError(f"no such column: {col}")


def expect_axis_labels(
    df: DataFrame, col: str, expected: tuple | list
) -> DataFrame:
    """Verify a column's axis labels before operating on it —
    the ExpectsAxisLabels contract (fuel/transformers/__init__.py:19
    verify_axis_labels warns/raises on mismatch; here: raise, since a
    silently mis-ordered tensor axis is a correctness bug).  Unlabeled
    columns pass (opt-in metadata), mismatched labels raise."""
    got = axis_labels(df, col)
    if got is not None and got != tuple(expected):
        raise ValueError(
            f"axis labels mismatch on {col!r}: expected {tuple(expected)}, "
            f"got {got}"
        )
    return df


def perceptual_hash(
    df: DataFrame, id_col: str, bytes_col: str, hash_size: int = 8
) -> DataFrame:
    """pHash-style perceptual image fingerprint for IMAGE near-dup
    detection: decode → grayscale → 32x32 resample → 2-D DCT → sign of
    the ``hash_size`` x ``hash_size`` low-frequency block vs its
    median → one 64-bit hash.  Near-identical images (recompression,
    mild resize) land Hamming-close; exact-group them with the
    doc-dedup machinery (groupBy on the hash == exact_dedup shape) or
    band the bits for Hamming-tolerant blocking.

    The decode/DCT runs in the same Arrow-batched ``mapInPandas`` tier
    as decode_images (pure numpy — no scipy dependency: the DCT is two
    small matmuls against a precomputed basis, the faiss/NumPy
    idiom); everything downstream of the hash column is JVM-side.
    Output: item_id, phash (bigint).
    """
    n = 32

    def _dct_mat(size: int) -> np.ndarray:
        k = np.arange(size)[None, :]
        i = np.arange(size)[:, None]
        m = np.cos(np.pi * (2 * k + 1) * i / (2 * size))
        m[0] *= 1 / np.sqrt(2)
        return m * np.sqrt(2 / size)

    D = _dct_mat(n)

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf[bytes_col]:
                t = _decode_any(payload, 3).astype(np.float64)
                gray = t.mean(axis=0)
                h, w = gray.shape
                # nearest-neighbor resample to n x n (no PIL needed)
                yi = (np.arange(n) * h // n).clip(0, h - 1)
                xi = (np.arange(n) * w // n).clip(0, w - 1)
                small = gray[np.ix_(yi, xi)]
                dct = D @ small @ D.T
                low = dct[:hash_size, :hash_size].ravel()
                bits = low > np.median(low)
                val = 0
                for b in bits:
                    val = (val << 1) | int(b)
                # two's-complement into a signed 64-bit long
                if val >= 1 << 63:
                    val -= 1 << 64
                out.append(val)
            yield pd.DataFrame(
                {"item_id": pdf[id_col].astype("int64"), "phash": out}
            )

    return df.select(id_col, bytes_col).mapInPandas(
        hashes, "item_id bigint, phash bigint"
    )

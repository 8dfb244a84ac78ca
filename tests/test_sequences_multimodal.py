"""Sliding windows / n-grams (fuel.transformers.sequences parity) and
multimodal plumbing."""

import pytest

from fuel_spark.ops import multimodal, sequences
from fuel_spark.sources import from_rows


def _seq_df(spark):
    return from_rows(
        spark, [(0, list(range(6)))], schema="k bigint, seq array<bigint>"
    )


def test_ngrams_with_targets(spark):
    # fuel NGrams(3): grams [i..i+2], target seq[i+3]
    out = sorted(
        (r.win_pos, r.gram, r.target)
        for r in sequences.ngrams(_seq_df(spark), "seq", 3, keep=["k"]).collect()
    )
    assert out == [
        (0, [0, 1, 2], 3),
        (1, [1, 2, 3], 4),
        (2, [2, 3, 4], 5),
    ]


def test_sliding_window_overlapping(spark):
    # source [i..i+2], target offset 1 overlapping → [i+1..i+3]
    out = sorted(
        (r.win_pos, r.source, r.target)
        for r in sequences.sliding_window(
            _seq_df(spark), "seq", offset=1, source_window=3, target_window=3,
            overlapping=True, keep=["k"],
        ).collect()
    )
    assert out[0] == (0, [0, 1, 2], [1, 2, 3])
    assert out[-1] == (2, [2, 3, 4], [3, 4, 5])


def test_sliding_window_nonoverlapping_rnn_shape(spark):
    # fuel docstring case: source N, target N, offset 1, overlap → [1,N],[2,N+1]
    out = sequences.sliding_window(
        _seq_df(spark), "seq", offset=0, source_window=2, target_window=2,
        overlapping=False, keep=["k"],
    ).collect()
    first = sorted((r.win_pos, r.source, r.target) for r in out)[0]
    assert first == (0, [0, 1], [2, 3])


def test_sliding_window_negative_offset(spark):
    # negative offset: target window starts before the source window;
    # fuel clamps the start index so both windows stay in range
    out = sorted(
        (r.win_pos, r.source, r.target)
        for r in sequences.sliding_window(
            _seq_df(spark), "seq", offset=-2, source_window=2, target_window=2,
            overlapping=False, keep=["k"],
        ).collect()
    )
    # shift = -2 + 2 = 0 → target == source window positions
    assert out[0] == (0, [0, 1], [0, 1])
    assert out[-1] == (4, [4, 5], [4, 5])


def test_short_sequences_dropped(spark):
    df = from_rows(spark, [(0, [1, 2])], schema="k bigint, seq array<bigint>")
    assert sequences.ngrams(df, "seq", 3, keep=["k"]).count() == 0


def test_decode_images_shapes(spark):
    df = from_rows(
        spark,
        [(0, bytearray(b"abc")), (1, bytearray(b""))],
        schema="item_id bigint, payload binary",
    )
    out = {r.item_id: r for r in
           multimodal.decode_images(df, "item_id", "payload").collect()}
    assert out[0].channels == 3 and out[0].height == 8 and out[0].width == 8
    assert len(out[0].pixels) == 3 * 8 * 8
    # deterministic fake decode: same payload → same pixels
    again = multimodal.decode_images(df, "item_id", "payload").collect()
    assert {r.item_id: r.pixels for r in again}[0] == out[0].pixels


def test_random_crop_seeded(spark):
    df = from_rows(
        spark,
        [(0, bytearray(b"some-image-bytes"))],
        schema="item_id bigint, payload binary",
    )
    dec = multimodal.decode_images(df, "item_id", "payload")
    a = multimodal.random_crop(dec, 4, 4, seed=1).first()
    b = multimodal.random_crop(dec, 4, 4, seed=1).first()
    c = multimodal.random_crop(dec, 4, 4, seed=2).first()
    assert a.height == 4 and a.width == 4 and len(a.pixels) == 3 * 4 * 4
    assert a.pixels == b.pixels  # seeded reproducibility
    assert isinstance(c.pixels, list)


def test_random_rotation_seeded(spark):
    df = from_rows(
        spark, [(0, bytearray(b"img"))], schema="item_id bigint, payload binary"
    )
    dec = multimodal.decode_images(df, "item_id", "payload")
    a = multimodal.random_rotation(dec, 30.0, seed=1).first().angle
    b = multimodal.random_rotation(dec, 30.0, seed=1).first().angle
    c = multimodal.random_rotation(dec, 30.0, seed=2).first().angle
    assert a == b and -30.0 <= a <= 30.0
    assert a != c


def test_frame_sample(spark):
    df = from_rows(
        spark,
        [(0, [[1], [2], [3], [4], [5], [6], [7]])],
        schema="item_id bigint, frames array<array<int>>",
    )
    r = multimodal.frame_sample(df, n_frames=3, stride=2).first()
    assert r.sampled_frames == [[1], [3], [5]]


def test_decode_falls_back_on_invalid_bytes(spark):
    """Non-image payloads decode via the deterministic fake in every
    environment — with PIL present the real branch raises internally
    and falls back, without PIL the fake is the only branch."""
    df = from_rows(
        spark,
        [(0, bytearray(b"definitely not a png"))],
        schema="item_id bigint, payload binary",
    )
    r = multimodal.decode_images(df, "item_id", "payload").first()
    assert (r.channels, r.height, r.width) == (3, 8, 8)
    assert len(r.pixels) == 3 * 8 * 8


@pytest.mark.skipif(not multimodal.HAVE_PIL, reason="PIL not installed")
def test_pil_real_decode_rotate_upscale(spark):
    """Real-pixel path (reference fuel/transformers/image.py:40-60
    decode, :141-152 min-dims resize, :300-318 rotation)."""
    import io

    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(7)
    arr = rng.randint(0, 255, size=(6, 4, 3), dtype="uint8")  # h=6 w=4
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    df = from_rows(
        spark,
        [(0, bytearray(buf.getvalue()))],
        schema="item_id bigint, payload binary",
    )
    dec = multimodal.decode_images(df, "item_id", "payload")
    r = dec.first()
    assert (r.channels, r.height, r.width) == (3, 6, 4)
    got = np.asarray(r.pixels, dtype="uint8").reshape(3, 6, 4)
    assert (got == arr.transpose(2, 0, 1)).all()  # lossless PNG roundtrip

    up = multimodal.ensure_min_dims(dec, 8, 8, resample=True).first()
    assert up.needs_upscale and up.height == 12 and up.width == 8
    assert len(up.pixels) == 3 * 12 * 8

    rot = multimodal.random_rotation(dec, 30.0, seed=1).first()
    assert len(rot.pixels) == 3 * 6 * 4 and -30.0 <= rot.angle <= 30.0


def test_axis_labels_attach_read_expect(spark):
    from fuel_spark.ops import multimodal as mm
    from fuel_spark.sources import from_rows

    df = from_rows(
        spark,
        [(1, 1, 2, 2, [0, 1, 2, 3])],
        schema="item_id bigint, channels int, height int, width int,"
               " pixels array<int>",
    )
    assert mm.axis_labels(df, "pixels") is None  # unlabeled: opt-in
    labeled = mm.with_axis_labels(df, "pixels", ("channel", "height", "width"))
    assert mm.axis_labels(labeled, "pixels") == ("channel", "height", "width")
    # correct expectation passes and returns the frame
    assert mm.expect_axis_labels(
        labeled, "pixels", ("channel", "height", "width")
    ) is labeled
    # wrong order raises (the ExpectsAxisLabels contract)
    try:
        mm.expect_axis_labels(labeled, "pixels", ("height", "width", "channel"))
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "axis labels mismatch" in str(e)
    # labels survive projection; random_crop re-attaches after rewrite
    proj = labeled.select("item_id", "pixels", "channels", "height", "width")
    assert mm.axis_labels(proj, "pixels") == ("channel", "height", "width")
    cropped = mm.random_crop(labeled, 1, 1)
    assert mm.axis_labels(cropped, "pixels") == ("channel", "height", "width")


def test_axis_labels_reject_mislabeled_crop(spark):
    from fuel_spark.ops import multimodal as mm
    from fuel_spark.sources import from_rows

    df = from_rows(
        spark,
        [(1, 1, 2, 2, [0, 1, 2, 3])],
        schema="item_id bigint, channels int, height int, width int,"
               " pixels array<int>",
    )
    bad = mm.with_axis_labels(df, "pixels", ("height", "width", "channel"))
    try:
        mm.random_crop(bad, 1, 1)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_perceptual_hash_deterministic_and_discriminative(spark):
    """Same payload -> same 64-bit phash; different payloads diverge;
    PIL-identical re-decodes group exactly (the image-dedup shape)."""
    rows = [
        (1, b"image-payload-alpha" * 20),
        (2, b"image-payload-alpha" * 20),   # exact duplicate payload
        (3, b"completely-different-bytes" * 20),
    ]
    df = from_rows(spark, rows, schema="item_id bigint, payload binary")
    out = {r.item_id: r.phash for r in
           multimodal.perceptual_hash(df, "item_id", "payload").collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]
    # stable across invocations
    again = {r.item_id: r.phash for r in
             multimodal.perceptual_hash(df, "item_id", "payload").collect()}
    assert again == out
    # composes with exact dedup on the hash column
    from fuel_spark.ops.dedup import exact_dedup

    from pyspark.sql import functions as F

    ph = multimodal.perceptual_hash(df, "item_id", "payload")
    groups = exact_dedup(
        ph.select("item_id", F.col("phash").cast("string").alias("t")),
        "item_id", "t",
    ).collect()
    sizes = sorted(g.dup_count for g in groups)
    assert sizes == [1, 2]

"""Invariant tests for the multimodal mechanics oracle tier
(ops/pixels.py): exact-integer geometry laws, spectral-hash
properties, and fixture determinism — the behavioral layer under the
13 exact-hash oracle queries (image_* / video_* / audio_*)."""

import pytest
from pyspark.sql import functions as F

from fuel_spark.ops import pixels
from fuel_spark.sources import from_rows


@pytest.fixture(scope="module")
def ids(spark):
    return from_rows(spark, [(i,) for i in range(4)], schema="doc_id bigint")


def _as_map(px):
    return {
        (r.id, r.c, r.y, r.x): r.v for r in px.collect()
    }


def test_synth_pixel_table_shape_and_determinism(spark, ids):
    px = pixels.synth_pixel_table(ids, "doc_id", h=4, w=4, channels=2)
    rows = px.collect()
    assert len(rows) == 4 * 2 * 4 * 4
    assert all(0 <= r.v < 256 for r in rows)
    # deterministic: a second build is identical cell-for-cell
    again = pixels.synth_pixel_table(ids, "doc_id", h=4, w=4, channels=2)
    assert _as_map(px) == _as_map(again)
    # content_col clones: same pixels under a different id
    cloned = ids.select(
        (F.col("doc_id") + 100).alias("doc_id"),
        F.col("doc_id").alias("k"),
    )
    cpx = pixels.synth_pixel_table(
        cloned, "doc_id", h=4, w=4, channels=2, content_col="k"
    )
    base = _as_map(px)
    for (i, c, y, x), v in _as_map(cpx).items():
        assert base[(i - 100, c, y, x)] == v


def test_rotate90_four_times_is_identity(spark, ids):
    px = pixels.synth_pixel_table(ids, "doc_id")
    r = px
    for _ in range(4):
        r = pixels.rotate90(r, 8)
    assert _as_map(px) == _as_map(r)
    # one rotation maps (y, x) -> (x, 7-y)
    r1 = _as_map(pixels.rotate90(px, 8))
    for (i, c, y, x), v in _as_map(px).items():
        assert r1[(i, c, x, 7 - y)] == v


def test_flip_h_involution_and_remap(spark, ids):
    px = pixels.synth_pixel_table(ids, "doc_id")
    f1 = pixels.flip_h(px, 8)
    assert _as_map(pixels.flip_h(f1, 8)) == _as_map(px)
    fm = _as_map(f1)
    for (i, c, y, x), v in _as_map(px).items():
        assert fm[(i, c, y, 7 - x)] == v


def test_crop_reindexes_to_window_origin(spark, ids):
    px = pixels.synth_pixel_table(ids, "doc_id")
    cm = _as_map(pixels.crop(px, 2, 3, 4, 4))
    base = _as_map(px)
    assert len(cm) == 4 * 3 * 4 * 4
    for (i, c, y, x), v in cm.items():
        assert 0 <= y < 4 and 0 <= x < 4
        assert base[(i, c, y + 2, x + 3)] == v


def test_downsample_box_exact_floor_mean(spark):
    # one 1-channel 2x2 image with known values -> one pixel
    one = from_rows(spark, [(1,)], schema="doc_id bigint")
    px = from_rows(
        spark,
        [(1, 0, 0, 0, 10), (1, 0, 0, 1, 11), (1, 0, 1, 0, 12),
         (1, 0, 1, 1, 14)],
        schema="id bigint, c int, y int, x int, v bigint",
    )
    out = pixels.downsample_box(px, 2).collect()
    assert len(out) == 1
    assert out[0].v == (10 + 11 + 12 + 14) // 4  # floor(11.75) = 11


def test_wht_hash_constant_image_is_dc_only(spark):
    # constant gray -> every non-DC coefficient 0 (sign bit 0), DC > 0
    rows = [(1, c, y, x, 7) for c in range(3) for y in range(8)
            for x in range(8)]
    px = from_rows(
        spark, rows, schema="id bigint, c int, y int, x int, v bigint"
    )
    h = pixels.wht_sign_hash(px).first()
    assert h.phash_hi == 1 and h.phash_lo == 0


def test_phash_band_pairs_finds_clones_only(spark, ids):
    base = ids.select(F.col("doc_id").alias("id"),
                      F.col("doc_id").alias("k"))
    clones = ids.where(F.col("doc_id") < 2).select(
        (F.col("doc_id") + 100).alias("id"), F.col("doc_id").alias("k")
    )
    px = pixels.synth_pixel_table(
        base.unionByName(clones), "id", content_col="k"
    )
    pairs = {
        (r.left_id, r.right_id): r.hamming
        for r in pixels.phash_band_pairs(
            pixels.wht_sign_hash(px), max_hamming=6
        ).collect()
    }
    assert pairs.get((0, 100)) == 0 and pairs.get((1, 101)) == 0
    # random non-clone images sit ~32 bits apart: nothing else passes
    assert set(pairs) == {(0, 100), (1, 101)}


def test_image_signatures_clones_collide_others_do_not(spark, ids):
    base = ids.select(F.col("doc_id").alias("id"),
                      F.col("doc_id").alias("k"))
    clones = ids.where(F.col("doc_id") == 0).select(
        F.lit(100).alias("id"), F.col("doc_id").alias("k")
    )
    px = pixels.synth_pixel_table(
        base.unionByName(clones), "id", content_col="k"
    )
    sigs = {r.id: r.img_sig
            for r in pixels.image_signatures(px).collect()}
    assert sigs[0] == sigs[100]
    assert len(set(sigs.values())) == 4  # 4 distinct contents


def test_frame_stride_and_decimate(spark, ids):
    ft = pixels.synth_frame_table(ids, n_frames=6, frame_px=4)
    sampled = pixels.frame_stride(ft, 3).collect()
    assert {r.f for r in sampled} == {0, 3}
    wt = from_rows(
        spark,
        [(1, t, v) for t, v in enumerate((4, 5, 6, 8, 100, 0, 0, 1))],
        schema="id bigint, t int, v bigint",
    )
    dec = {r.u: r.v for r in pixels.decimate_wave(wt, 4).collect()}
    assert dec == {0: (4 + 5 + 6 + 8) // 4, 1: (100 + 0 + 0 + 1) // 4}


def test_pixel_checksum_is_position_sensitive(spark):
    # two images with the same multiset of values but swapped cells
    px = from_rows(
        spark,
        [(1, 0, 0, 0, 5), (1, 0, 0, 1, 9),
         (2, 0, 0, 0, 9), (2, 0, 0, 1, 5)],
        schema="id bigint, c int, y int, x int, v bigint",
    )
    out = {r.id: r.checksum
           for r in px.groupBy("id")
           .agg(pixels.pixel_checksum(2).alias("checksum")).collect()}
    assert out[1] != out[2]  # plain sum(v) could not tell them apart


def test_pixel_histogram_partitions_all_pixels(spark, ids):
    px = pixels.synth_pixel_table(ids, "doc_id")
    out = pixels.pixel_histogram(px, 16).collect()
    assert sum(r.n_px for r in out) == 4 * 3 * 64
    assert all(0 <= r.bin < 16 for r in out)


def test_frame_scene_cuts_thresholds(spark):
    # 3 frames x 2 px: flat -> flat (sad 0), flat -> jump (sad 400)
    rows = [(1, 0, 0, 10), (1, 0, 1, 10),
            (1, 1, 0, 10), (1, 1, 1, 10),
            (1, 2, 0, 210), (1, 2, 1, 210)]
    ft = from_rows(spark, rows,
                   schema="id bigint, f int, x int, v bigint")
    r = pixels.frame_scene_cuts(ft, sum_thr=300).first()
    assert (r.n_transitions, r.n_cuts) == (2, 1)


def test_peak_windows_flags_only_hot_windows(spark):
    rows = [(1, t, 100) for t in range(64)]
    rows[40] = (1, 40, 65500)  # one hot sample in window 1
    wt = from_rows(spark, rows, schema="id bigint, t int, v bigint")
    r = pixels.peak_windows(wt, win=32, thr=65000).first()
    assert (r.n_windows, r.n_peak) == (2, 1)


def test_decimate_cascade_divergence_bounded_by_one(spark, ids):
    wt = pixels.synth_wave_table(ids, n_samples=64)
    twice = pixels.decimate_wave(
        pixels.decimate_wave(wt, 2).withColumnRenamed("u", "t"), 2
    ).withColumnRenamed("v", "v2")
    once = pixels.decimate_wave(wt, 4).withColumnRenamed("v", "v4")
    j = twice.join(once, ["id", "u"]).collect()
    assert len(j) == 4 * 16
    # floor(floor((a+b)/2) + floor((c+d)/2)) / 2 differs from
    # floor((a+b+c+d)/4) by at most 1
    assert all(abs(r.v2 - r.v4) <= 1 for r in j)


# ---- r10 multimodal planning twins ----------------------------------------


def _meta(spark, rows):
    return from_rows(spark, rows, schema="id bigint, w int, h int, c int")


def _grp(spark, rows):
    return from_rows(spark, rows, schema="id bigint, source string")


def test_storage_shard_plan_ceil(spark):
    """Shard count is the integer ceil of total bytes over target:
    2 square 8x8x3 images = 384 bytes -> 1 shard at 256, 2 at 192."""
    m = _meta(spark, [(0, 8, 8, 3), (1, 8, 8, 3)])
    r = pixels.storage_shard_plan(m, target_bytes=256).collect()[0]
    assert (r.aspect_class, r.n_images, r.total_bytes, r.n_shards) == (
        "square", 2, 384, 2
    )
    assert r.mean_bytes == 192.0


def test_augment_grid_counts(spark):
    """16x16 at stride 8: a 16x16 image yields 1 crop, 24x32 yields
    2x3=6, an 8-tall image yields 0."""
    m = _meta(spark, [(0, 16, 16, 3), (1, 32, 24, 3), (2, 16, 8, 3)])
    g = _grp(spark, [(0, "s"), (1, "s"), (2, "s")])
    r = pixels.augment_grid_plan(m, g).collect()[0]
    assert (r.n_images, r.n_croppable, r.total_crops) == (3, 2, 7)


def test_batch_packing_division(spark):
    """8x8x3 = 192 bytes -> cap 85 at 16 KiB; 3 images = 0 full + 3
    remainder; capacity floors at 1 for oversized images."""
    m = _meta(
        spark,
        [(0, 8, 8, 3), (1, 8, 8, 3), (2, 8, 8, 3), (3, 64, 90, 3)],
    )
    rows = {(r.h, r.w): r for r in pixels.batch_packing_plan(m).collect()}
    r = rows[(8, 8)]
    assert (r.batch_cap, r.n_full_batches, r.n_remainder) == (85, 0, 3)
    big = rows[(90, 64)]  # 17280 bytes > budget -> cap clamps to 1
    assert (big.batch_cap, big.n_full_batches, big.n_remainder) == (1, 1, 0)


def test_video_frame_budget_cap_and_truncation(spark):
    """ceil(12/5)=3 sampled; ceil(60/5)=12 capped at 8 and flagged
    truncated."""
    vm = from_rows(
        spark, [(0, 12), (1, 60)], schema="id bigint, n_frames int"
    )
    g = _grp(spark, [(0, "s"), (1, "s")])
    r = pixels.video_frame_budget(vm, g).collect()[0]
    assert (r.n_videos, r.total_frames, r.total_sampled, r.n_truncated) == (
        2, 72, 11, 1
    )


def test_audio_window_budget_tail(spark):
    """400@160: 256 samples -> too short; 720 -> 3 windows tail 0;
    800 -> 3 windows tail 80."""
    am = from_rows(
        spark, [(0, 256), (1, 720), (2, 800)],
        schema="id bigint, n_samples int",
    )
    g = _grp(spark, [(0, "s"), (1, "s"), (2, "s")])
    r = pixels.audio_window_budget(am, g).collect()[0]
    assert (r.n_clips, r.n_too_short, r.total_windows) == (3, 1, 6)
    assert r.total_tail_samples == 256 + 0 + 80


def test_phash_radius_sweep_cumulative(spark):
    """Counts are cumulative in the radius, and identical hashes pair
    at radius 0."""
    rows = [(0, 5, 9), (1, 5, 9), (2, 5, 8)]  # 0,1 identical; 2 at hm 1
    h = from_rows(
        spark, rows, schema="id bigint, phash_hi bigint, phash_lo bigint"
    )
    got = {r.radius: r.n_pairs for r in pixels.phash_radius_sweep(
        h, radii=(0, 2, 4)
    ).collect()}
    assert got[0] == 1            # the identical pair
    assert got[2] == got[4] == 3  # all three pairs within hamming 1
    assert got[0] <= got[2] <= got[4]


def test_channel_snapshot_drift_exact(spark):
    """Hand pixels: channel 0 reads mean 10 on even ids, 20 on odd —
    drift exactly 10."""
    rows = [
        (0, 0, 0, 0, 10), (2, 0, 0, 0, 10),   # even half
        (1, 0, 0, 0, 20), (3, 0, 0, 0, 20),   # odd half
    ]
    px = from_rows(
        spark, rows, schema="id bigint, c int, y int, x int, v int"
    )
    r = pixels.channel_snapshot_drift(px).collect()[0]
    assert (r.n_px_a, r.n_px_b, r.sum_a, r.sum_b) == (2, 2, 20, 40)
    assert (r.mean_a, r.mean_b, r.mean_drift) == (10.0, 20.0, 10.0)

"""Approximate sketch operators (HLL distinct, approx quantiles) —
accuracy-band tests against exact answers; plus embedding
preprocessing (normalize / sign sketch)."""

import math

from pyspark.sql import functions as F

from fuel_spark.ops import multimodal, similarity
from fuel_spark.sources import from_rows, load_tables

SF = "/root/testdata/sf0.001"


def test_hll_distinct_within_tolerance(spark):
    e = load_tables(spark, SF)["events"]
    exact = e.select(F.count_distinct("user_id")).first()[0]
    approx = e.select(F.approx_count_distinct("user_id", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.05


def test_approx_percentile_close_to_exact(spark):
    e = load_tables(spark, SF)["events"]
    exact = e.select(F.percentile("value", 0.5)).first()[0]
    approx = e.select(F.percentile_approx("value", 0.5, 10000)).first()[0]
    assert math.isclose(exact, approx, rel_tol=0.02, abs_tol=1.0)


def test_l2_normalize_unit_norm(spark):
    df = from_rows(spark, [(0, [3.0, 4.0])], schema="vec_id bigint, embedding array<float>")
    r = similarity.l2_normalize(df).first()
    assert r.vec_norm == 5.0
    assert math.isclose(sum(x * x for x in r.unit), 1.0, abs_tol=1e-12)


def test_sign_sketch_blocks_similar_vectors(spark):
    df = from_rows(
        spark,
        [(0, [1.0, -1.0, 2.0]), (1, [0.5, -2.0, 0.1]), (2, [-1.0, 1.0, -1.0])],
        schema="vec_id bigint, embedding array<float>",
    )
    out = {r.vec_id: r.sign_bucket for r in
           similarity.sign_sketch(df, bits=3).collect()}
    assert out[0] == out[1]  # same orthant → same block
    assert out[0] != out[2]


def test_audio_features_deterministic(spark):
    df = from_rows(
        spark,
        [(0, bytearray(bytes(range(200)) * 3)), (1, bytearray(b""))],
        schema="item_id bigint, payload binary",
    )
    out = {r.item_id: r for r in
           multimodal.extract_audio_features(df, "item_id", "payload", frame=256).collect()}
    assert out[0].n_samples == 600
    assert len(out[0].rms) == 3  # ceil(600/256) frames
    assert out[1].n_samples == 0 and out[1].rms == [0]
    again = {r.item_id: r.rms for r in
             multimodal.extract_audio_features(df, "item_id", "payload", frame=256).collect()}
    assert again[0] == out[0].rms

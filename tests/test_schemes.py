"""Scheme determinism tests — mirrors reference tests/test_schemes.py
(exact request sequences) with distributed-planner semantics."""

from pyspark.sql import functions as F

from fuel_spark import schemes
from fuel_spark.sources import from_rows


def _keys(spark, n=20):
    return from_rows(spark, [(i,) for i in range(n)], schema="k bigint")


def test_sequential_positions(spark):
    out = schemes.sequential_batches(_keys(spark), "k", 6)
    rows = {r.k: (r.pos, r.batch_id) for r in out.collect()}
    assert rows[0] == (0, 0) and rows[5] == (5, 0) and rows[6] == (6, 1)
    assert rows[19] == (19, 3)


def test_shuffled_is_permutation_and_seeded(spark):
    df = _keys(spark)
    a = schemes.shuffled_batches(df, "k", 6, seed=1)
    b = schemes.shuffled_batches(df, "k", 6, seed=1)
    c = schemes.shuffled_batches(df, "k", 6, seed=2)
    pa = [r.k for r in a.orderBy("pos").collect()]
    pb = [r.k for r in b.orderBy("pos").collect()]
    pc = [r.k for r in c.orderBy("pos").collect()]
    assert sorted(pa) == list(range(20))
    assert pa == pb  # same seed → same permutation
    assert pa != pc  # different seed → different permutation
    assert pa != list(range(20))  # actually shuffled


def test_cross_validation_fold_sizes(spark):
    out = schemes.cross_validation_folds(_keys(spark, 23), "k", 5)
    sizes = {r.fold: r.cnt for r in
             out.groupBy("fold").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # 23 // 5 = 4 per fold, remainder 3 joins the last fold
    assert sizes == {0: 4, 1: 4, 2: 4, 3: 4, 4: 7}


def test_hash_folds_deterministic_partition(spark):
    df = _keys(spark, 100)
    a = schemes.hash_folds(df, "k", 4, seed=9)
    b = schemes.hash_folds(df.repartition(7), "k", 4, seed=9)
    ra = {r.k: r.fold for r in a.collect()}
    rb = {r.k: r.fold for r in b.collect()}
    assert ra == rb  # invariant under repartitioning
    assert set(ra.values()) == {0, 1, 2, 3}


def test_concatenated_offsets(spark):
    a = _keys(spark, 5)
    b = _keys(spark, 7)
    out = schemes.concatenated_batches([a, b], ["k", "k"], 4)
    rows = sorted((r["_stream"], r.pos, r.batch_id) for r in out.collect())
    # stream 0 occupies global positions 0-4, stream 1 positions 5-11
    assert rows[0] == (0, 0, 0)
    assert rows[5] == (1, 0, 1)  # global pos 5 → batch 1
    assert rows[-1] == (1, 6, 2)  # global pos 11 → batch 2


def test_partition_local_batches_no_global_sort(spark):
    df = _keys(spark, 100).repartition(4)
    out = schemes.partition_local_batches(df, 10)
    sizes = [r.cnt for r in
             out.groupBy("batch_id").agg(F.count(F.lit(1)).alias("cnt")).collect()]
    assert sum(sizes) == 100
    assert max(sizes) <= 10


def test_stratified_sample_rates_and_determinism(spark):
    rows = [(i, "en" if i % 2 == 0 else "fr") for i in range(400)]
    df = from_rows(spark, rows, schema="k bigint, lang string")
    out = schemes.stratified_sample(
        df, "lang", {"en": 1.0, "fr": 0.0}, key="k", seed=3
    )
    got = [(r.k, r.lang) for r in out.collect()]
    assert len(got) == 200 and all(l == "en" for _, l in got)
    # partial fractions land near target and repeat exactly
    out2 = schemes.stratified_sample(df, "lang", {"en": 0.5}, key="k", seed=3)
    n = out2.count()
    assert 60 <= n <= 140  # 200 * 0.5 ± slack
    assert out2.count() == n


def test_temperature_weights_alpha_one_is_proportional(spark):
    rows = [(i, "a" if i < 90 else "b") for i in range(100)]
    df = from_rows(spark, rows, schema="k bigint, g string")
    w = {r.g: (r.weight, r.sample_rate) for r in
         schemes.temperature_weights(df, "g", alpha=1.0).collect()}
    assert abs(w["a"][0] - 0.9) < 1e-6 and abs(w["b"][0] - 0.1) < 1e-6
    # alpha=1 → per-row keep rate identical across groups
    assert w["a"][1] == 1.0 and w["b"][1] == 1.0


def test_temperature_weights_flattens_head(spark):
    rows = [(i, "big" if i < 180 else "small") for i in range(200)]
    df = from_rows(spark, rows, schema="k bigint, g string")
    w = {r.g: r.weight for r in
         schemes.temperature_weights(df, "g", alpha=0.5).collect()}
    # sqrt flattening: big keeps majority but far below its 0.9 share
    assert 0.5 < w["big"] < 0.9
    rates = {r.g: r.sample_rate for r in
             schemes.temperature_weights(df, "g", alpha=0.5).collect()}
    # the smallest group is never downsampled
    assert rates["small"] == 1.0 and rates["big"] < 1.0


def test_apply_mixture_sample_keeps_all_of_smallest(spark):
    rows = [(i, "big" if i < 180 else "small") for i in range(200)]
    df = from_rows(spark, rows, schema="k bigint, g string")
    out = schemes.apply_mixture_sample(df, "g", key="k", alpha=0.5, seed=5)
    by_g = {r.g: r.cnt for r in
            out.groupBy("g").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert by_g["small"] == 20  # rate 1.0 → everything kept
    assert 0 < by_g["big"] < 180


def test_weighted_sample_deterministic_and_weighted(spark):
    """Efraimidis–Spirakis: same (seed, key) → same winners on any
    run; a dominant weight wins its place; n rows come back."""
    from fuel_spark.schemes import weighted_sample

    rows = [(i, 1.0 if i != 7 else 1e9) for i in range(100)]
    df = from_rows(spark, rows, schema="k bigint, w double")
    s1 = [r.k for r in weighted_sample(df, "k", "w", n=10).collect()]
    s2 = [r.k for r in weighted_sample(df, "k", "w", n=10).collect()]
    assert s1 == s2 and len(s1) == 10
    assert 7 in s1  # weight 1e9 ⇒ es_key ≈ 0, the global max
    s3 = [r.k for r in weighted_sample(df, "k", "w", n=10, seed=7).collect()]
    assert s3 != s1  # a different seed redraws


def test_curriculum_batches_easy_to_hard(spark):
    from fuel_spark.schemes import curriculum_batches

    rows = [(i, float((i * 37) % 100)) for i in range(60)]
    df = from_rows(spark, rows, schema="k bigint, difficulty double")
    out = curriculum_batches(df, "k", "difficulty", batch_size=10).collect()
    by_pos = sorted(out, key=lambda r: r.pos)
    diffs = [r.difficulty for r in by_pos]
    assert diffs == sorted(diffs)                    # monotone ramp
    assert [r.pos for r in by_pos] == list(range(60))
    assert {r.batch_id for r in by_pos} == set(range(6))
    # deterministic under re-run
    again = sorted(curriculum_batches(df, "k", "difficulty", 10).collect(),
                   key=lambda r: r.pos)
    assert [r.k for r in again] == [r.k for r in by_pos]


def test_interleave_sources_smooth_ratio(spark):
    """70/30 interleave: within any prefix of the global order the
    source mix tracks the weights (no clumping), and per-source
    relative order is preserved."""
    from fuel_spark.schemes import interleave_sources

    rows = [(i, "a") for i in range(70)] + [(100 + i, "b") for i in range(30)]
    df = from_rows(spark, rows, schema="k bigint, src string")
    out = sorted(
        interleave_sources(df, "k", "src", {"a": 0.7, "b": 0.3}).collect(),
        key=lambda r: r.global_pos,
    )
    assert len(out) == 100
    assert [r.global_pos for r in out] == list(range(100))
    # prefix mix stays near 70/30 at every decile
    for cut in range(10, 101, 10):
        n_a = sum(1 for r in out[:cut] if r.src == "a")
        assert abs(n_a / cut - 0.7) <= 0.15, (cut, n_a)
    # per-source src_pos increases along the global order
    for s in ("a", "b"):
        poss = [r.src_pos for r in out if r.src == s]
        assert poss == sorted(poss)
    # unweighted sources are dropped
    extra = from_rows(spark, rows + [(999, "c")], schema="k bigint, src string")
    out2 = interleave_sources(extra, "k", "src", {"a": 0.7, "b": 0.3})
    assert out2.where("src = 'c'").count() == 0


def test_weighted_sample_plans_takeordered(spark):
    """Global top-n must plan as TakeOrdered (per-partition heaps) —
    never a single-partition global sort."""
    from fuel_spark.schemes import weighted_sample

    df = from_rows(spark, [(i, float(i % 7 + 1)) for i in range(100)],
                   schema="k bigint, w double")
    p = weighted_sample(df, "k", "w", n=10)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrdered" in p
    assert "Exchange SinglePartition" not in p


# ---------------------------------------------------------------------------
# round 9: training-order certificates
# ---------------------------------------------------------------------------


def test_epoch_overlap_same_seed_reads_degenerate(spark):
    """Identical seeds = identical order: overlap 100%, displacement
    0 — the broken-epoch-seed signature the certificate exists to
    catch."""
    df = from_rows(spark, [(i,) for i in range(100)], schema="k bigint")
    r = schemes.epoch_overlap_certificate(df, "k", (7, 7), 10).first()
    assert (r.n, r.k, r.n_overlap) == (100, 10, 10)
    assert r.overlap_rate == 1.0 and r.mean_abs_disp == 0.0
    # different seeds decorrelate: overlap near k/n, displacement > 0
    r2 = schemes.epoch_overlap_certificate(df, "k", (7, 8), 10).first()
    assert r2.n_overlap < 10 and r2.mean_abs_disp > 0.0
    assert r2.expected_rate == 0.1


def test_position_decorrelation_bounds(spark):
    df = from_rows(spark, [(i,) for i in range(200)], schema="k bigint")
    r = schemes.position_decorrelation(df, "k", 7).first()
    assert r.n == 200
    assert -1.0 <= r.rho <= 1.0
    # a seeded md5 shuffle of 200 ids decorrelates hard
    assert abs(r.rho) < 0.5
    # rho is exactly 1 - 6S/(n(n^2-1)) over the integer sum
    expect = round(1 - (6.0 * r.sum_d2) / (200.0 * (200.0 * 200.0 - 1)), 6)
    assert r.rho == expect


def test_batch_mix_histogram_counts_batches(spark):
    rows = [(i, "s%d" % (i % 4)) for i in range(80)]
    df = from_rows(spark, rows, schema="k bigint, src string")
    out = schemes.batch_mix_histogram(df, "k", "src", 20, 7).collect()
    assert sum(r.n_batches for r in out) == 4  # 80/20 batches
    # every batch of 20 over 4 interleaved sources holds all 4
    assert all(1 <= r.n_distinct_groups <= 4 for r in out)


def test_stride_coverage_shares_sum_to_one(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(90)]
    df = from_rows(spark, rows, schema="k bigint, src string")
    out = schemes.stride_coverage(df, "k", "src", 5, 7).collect()
    assert sum(r.n_sampled for r in out) == 18  # ceil coverage of 90/5
    assert abs(sum(r.share_sampled for r in out) - 1.0) < 1e-6
    assert abs(sum(r.corpus_share for r in out) - 1.0) < 1e-6


def test_epoch_batch_churn_partitions_corpus(spark):
    df = from_rows(spark, [(i,) for i in range(100)], schema="k bigint")
    out = schemes.epoch_batch_churn(df, "k", 10, (7, 8)).collect()
    assert sum(r.n_examples for r in out) == 100
    assert {r.churn_bucket for r in out} <= {"0", "1-3", "4-10", ">10"}


def test_worker_token_balance_weights_and_skew(spark):
    rows = [(i, 10) for i in range(40)]
    df = from_rows(spark, rows, schema="k bigint, w bigint")
    out = schemes.worker_token_balance(df, "k", F.col("w"), 4, 5).collect()
    assert sum(r.weight for r in out) == 400
    assert sum(r.n_rows for r in out) == 40
    # skew is worker/mean: the weighted mean of skew over workers is 1
    assert abs(sum(r.skew for r in out) / len(out) - 1.0) < 0.5


def test_interleave_proportionality_within_one_of_target(spark):
    rows = [(i, "src%d" % (i % 2)) for i in range(200)]
    df = from_rows(spark, rows, schema="k bigint, source string")
    out = schemes.interleave_prefix_proportionality(
        df, "k", "source", {"src0": 0.5, "src1": 0.5}, (10, 50), 42
    ).collect()
    # smooth weighted round-robin: every prefix within 1 of target
    assert all(r.abs_dev <= 1.0 for r in out)
    assert {r.prefix for r in out} == {10, 50}


def test_curriculum_stability_contrast(spark):
    rows = [(i, i * 3 % 97) for i in range(100)]  # distinct difficulties
    df = from_rows(spark, rows, schema="k bigint, diff bigint")
    out = {r.regime: r for r in schemes.curriculum_stability_certificate(
        df, "k", "diff", (7, 8), 10).collect()}
    # distinct difficulties pin the curriculum order entirely: the
    # tie-break seed cannot move anything
    assert out["curriculum"].overlap_rate == 1.0
    assert out["shuffled"].overlap_rate < 0.8


def test_resume_tail_mix_covers_half(spark):
    rows = [(i, "s%d" % (i % 2)) for i in range(100)]
    df = from_rows(spark, rows, schema="k bigint, src string")
    out = schemes.resume_tail_mix(df, "k", "src", 7).collect()
    assert sum(r.n_remaining for r in out) == 50
    assert abs(sum(r.share_remaining for r in out) - 1.0) < 1e-6

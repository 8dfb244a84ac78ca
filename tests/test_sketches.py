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


def _toy_vectors(spark, n=120, d=16, seed=3):
    import random

    rng = random.Random(seed)
    rows = [(i, [rng.gauss(0, 1) for _ in range(d)]) for i in range(n)]
    return from_rows(
        spark, rows, schema="vec_id bigint, embedding array<float>"
    )


def test_pq_encode_shape_and_determinism(spark):
    e = _toy_vectors(spark)
    books = similarity.pq_fit(e, m=4, k_codes=8, sample_n=64, seed=11, iters=8)
    assert len(books) == 4 and len(books[0]) == 8 and len(books[0][0]) == 4
    enc = similarity.pq_encode(e, books)
    rows = {r.vec_id: r for r in enc.collect()}
    assert all(len(r.pq_codes) == 4 for r in rows.values())
    assert all(0 <= c < 8 for r in rows.values() for c in r.pq_codes)
    assert all(r.recon_norm >= 0 for r in rows.values())
    # same fit inputs → identical codebooks → identical codes
    books2 = similarity.pq_fit(e, m=4, k_codes=8, sample_n=64, seed=11, iters=8)
    assert books2 == books
    again = {r.vec_id: list(r.pq_codes) for r in
             similarity.pq_encode(e, books2).collect()}
    assert again == {k: list(v.pq_codes) for k, v in rows.items()}


def test_pq_recon_norm_matches_codebooks(spark):
    import math as m_

    e = _toy_vectors(spark, n=40, d=8)
    books = similarity.pq_fit(e, m=2, k_codes=4, sample_n=40, seed=5, iters=8)
    r = similarity.pq_encode(e, books).first()
    want = m_.sqrt(sum(
        sum(v * v for v in books[i][code])
        for i, code in enumerate(r.pq_codes)
    ))
    assert m_.isclose(r.recon_norm, want, rel_tol=1e-9)


def test_pq_ann_rerank_recall(spark):
    e = _toy_vectors(spark, n=150, d=16)
    q = e.where(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id) for r in
             similarity.cosine_topk(e, q, k=5).collect()}
    books = similarity.pq_fit(e, m=8, k_codes=16, sample_n=150, seed=9, iters=10)
    got = similarity.pq_ann(e, q, k=5, codebooks=books, rerank=30)
    pairs = {(r.query_id, r.neighbor_id) for r in got.collect()}
    recall = len(exact & pairs) / len(exact)
    # lossy codes bound the shortlist; exact rerank restores recall
    assert recall >= 0.8
    # rerank output scores are exact cosines: spot-check one pair
    row = got.first()
    vecs = {r.vec_id: list(r.embedding) for r in e.collect()}
    a, b = vecs[row.query_id], vecs[row.neighbor_id]
    dot = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(x * x for x in b) ** 0.5
    assert abs(row.score - round(dot / (na * nb), 6)) < 1e-4


def test_pq_ann_adc_only_ranks_by_lut(spark):
    e = _toy_vectors(spark, n=60, d=8)
    q = e.where(F.col("vec_id") == 0)
    books = similarity.pq_fit(e, m=2, k_codes=4, sample_n=60, seed=2, iters=8)
    out = similarity.pq_ann(e, q, k=3, codebooks=books, rerank=0).collect()
    assert len(out) == 3
    assert [r.rank for r in out] == [1, 2, 3]
    assert out[0].score >= out[1].score >= out[2].score


def test_matryoshka_truncate_unit_prefix(spark):
    df = from_rows(
        spark,
        [(0, [3.0, 4.0, 100.0, -50.0])],
        schema="vec_id bigint, embedding array<float>",
    )
    r = similarity.matryoshka_truncate(df, dims=2).first()
    # prefix [3,4] renormalized -> [0.6, 0.8]; tail ignored
    assert len(r.mrl) == 2
    assert math.isclose(r.mrl[0], 0.6, abs_tol=1e-9)
    assert math.isclose(r.mrl[1], 0.8, abs_tol=1e-9)
    assert math.isclose(sum(x * x for x in r.mrl), 1.0, abs_tol=1e-12)


def test_matryoshka_ann_full_shortlist_is_exact(spark):
    """With shortlist >= corpus the cascade must equal the exact
    brute-force ranking: the coarse stage orders candidates but drops
    nothing, and the rerank is the exact full-dim cosine."""
    e = load_tables(spark, SF)["embeddings"]
    q = e.where(F.col("vec_id") < 3)
    n = e.count()
    exact = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in similarity.cosine_topk(e, q, k=5).collect()
    }
    casc = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in similarity.matryoshka_ann(
            e, q, dims=16, shortlist=n, k=5
        ).collect()
    }
    assert casc == exact


def test_matryoshka_ann_cascade_recall(spark):
    """Recall certification for the cascade.  The synthetic
    embeddings are random (NOT MRL-trained, so prefixes carry only
    dims/D of the signal instead of the paper's front-loaded
    majority); measured recall@5 here is 0.36 at dims=16/short=25 and
    0.68 at dims=32/short=50 — the monotone dims/shortlist scaling the
    cascade promises.  Certify the 32/50 point with margin."""
    e = load_tables(spark, SF)["embeddings"]
    q = e.where(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(e, q, k=5).collect()
    }
    casc = {
        (r.query_id, r.neighbor_id)
        for r in similarity.matryoshka_ann(
            e, q, dims=32, shortlist=50, k=5
        ).collect()
    }
    assert len(casc & exact) / len(exact) >= 0.6


def test_mmr_diversify_picks_diverse_over_redundant(spark):
    """Query q: candidates a1,a2 nearly identical (high relevance),
    b orthogonal-ish (lower relevance).  Plain top-2 = {a1, a2}; MMR
    at λ=0.3 (diversity-heavy) must swap the redundant twin for b:
    the twin's ~0.999 similarity penalty outweighs b's relevance
    deficit at this λ, and hand-arithmetic confirms the margin."""
    rows = [
        (0, [1.0, 0.0]),          # query
        (1, [0.99, 0.14]),        # a1
        (2, [0.995, 0.1]),        # a2 ≈ a1
        (3, [0.6, 0.8]),          # b: diverse, lower relevance
    ]
    df = from_rows(spark, rows, schema="vec_id bigint, embedding array<float>")
    q = df.where(F.col("vec_id") == 0)
    short = similarity.cosine_topk(df, q, k=3)
    plain = [r.neighbor_id for r in sorted(
        short.collect(), key=lambda r: r.rank)][:2]
    mmr = [r.neighbor_id for r in sorted(
        similarity.mmr_diversify(short, df, k=2, lam=0.3).collect(),
        key=lambda r: r.rank)]
    assert set(plain) == {1, 2}
    assert mmr[0] in (1, 2) and mmr[1] == 3
    # deterministic
    again = [r.neighbor_id for r in sorted(
        similarity.mmr_diversify(short, df, k=2, lam=0.3).collect(),
        key=lambda r: r.rank)]
    assert again == mmr


def test_mmr_fixed_matches_pandas_tier(spark):
    """The unrolled k=5 DataFrame MMR and the pandas greedy implement
    the SAME selection rule, so on the registry shortlist their pick
    sequences must agree exactly (query, neighbor, rank) — the parity
    pin that lets the fixed tier certify the general tier."""
    e = load_tables(spark, SF)["embeddings"]
    q = e.where(F.col("vec_id") < 5)
    short = similarity.cosine_topk(e, q, k=20)
    fixed = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in similarity.mmr_diversify_fixed(short, e, k=5).collect()
    }
    pandas_tier = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in similarity.mmr_diversify(short, e, k=5).collect()
    }
    assert fixed == pandas_tier


def test_mmr_fixed_first_pick_is_max_relevance_and_diversifies(spark):
    """Step 1 is pure argmax relevance; at diversity-heavy λ the
    redundant twin must be displaced — same scenario as the pandas
    tier's test, run through the unrolled path."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.99, 0.14]),
        (2, [0.995, 0.1]),
        (3, [0.6, 0.8]),
    ]
    df = from_rows(spark, rows, schema="vec_id bigint, embedding array<float>")
    q = df.where(F.col("vec_id") == 0)
    short = similarity.cosine_topk(df, q, k=3)
    got = sorted(
        similarity.mmr_diversify_fixed(short, df, k=2, lam=0.3).collect(),
        key=lambda r: r.rank,
    )
    top1 = max(short.collect(), key=lambda r: (r.cosine, -r.neighbor_id))
    assert got[0].neighbor_id == top1.neighbor_id
    assert got[1].neighbor_id == 3


# ---------------------------------------------------------------------------
# r7: mergeable sketch family (fuel_spark.ops.sketch)
# ---------------------------------------------------------------------------

from fuel_spark.ops import sketch


def _kv(spark, n=400):
    # distinct values (the +i*1e-4 tiebreaker): with duplicated values
    # count(v <= est) jumps by the multiplicity and the 1/n exactness
    # bound below would not apply
    rows = [(i, float((i * 37) % 101) + i * 1e-4) for i in range(n)]
    return from_rows(spark, rows, schema="k bigint, v double")


def test_quantile_sketch_full_sample_is_exact(spark):
    """sample_mod=1 keeps every row, so the estimator degenerates to
    the exact order statistic: frac_err is bounded by 1/n."""
    df = _kv(spark)
    out = sketch.quantile_sketch(
        df, "k", "v", probs=(0.5, 0.9), sample_mod=1
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r.sample_n == 400
        assert r.frac_err <= 1.0 / 400 + 1e-9
        assert r.within_eps


def test_quantile_sketch_certificate_true_rank_is_exact(spark):
    """true_rank must equal the exact count(v <= est) over the FULL
    frame, not the sample."""
    df = _kv(spark)
    out = sketch.quantile_sketch(df, "k", "v", probs=(0.5,), sample_mod=4)
    r = out.first()
    vals = [row.v for row in df.collect()]
    assert r.true_rank == sum(1 for v in vals if v <= r.est_value)
    assert r.n_rows == len(vals)


def test_quantile_sketch_partitioning_invariant(spark):
    df = _kv(spark)
    a = sketch.quantile_sketch(df.repartition(2), "k", "v").collect()
    b = sketch.quantile_sketch(df.repartition(11), "k", "v").collect()
    key = lambda r: (r.prob,)
    assert sorted([(r.prob, r.est_value) for r in a]) == sorted(
        [(r.prob, r.est_value) for r in b]
    )


def test_quantile_merge_certificate_matches(spark):
    df = _kv(spark)
    out = sketch.quantile_sketch_merge_certificate(
        df, "k", "v", split_col=F.col("k") % 2 == 0
    ).collect()
    assert len(out) == 2 and all(r.match for r in out)


def test_cms_never_underestimates(spark):
    rows = [(i % 17,) for i in range(500)] + [(99,)] * 60
    df = from_rows(spark, rows, schema="k bigint")
    cells = sketch.cms_build(df, "k", depth=3, width=64)
    keys = df.select("k").distinct()
    est = {r.k: r.est_cnt for r in
           sketch.cms_estimate(cells, keys, "k", depth=3, width=64).collect()}
    true = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    for k, t in true.items():
        assert est[k] >= t
    # the heavy key's estimate is tight (few collisions at this load)
    assert est[99] - true[99] <= 500


def test_cms_merge_certificate_zero_mismatch(spark):
    df = from_rows(spark, [(i % 23,) for i in range(300)], schema="k bigint")
    out = sketch.cms_merge_certificate(
        df, "k", split_col=F.col("k") % 2 == 0, depth=3, width=64
    ).collect()
    assert len(out) == 3 and all(r.n_mismatch == 0 for r in out)


def test_bloom_no_false_negatives_and_low_fpr(spark):
    members = from_rows(spark, [(i,) for i in range(300)], schema="k bigint")
    bloom = sketch.bloom_build(members, "k", m_bits=4096, k_hashes=3)
    cands = from_rows(
        spark, [(i,) for i in range(600)], schema="k bigint"
    )
    hits = {r.k: r.bloom_hit for r in
            sketch.bloom_screen(cands, bloom, "k", 4096, 3).collect()}
    assert all(hits[i] for i in range(300))          # no false negatives
    fp = sum(1 for i in range(300, 600) if hits[i])
    assert fp <= 30                                   # fpr well under 10%


def test_bloom_planner_textbook_sizes(spark):
    df = from_rows(spark, [("a", i) for i in range(1000)],
                   schema="g string, k bigint")
    r = sketch.bloom_size_planner(df, "g", "k", target_fpr=0.01).first()
    assert r.n_keys == 1000
    # textbook: ~9.585 bits/key and k≈7 at p=0.01
    assert 9000 <= r.m_bits <= 10200
    assert r.k_hashes in (6, 7)


def test_linear_count_close_and_exact_side_exact(spark):
    rows = [("t", i % 200) for i in range(2000)]
    df = from_rows(spark, rows, schema="g string, k bigint")
    r = sketch.linear_count_distinct(df, "g", "k", m=1024).first()
    assert r.exact_distinct == 200
    assert r.rel_err < 0.1


def test_reservoir_exact_n_and_partitioning_invariant(spark):
    df = from_rows(spark, [(i,) for i in range(1000)], schema="k bigint")
    a = sorted(r.k for r in
               sketch.reservoir_sample(df.repartition(3), "k", 50).collect())
    b = sorted(r.k for r in
               sketch.reservoir_sample(df.repartition(13), "k", 50).collect())
    assert len(a) == 50 and a == b


def test_reservoir_by_group_caps_per_group(spark):
    rows = [("g%d" % (i % 4), i) for i in range(400)]
    df = from_rows(spark, rows, schema="g string, k bigint")
    out = sketch.reservoir_by_group(df, "g", "k", n=7).collect()
    from collections import Counter

    c = Counter(r.g for r in out)
    assert set(c.values()) == {7} and len(c) == 4
    assert all(1 <= r.rank <= 7 for r in out)


def test_stratified_summary_counts_recompute(spark):
    d = load_tables(spark, SF)["documents"]
    out = {r.source: r for r in
           sketch.stratified_sample_summary(d, "source", "doc_id", 0.2).collect()}
    totals = {r.source: r["count"] for r in d.groupBy("source").count().collect()}
    assert {s: r.n_total for s, r in out.items()} == totals
    for r in out.values():
        assert 0 <= r.n_kept <= r.n_total
        assert abs(r.rate - r.n_kept / r.n_total) < 1e-9


def test_split_assigns_every_row_and_is_stable(spark):
    d = load_tables(spark, SF)["documents"]
    out = sketch.train_val_test_split(d, "doc_id")
    n = d.count()
    by = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(by.values()) == n
    assert by.get("train", 0) > by.get("val", 0)
    # same doc -> same split on a different partitioning
    a = {r.doc_id: r.split for r in out.select("doc_id", "split").collect()}
    b = {r.doc_id: r.split for r in
         sketch.train_val_test_split(d.repartition(7), "doc_id")
         .select("doc_id", "split").collect()}
    assert a == b


def test_kll_rank_error_envelope_across_partitionings(spark):
    rows = [(float((i * 997) % 5000),) for i in range(20000)]
    df = from_rows(spark, rows, schema="v double")
    vals = sorted(r.v for r in df.collect())
    n = len(vals)
    for parts in (2, 16):
        out = sketch.kll_quantiles(
            df.repartition(parts), "v", probs=(0.25, 0.5, 0.9), k=128
        ).collect()
        assert all(r.total_weight == n for r in out)
        for r in out:
            true_rank = sum(1 for v in vals if v <= r.est_value)
            assert abs(true_rank / n - r.prob) < 0.05, (parts, r)


def test_hll_close_and_exact_side_exact(spark):
    rows = [("g", (i * 7) % 1500) for i in range(6000)]
    df = from_rows(spark, rows, schema="g string, k bigint")
    r = sketch.hll_distinct(df, "g", "k", m=256).first()
    assert r.exact_distinct == 1500
    assert r.n_registers_set <= 256
    assert r.rel_err < 0.15


def test_cms_topk_screen_is_superset_of_true_heavies(spark):
    rows = [(i % 40,) for i in range(800)] + [(777,)] * 100
    df = from_rows(spark, rows, schema="k bigint")
    out = sketch.cms_topk_screen(df, "k", threshold=50, width=64).collect()
    short = {r.k for r in out}
    # every true-heavy key is in the shortlist (CMS never underestimates)
    assert 777 in short
    for r in out:
        assert r.est_cnt >= r.true_cnt
        assert r.est_cnt >= 50


def test_hll_merge_certificate_zero_mismatch(spark):
    rows = [("g%d" % (i % 3), i % 500) for i in range(3000)]
    df = from_rows(spark, rows, schema="g string, k bigint")
    out = sketch.hll_merge_certificate(
        df, "g", "k", split_col=F.col("k") % 2 == 0
    ).collect()
    assert len(out) == 3 and all(r.n_mismatch == 0 for r in out)


def test_weighted_sample_by_group_prefers_heavy(spark):
    # one overwhelming weight per group must always be sampled
    rows = [("a", 0, 1_000_000)] + [("a", i, 1) for i in range(1, 200)]
    rows += [("b", 1000 + i, 10) for i in range(100)]
    df = from_rows(spark, rows, schema="g string, k bigint, w bigint")
    out = sketch.weighted_sample_by_group(df, "g", "k", "w", n=3).collect()
    got_a = {r.k for r in out if r.g == "a"}
    assert 0 in got_a                       # the heavy key wins a slot
    from collections import Counter

    c = Counter(r.g for r in out)
    assert c == {"a": 3, "b": 3}
    assert all(1 <= r.rank <= 3 for r in out)


def test_heavy_hitters_batch_exact_and_capped(spark):
    rows = [(i % 30,) for i in range(600)] + [(7,)] * 50
    df = from_rows(spark, rows, schema="k bigint")
    out = sketch.heavy_hitters_batch(df, "k", k=4, num_shards=4).collect()
    from collections import Counter

    per_shard = Counter(r.shard for r in out)
    assert all(v <= 4 for v in per_shard.values())
    true = Counter(k for (k,) in rows)
    for r in out:
        assert r.cnt == true[r.k]            # exact counts, not bounds
    # key 7 (70 occurrences, the global heavy) tops its shard
    top7 = [r for r in out if r.k == 7]
    assert top7 and top7[0].rank == 1


def test_kmv_sketch_keeps_true_bottom_k_and_is_partitioning_invariant(spark):
    rows = [("g", i) for i in range(500)]
    df = from_rows(spark, rows, schema="g string, k bigint")
    sk = sketch.kmv_sketch(df, "g", "k", k=16).collect()
    assert len(sk) == 16
    assert [r.rank for r in sorted(sk, key=lambda r: r._h)] == list(range(1, 17))
    # the two-stage bottom-k must equal the true global bottom-k
    from fuel_spark.functions import hash_uniform

    all_h = df.select("k", hash_uniform("kmv7", F.col("k")).alias("h")).collect()
    true_bottom = {r.k for r in sorted(all_h, key=lambda r: (r.h, r.k))[:16]}
    assert {r.k for r in sk} == true_bottom
    # partitioning-invariant (deterministic hash, not rand())
    sk8 = sketch.kmv_sketch(df.repartition(8), "g", "k", k=16).collect()
    assert {(r.k, r.rank) for r in sk8} == {(r.k, r.rank) for r in sk}


def test_kmv_certificate_exact_path_and_estimation_band(spark):
    rows = [("small", i) for i in range(10)] + [("big", i) for i in range(2000)]
    df = from_rows(spark, rows, schema="g string, k bigint")
    out = {r.g: r for r in sketch.kmv_distinct_certificate(df, "g", "k", k=32).collect()}
    assert out["small"].est_distinct == 10.0          # exact path below k
    assert out["small"].theta == 2.0 and out["small"].rel_err == 0.0
    assert out["big"].n_sketch == 32
    assert out["big"].rel_err < 0.5                   # (k-1)/h_k band at k=32


def test_theta_set_ops_exact_when_sketch_holds_sets(spark):
    rows = [("a", i) for i in range(20)] + [("b", i) for i in range(10, 30)]
    df = from_rows(spark, rows, schema="g string, k bigint")
    out = sketch.theta_set_ops_certificate(df, "g", "k", [("a", "b")], k=32)
    got = {r.set_op: r for r in out.collect()}
    # both sets fit in the sketch: every estimate must equal the exact
    assert got["union"].est == 30.0 and got["union"].exact == 30
    assert got["intersection"].est == 10.0 and got["intersection"].exact == 10
    assert got["a_not_b"].est == 10.0 and got["a_not_b"].exact == 10
    assert all(r.theta == 2.0 for r in got.values())


def test_theta_set_ops_estimation_band_when_truncated(spark):
    rows = [("a", i) for i in range(3000)] + [("b", i) for i in range(1500, 4500)]
    df = from_rows(spark, rows, schema="g string, k bigint")
    out = sketch.theta_set_ops_certificate(df, "g", "k", [("a", "b")], k=64)
    got = {r.set_op: r for r in out.collect()}
    assert all(r.theta < 1.0 for r in got.values())
    for op, true in (("union", 4500), ("intersection", 1500), ("a_not_b", 1500)):
        assert got[op].exact == true
        assert abs(got[op].est - true) / true < 0.6   # k=64 envelope


def test_rp_distortion_concentrates_near_one_and_is_deterministic(spark):
    e = load_tables(spark, SF)["embeddings"]
    out = similarity.rp_distortion_certificate(e, dims=64, planes=16)
    rows = out.collect()
    assert len(rows) == 250                    # 500 vectors, adjacent pairs
    ds = [r.distortion for r in rows]
    mean = sum(ds) / len(ds)
    assert 0.7 < mean < 1.3                    # E[proj_d2/k] = orig_d2
    assert all(r.orig_d2 > 0 for r in rows)
    # deterministic literals: partitioning must not change a single row
    again = {r.pair_id: r.distortion
             for r in similarity.rp_distortion_certificate(
                 e.repartition(7), dims=64, planes=16).collect()}
    assert all(again[r.pair_id] == r.distortion for r in rows)


def test_rp_sign_matrix_is_balanced_and_stable(spark):
    m = similarity.rp_sign_matrix(64, 16)
    assert len(m) == 16 and all(len(r) == 64 for r in m)
    assert all(v in (-1, 1) for r in m for v in r)
    flat = [v for r in m for v in r]
    assert abs(sum(flat)) < len(flat) * 0.2    # roughly balanced signs
    assert m == similarity.rp_sign_matrix(64, 16)


def test_priority_sample_exact_path_and_estimation_band(spark):
    rows = [("small", i, 10.0) for i in range(10)]
    rows += [("big", i, float(1 + i % 100)) for i in range(3000)]
    df = from_rows(spark, rows, schema="g string, k bigint, w double")
    out = {r.g: r for r in sketch.priority_sample_certificate(
        df, "g", "k", "w", k=32).collect()}
    assert out["small"].tau == 0.0
    assert out["small"].est_total == 100.0 == out["small"].exact_total
    assert out["small"].rel_err == 0.0
    big = out["big"]
    assert big.n_sample == 32 and big.tau > 0.0
    assert big.exact_total == 3000 * 50.5
    assert big.rel_err < 0.5          # k=32 subset-sum envelope
    # partitioning-invariant (md5 draws, not rand())
    again = {r.g: r.est_total for r in sketch.priority_sample_certificate(
        df.repartition(9), "g", "k", "w", k=32).collect()}
    assert again == {g: r.est_total for g, r in out.items()}


def test_priority_sample_heavy_item_always_sampled_exactly(spark):
    # one item carries 99% of the weight: priority sampling MUST keep
    # it (q = w/u >= w) and its estimate contribution is its true w
    # (w > tau), the property uniform sampling lacks
    rows = [("g", 0, 1_000_000.0)] + [("g", i, 1.0) for i in range(1, 500)]
    df = from_rows(spark, rows, schema="g string, k bigint, w double")
    r = sketch.priority_sample_certificate(df, "g", "k", "w", k=16).collect()[0]
    assert r.rel_err < 0.2            # the heavy item anchors the estimate
    assert r.est_total >= 1_000_000.0


def test_rbo_certificate_identity_order_and_misorder(spark):
    # identical rankings -> rbo = sum of all suffix weights at m=rank
    e = from_rows(
        spark,
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        schema="query_id bigint, neighbor_id bigint, rank bigint",
    )
    w = similarity.rbo_suffix_weights(3, 0.9)
    ident = similarity.rbo_certificate(e, e, k=3, p=0.9).collect()[0]
    assert ident.n_common == 3
    assert ident.rbo == round(w[1] + w[2] + w[3], 6)
    # same ids, reversed order: every pair's worse rank is >= its
    # identity rank, so rbo must drop strictly below the identity score
    rev = from_rows(
        spark,
        [(1, 12, 1), (1, 11, 2), (1, 10, 3)],
        schema="query_id bigint, neighbor_id bigint, rank bigint",
    )
    swapped = similarity.rbo_certificate(e, rev, k=3, p=0.9).collect()[0]
    assert swapped.n_common == 3
    assert swapped.rbo < ident.rbo
    # disjoint lists -> 0.0, query still present
    other = from_rows(
        spark,
        [(1, 99, 1)],
        schema="query_id bigint, neighbor_id bigint, rank bigint",
    )
    gone = similarity.rbo_certificate(e, other, k=3, p=0.9).collect()[0]
    assert gone.n_common == 0 and gone.rbo == 0.0


# ---- r10 sketch round-out --------------------------------------------------


def test_hll_intersection_exact_and_ie(spark):
    """Inclusion-exclusion on planted overlap: groups a={1..40},
    b={21..60} share 20 keys; the exact certificate reads 20 and the
    register-based estimates satisfy est_int = est_a+est_b-est_u."""
    from fuel_spark.sources import from_rows

    rows = [("a", i) for i in range(1, 41)] + [
        ("b", i) for i in range(21, 61)
    ]
    df = from_rows(spark, rows, schema="g string, k long")
    out = sketch.hll_intersection_certificate(df, "g", "k").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.group_a, r.group_b) == ("a", "b")
    assert r.exact_intersection == 20
    assert abs(r.est_intersection - (r.est_a + r.est_b - r.est_union)) < 1e-6
    # m=256 registers on 40-key sets: linear counting is near-exact
    assert abs(r.est_a - 40) < 4 and abs(r.est_union - 60) < 6


def test_bloom_fpr_curve_monotone(spark):
    """FPR is nonincreasing in m_bits, and a filter big enough for
    the member set reads (near) zero false positives."""
    from fuel_spark.sources import from_rows

    df = from_rows(spark, [(i,) for i in range(400)], schema="user_id long")
    rows = {r.m_bits: r for r in sketch.bloom_fpr_curve(
        df, "user_id", m_list=(64, 1024, 65536)
    ).collect()}
    assert rows[64].n_members == 200 and rows[64].n_tested == 200
    fprs = [rows[m].fpr for m in (64, 1024, 65536)]
    assert fprs[0] >= fprs[1] >= fprs[2]
    assert rows[64].fpr > 0.9       # 600 set bits into 64 -> saturated
    assert rows[65536].fpr < 0.05

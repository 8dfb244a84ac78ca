"""Behavioral tests for the round-3b reporting/filtering operators:
event-stream concentration & seasonality reports, LTV deciles,
fulfilment latency, C4 rule filters, the GPT-3-style quality
classifier, lexical diversity, and embedding-norm extremes.

Each test asserts an invariant a correct implementation cannot break
(shares sum to 1, decile counts partition the population, flags imply
keep=false, ranks are 1..k) rather than golden values — the exact
values are pinned by the DuckDB oracle in the correctness gate.
"""

import math

import pytest
from pyspark.sql import functions as F

from fuel_spark.ops import similarity, text as text_ops
from fuel_spark.plans import analytics
from fuel_spark.sources import load_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def t(spark):
    return load_tables(spark, SF)


def test_pareto_share_partitions_population(t):
    rows = analytics.events_pareto_share(t).collect()
    assert [r.decile for r in rows] == list(range(1, len(rows) + 1))
    total_events = t["events"].count()
    total_users = t["events"].select("user_id").distinct().count()
    assert sum(r.n_events for r in rows) == total_events
    assert sum(r.n_users for r in rows) == total_users
    # cumulative share is monotone and ends at 1; deciles are ranked by
    # activity so the first decile holds the heaviest users
    cums = [r.cum_share for r in rows]
    assert cums == sorted(cums) and abs(cums[-1] - 1.0) < 1e-6
    assert rows[0].n_events >= rows[-1].n_events


def test_interarrival_gaps_positive_and_ordered(t):
    rows = analytics.events_interarrival(t).collect()
    assert rows, "expected at least one event type with repeat events"
    for r in rows:
        assert r.n_gaps > 0
        assert 0 <= r.avg_gap_s <= r.max_gap_s
        assert 0 <= r.p50_gap_s <= r.max_gap_s


def test_hourly_profile_shares_sum_per_hour(t):
    rows = analytics.events_hourly_profile(t).collect()
    by_hour = {}
    for r in rows:
        assert 0 <= r.hour <= 23
        by_hour.setdefault(r.hour, []).append(r.share_of_hour)
    for hour, shares in by_hour.items():
        assert abs(sum(shares) - 1.0) < 1e-5, hour


def test_new_vs_returning_accounts_every_active_day(t):
    rows = analytics.events_new_vs_returning(t).collect()
    # every user is new on exactly one day
    n_users = t["events"].select("user_id").distinct().count()
    assert sum(r.new_users for r in rows) == n_users
    active_days = (
        t["events"]
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .count()
    )
    assert sum(r.new_users + r.returning_users for r in rows) == active_days
    # first day has no returning users
    assert rows[0].returning_users == 0


def test_cooccurrence_pairs_are_canonical(t):
    rows = analytics.events_type_cooccurrence(t).collect()
    for r in rows:
        assert r.type_a < r.type_b
        assert r.n_users > 0
    # a pair can never beat either type's own user count
    per_type = dict(
        t["events"]
        .select("user_id", "event_type")
        .distinct()
        .groupBy("event_type")
        .count()
        .collect()
    )
    for r in rows:
        assert r.n_users <= min(per_type[r.type_a], per_type[r.type_b])


def test_ltv_deciles_concentrate_revenue(t):
    rows = analytics.customer_ltv_deciles(t).collect()
    assert [r.decile for r in rows] == list(range(1, len(rows) + 1))
    n_cust = t["orders"].select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in rows) == n_cust
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-5
    # ranked: decile 1's mean customer outspends the last decile's
    assert rows[0].avg_ltv >= rows[-1].avg_ltv


def test_shipping_delay_stats_sane(t):
    rows = analytics.shipping_delay_stats(t).collect()
    n_items = t["lineitem"].count()
    assert sum(r.n_items for r in rows) == n_items
    for r in rows:
        assert r.avg_delay_days <= r.max_delay_days
        assert 0.0 <= r.late_frac <= 1.0


def test_c4_filters_flags_imply_drop(t):
    d = t["documents"]
    rows = text_ops.c4_filters(d, "doc_id", "text").collect()
    assert len(rows) == d.count()
    for r in rows:
        flagged = (
            r.too_short
            or r.bad_word_len
            or r.has_brace
            or r.has_lorem
            or r.low_alpha
        )
        assert r.keep == (not flagged)


def test_c4_filters_catches_planted_boilerplate(spark):
    from fuel_spark.sources import from_rows

    docs = from_rows(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog again and again today"),
            (2, "short"),
            (3, "function f() { return 1; } " * 5),
            (4, "Lorem ipsum dolor sit amet " * 5),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in text_ops.c4_filters(docs, "doc_id", "text").collect()}
    assert out[1].keep
    assert out[2].too_short and not out[2].keep
    assert out[3].has_brace and not out[3].keep
    assert out[4].has_lorem and not out[4].keep


def test_quality_classifier_keep_rule(t):
    d = t["documents"]
    rows = text_ops.quality_classifier(d, "doc_id", "text").collect()
    assert len(rows) == d.count()
    for r in rows:
        assert 0.0 <= r.score <= 1.0 and 0.0 <= r.u < 1.0
        assert r.keep == (r.score > r.u ** 9.0)
    # the Pareto-tail rule keeps a nontrivial middle ground: some kept,
    # and keeps must dominate drops in score on average
    kept = [r.score for r in rows if r.keep]
    dropped = [r.score for r in rows if not r.keep]
    assert kept
    if dropped:
        assert sum(kept) / len(kept) > sum(dropped) / len(dropped)


def test_quality_classifier_deterministic_across_runs(t):
    d = t["documents"]
    a = sorted(
        text_ops.quality_classifier(d, "doc_id", "text").collect(),
        key=lambda r: r.doc_id,
    )
    b = sorted(
        text_ops.quality_classifier(d, "doc_id", "text").collect(),
        key=lambda r: r.doc_id,
    )
    assert a == b


def test_lexical_diversity_bounds(t):
    d = t["documents"]
    rows = text_ops.lexical_diversity(d, "doc_id", "text").collect()
    assert len(rows) == d.count()
    for r in rows:
        assert r.n_distinct <= r.n_words
        assert 0.0 <= r.ttr <= 1.0
        assert 0.0 <= r.hapax_frac <= 1.0
        # entropy of n_distinct symbols is at most log2(n_distinct)
        if r.n_distinct:
            assert -1e-6 <= r.entropy <= math.log2(r.n_distinct) + 1e-6


def test_length_histogram_covers_corpus(t):
    d = t["documents"]
    rows = text_ops.length_histogram(d, "n_chars", 50).collect()
    assert sum(r.n_docs for r in rows) == d.count()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-5
    for r in rows:
        assert r.bucket_hi - r.bucket_lo == 50


def test_norm_extremes_ranks_both_sides(t):
    e = t["embeddings"]
    rows = similarity.norm_extremes(e, "vec_id", "embedding", k=5).collect()
    hi = sorted(
        [r for r in rows if r.side == "high"], key=lambda r: r.rank
    )
    lo = sorted([r for r in rows if r.side == "low"], key=lambda r: r.rank)
    assert [r.rank for r in hi] == [1, 2, 3, 4, 5]
    assert [r.rank for r in lo] == [1, 2, 3, 4, 5]
    # high side descends, low side ascends, and they do not cross
    assert all(hi[i].vec_norm >= hi[i + 1].vec_norm for i in range(4))
    assert all(lo[i].vec_norm <= lo[i + 1].vec_norm for i in range(4))
    assert hi[-1].vec_norm >= lo[-1].vec_norm


def test_session_stats_consistent_with_sessionize(t):
    row = analytics.events_session_stats(t).collect()[0]
    sess = analytics.events_sessionize(t).collect()
    assert row.n_sessions == len(sess)
    assert row.avg_events_per_session >= 1.0
    assert 0.0 <= row.bounce_rate <= 1.0
    assert row.p50_duration_sec >= 0.0


def test_value_histogram_partitions_events(t):
    rows = analytics.events_value_histogram(t).collect()
    assert sum(r.n for r in rows) == t["events"].count()
    for r in rows:
        # every event in the bucket lies in [bucket_lo, bucket_lo + 10)
        assert r.bucket_lo % 10 == 0 or r.bucket_lo == int(r.bucket_lo)


def test_churn_partitions_prior_window(t):
    row = analytics.events_churn(t).collect()[0]
    assert row.n_retained + row.n_churned == row.n_prior
    assert 0.0 <= row.churn_rate <= 1.0


def test_basket_pairs_canonical_and_bounded(t):
    rows = analytics.basket_part_pairs(t, top=10).collect()
    assert len(rows) <= 10
    n_orders = t["lineitem"].select("l_orderkey").distinct().count()
    for r in rows:
        assert r.part_a < r.part_b
        assert 0 < r.n_orders <= n_orders
    counts = [r.n_orders for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_gini_bounds_and_total(t):
    row = analytics.revenue_concentration(t).collect()[0]
    assert 0.0 <= row.gini < 1.0
    exact_total = (
        t["orders"]
        .agg(F.round(F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
                     .cast("double"), 6))
        .collect()[0][0]
    )
    assert abs(row.total_revenue - exact_total) < 1e-3


def test_url_dedup_canonicalization(spark):
    from fuel_spark.sources import from_rows

    docs = from_rows(
        spark,
        [
            (1, "https://www.Example.com/a/b/?utm_source=x&q=1#frag"),
            (2, "http://example.com/a/b?q=1"),
            (3, "https://example.com/a/b?q=2"),
        ],
        "doc_id bigint, url string",
    )
    out = {r.doc_id: r for r in text_ops.url_dedup(docs, "doc_id", "url").collect()}
    # 1 and 2 collapse to the same canonical url; 3 differs by param
    assert out[1].canonical_url == out[2].canonical_url == "example.com/a/b?q=1"
    assert not out[1].is_dup and out[2].is_dup
    assert out[3].canonical_url == "example.com/a/b?q=2" and not out[3].is_dup


def test_quality_by_source_covers_corpus(t):
    rows = text_ops.quality_by_source(
        t["documents"], "doc_id", "text", "source", "lang"
    ).collect()
    assert sum(r.n_docs for r in rows) == t["documents"].count()
    for r in rows:
        assert 0.0 <= r.keep_frac <= 1.0 and r.avg_words > 0


def test_doc_frequency_counts_docs_once(spark):
    from fuel_spark.sources import from_rows

    docs = from_rows(
        spark,
        [
            (1, "spark query engine spark query engine"),
            (2, "spark query plans"),
            (3, "unrelated words here"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r.ngram: r
        for r in text_ops.doc_frequency_ngrams(
            docs, "doc_id", "text", n=2, top=50
        ).collect()
    }
    # "spark query" appears twice in doc 1 but counts once per doc
    assert out["spark query"].n_docs_containing == 2
    assert abs(out["spark query"].doc_frac - 2 / 3) < 1e-5


def test_dim_stats_bounds(t):
    rows = similarity.dim_stats(t["embeddings"], "embedding").collect()
    n_vecs = t["embeddings"].count()
    dims = [r.dim for r in rows]
    assert dims == list(range(len(rows)))
    for r in rows:
        assert r.n == n_vecs
        assert r.min_v <= r.mean_v <= r.max_v


def test_ab_test_arms_partition_users(t):
    rows = analytics.events_ab_test(t).collect()
    assert sorted(r.arm for r in rows) == ["A", "B"]
    n_users = t["events"].select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) == n_users
    assert sum(r.n_events for r in rows) == t["events"].count()
    for r in rows:
        assert 0.0 <= r.conversion <= 1.0


def test_ab_assignment_is_deterministic(t):
    a = analytics.events_ab_test(t).collect()
    b = analytics.events_ab_test(t).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_monthly_growth_chain(t):
    rows = analytics.orders_monthly_growth(t).collect()
    assert rows[0].mom_growth is None
    for prev, cur in zip(rows, rows[1:]):
        if cur.mom_growth is not None and prev.revenue:
            expected = round((cur.revenue - prev.revenue) / prev.revenue, 6)
            assert abs(cur.mom_growth - expected) < 1e-9
    assert sum(r.n_orders for r in rows) == t["orders"].count()


def test_user_paths_counts_positive_sorted(t):
    rows = analytics.events_user_path_topk(t).collect()
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(n > 0 for n in ns)


def test_order_gaps_nonnegative(t):
    rows = analytics.customer_order_gaps(t).collect()
    for r in rows:
        assert r.n_gaps > 0 and r.avg_gap_days >= 0 and r.p50_gap_days >= 0


def test_part_price_stats_bounds(t):
    rows = analytics.part_price_stats(t).collect()
    assert sum(r.n_parts for r in rows) == t["part"].count()
    for r in rows:
        assert r.min_price <= r.avg_price <= r.max_price
        assert r.n_types <= r.n_parts


def test_dup_rate_by_source_detects_planted_dups(spark):
    from fuel_spark.sources import from_rows

    docs = from_rows(
        spark,
        [(1, "a", "same text"), (2, "a", "same text"),
         (3, "a", "other"), (4, "b", "unique")],
        "doc_id bigint, source string, text string",
    )
    out = {r.source: r for r in
           text_ops.dup_rate_by_source(docs, "text", "source").collect()}
    assert out["a"].n_docs == 3 and out["a"].n_unique == 2
    assert abs(out["a"].dup_rate - (1 - 2 / 3)) < 1e-5
    assert out["b"].dup_rate == 0.0


def test_shingle_uniqueness_repetitive_text_scores_low(spark):
    from fuel_spark.sources import from_rows

    docs = from_rows(
        spark,
        [(1, "abcdefghij klmnop qrstu vwxyz unique stream"),
         (2, "ab ab ab ab ab ab ab ab ab ab ab ab ab ab")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in
           text_ops.shingle_uniqueness(docs, "doc_id", "text").collect()}
    assert out[1].uniqueness > out[2].uniqueness
    for r in out.values():
        assert 0 < r.uniqueness <= 1.0
        assert r.n_distinct_shingles <= r.n_shingles


def test_adjacent_cosine_histogram_counts_all_pairs(t):
    rows = similarity.adjacent_cosine_histogram(
        t["embeddings"], "vec_id", "embedding"
    ).collect()
    n_vecs = t["embeddings"].count()
    # ids are dense 0..n-1, so there are n-1 adjacent pairs
    assert sum(r.n_pairs for r in rows) == n_vecs - 1
    for r in rows:
        assert -1.0 <= r.bucket_lo <= 1.0


def test_lang_confusion_shares_and_totals(t):
    rows = text_ops.lang_confusion(t["documents"], "lang", "text").collect()
    assert sum(r.n for r in rows) == t["documents"].count()
    by_true = {}
    for r in rows:
        by_true.setdefault(r.lang_true, []).append(r.share_of_true)
    for shares in by_true.values():
        assert abs(sum(shares) - 1.0) < 1e-5


def test_epoch_batches_independent_permutations(t):
    from fuel_spark import schemes

    out = schemes.epoch_batches(
        t["customer"], "c_custkey", 20, epochs=2, seed=7
    ).collect()
    n = t["customer"].count()
    e0 = {r.c_custkey: r.pos for r in out if r.epoch == 0}
    e1 = {r.c_custkey: r.pos for r in out if r.epoch == 1}
    # every epoch is a full permutation of the dataset
    assert len(e0) == len(e1) == n
    assert sorted(e0.values()) == list(range(n))
    assert sorted(e1.values()) == list(range(n))
    # and the epochs differ (independent seeded shuffles)
    assert any(e0[k] != e1[k] for k in e0)


def test_supplier_tiers_partition_suppliers(t):
    rows = analytics.supplier_balance_tiers(t).collect()
    assert sum(r.n_suppliers for r in rows) == t["supplier"].count()
    for r in rows:
        assert r.tier in ("debt", "low", "high")
        if r.tier == "debt":
            assert r.avg_acctbal < 0


def test_priority_mix_shares_sum_per_segment(t):
    rows = analytics.priority_mix_by_segment(t).collect()
    assert sum(r.n_orders for r in rows) == t["orders"].count()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append(r.share_of_segment)
    for shares in by_seg.values():
        assert abs(sum(shares) - 1.0) < 1e-5


def test_user_anomalies_ordered_by_extremity(t):
    rows = analytics.events_user_anomalies(t).collect()
    zs = [abs(r.z) for r in rows]
    assert zs == sorted(zs, reverse=True)
    assert len(rows) <= 20


def test_order_size_histogram_partitions_orders(t):
    rows = analytics.orders_size_histogram(t).collect()
    n_orders = t["lineitem"].select("l_orderkey").distinct().count()
    assert sum(r.n_orders for r in rows) == n_orders
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-5
    assert all(r.n_lines >= 1 for r in rows)


def test_word_length_hist_covers_tokens(t):
    rows = text_ops.word_length_histogram(t["documents"], "text").collect()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-5
    assert all(r.word_len >= 1 for r in rows)


def test_quantization_error_within_int8_bound(t):
    row = similarity.quantization_error(t["embeddings"], "embedding").collect()[0]
    assert row.n_vecs == t["embeddings"].count()
    # symmetric int8 bound: half a quantization step of absmax
    assert 0.0 <= row.avg_rel_err <= row.max_rel_err <= 0.5 / 127 + 1e-9


def test_similar_users_trail_cap_preserves_prefix_semantics(t):
    """max_trail keeps each user's first-N events; with a cap at or
    above every user's event count the result is exactly the uncapped
    one."""
    big = max(
        r[0] for r in
        t["events"].groupBy("user_id").count().select("count").collect()
    )
    capped = analytics.events_similar_users(t, max_trail=big).collect()
    exact = analytics.events_similar_users(t).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, exact))


def test_conversion_lag_quartiles_ordered(t):
    row = analytics.events_conversion_lag(t).collect()[0]
    if row.n_converters:
        assert 0 <= row.p25_lag_hours <= row.p50_lag_hours <= row.p75_lag_hours
        assert row.avg_lag_hours > 0


def test_customer_order_freq_partitions_customers(t):
    rows = analytics.customer_order_freq(t).collect()
    n_cust = t["orders"].select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in rows) == n_cust
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-5


def test_monthly_type_mix_shares(t):
    rows = analytics.events_monthly_type_mix(t).collect()
    assert sum(r.n for r in rows) == t["events"].count()
    by_month = {}
    for r in rows:
        by_month.setdefault(r.month, []).append(r.share_of_month)
    for shares in by_month.values():
        assert abs(sum(shares) - 1.0) < 1e-5


def test_discount_curve_totals(t):
    rows = analytics.discount_revenue_curve(t).collect()
    assert sum(r.n_items for r in rows) == t["lineitem"].count()
    for r in rows:
        assert 0.0 <= r.discount <= 0.2
        assert r.revenue > 0


def test_label_separation_own_beats_global_on_clustered_data(spark):
    """Construct labels that ARE clusters: vectors around two opposite
    anchors.  Members must be closer (cosine) to their own centroid
    than to the global centroid."""
    from fuel_spark.sources import from_rows

    rows = []
    for i in range(20):
        eps = (i % 5) * 0.01
        rows.append((i, [1.0, eps, 0.0], 0))
        rows.append((100 + i, [-1.0, 0.0, eps], 1))
    df = from_rows(
        spark, rows, "vec_id bigint, embedding array<float>, label int"
    )
    out = {r.label: r for r in
           similarity.label_separation(df, "label", "vec_id", "embedding").collect()}
    for lbl in (0, 1):
        assert out[lbl].n_members == 20
        assert out[lbl].avg_cos_own > 0.99
        assert out[lbl].avg_cos_own > abs(out[lbl].avg_cos_global)


def test_retention_curve_monotone_denominator(t):
    rows = analytics.events_retention_curve(t).collect()
    assert rows[0].day_offset == 0
    # day-0 retention is 1 by construction (every user is active on
    # their own first day)
    assert abs(rows[0].retention - 1.0) < 1e-9
    eligibles = [r.n_eligible for r in rows]
    assert eligibles == sorted(eligibles, reverse=True)
    for r in rows:
        assert 0.0 <= r.retention <= 1.0
        assert r.n_retained <= r.n_eligible


def test_column_correlation_known_cases(spark):
    from fuel_spark.sources import from_rows

    perfect = from_rows(
        spark, [(float(i), 2.0 * i + 1) for i in range(50)],
        "x double, y double",
    )
    r1 = analytics.column_correlation(perfect, "x", "y").collect()[0]
    assert abs(r1.pearson_r - 1.0) < 1e-6
    anti = from_rows(
        spark, [(float(i), -3.0 * i) for i in range(50)],
        "x double, y double",
    )
    r2 = analytics.column_correlation(anti, "x", "y").collect()[0]
    assert abs(r2.pearson_r + 1.0) < 1e-6


def test_vocab_coverage_monotone(t):
    rows = text_ops.vocab_coverage_curve(
        t["documents"], "text", (5, 10, 20)
    ).collect()
    assert [r.top_n for r in rows] == sorted(r.top_n for r in rows)
    covs = [r.coverage for r in rows]
    assert covs == sorted(covs)
    assert all(0 < c <= 1.0 for c in covs)


def test_centroid_confusion_canonical_pairs(t):
    rows = similarity.centroid_confusion(
        t["embeddings"], "label", "embedding"
    ).collect()
    n_labels = t["embeddings"].select("label").distinct().count()
    assert len(rows) == n_labels * (n_labels - 1) // 2
    for r in rows:
        assert r.label_a < r.label_b
        assert -1.0 <= r.centroid_cosine <= 1.0


def test_centroid_confusion_detects_close_pair(spark):
    from fuel_spark.sources import from_rows

    rows = []
    for i in range(10):
        rows += [
            (i, [1.0, 0.01 * i, 0.0], 0),     # labels 0 and 1 overlap
            (100 + i, [1.0, 0.0, 0.01 * i], 1),
            (200 + i, [-1.0, 0.0, 0.0], 2),   # label 2 is opposite
        ]
    df = from_rows(
        spark, rows, "vec_id bigint, embedding array<float>, label int"
    )
    out = {(r.label_a, r.label_b): r.centroid_cosine
           for r in similarity.centroid_confusion(df, "label", "embedding").collect()}
    assert out[(0, 1)] > 0.99
    assert out[(0, 2)] < -0.99 and out[(1, 2)] < -0.99


def test_block_profile_partitions_corpus(t):
    rows = similarity.block_size_profile(
        t["embeddings"], "embedding", bits=16
    ).collect()
    assert sum(r.n_vectors for r in rows) == t["embeddings"].count()
    assert abs(sum(r.share_of_corpus for r in rows) - 1.0) < 1e-5
    for r in rows:
        assert r.n_vectors == r.block_size * r.n_blocks


def test_dow_hour_heatmap_grid(t):
    rows = analytics.events_dow_hour_heatmap(t).collect()
    assert sum(r.n for r in rows) == t["events"].count()
    for r in rows:
        assert 1 <= r.dow <= 7 and 0 <= r.hour <= 23
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-5


def test_pair_quality_stats_consistent_with_pairs(t):
    from fuel_spark.ops import dedup

    pairs = dedup.ngram_jaccard_pairs(t["documents"], "doc_id", "text")
    collected = pairs.collect()
    row = dedup.pair_quality_stats(pairs).collect()[0]
    assert row.n_pairs == len(collected)
    assert row.n_ge_08 <= row.n_ge_05 <= row.n_pairs
    if collected:
        mean = sum(r.jaccard for r in collected) / len(collected)
        assert abs(row.avg_jaccard - mean) < 1e-5


def test_prefix_dup_groups_catches_shared_heads(spark):
    from fuel_spark.ops import dedup
    from fuel_spark.sources import from_rows

    head = "this is the exact same very long templated page header text"
    docs = from_rows(
        spark,
        [(1, head + " tail one"), (2, head + " another different tail"),
         (3, "a completely different document body")],
        "doc_id bigint, text string",
    )
    rows = dedup.prefix_dup_groups(docs, "doc_id", "text", prefix_len=40).collect()
    assert len(rows) == 1
    assert rows[0].n_docs == 2 and rows[0].keep_id == 1


def test_shard_assignment_stable_under_append(t):
    from fuel_spark import schemes

    c = t["customer"]
    full = {r.shard_id: r.n_rows
            for r in schemes.shard_assignment(c, "c_custkey", 8).collect()}
    assert sum(full.values()) == c.count()
    # assignment is per-key: a subset's shard rows are a subset of the
    # full run's (appends never move existing keys)
    half = c.where(F.col("c_custkey") % 2 == 0)
    sub = {r.shard_id: r.n_rows
           for r in schemes.shard_assignment(half, "c_custkey", 8).collect()}
    assert all(sub[k] <= full.get(k, 0) for k in sub)


def test_returns_by_month_bounds(t):
    rows = analytics.returns_by_month(t).collect()
    assert sum(r.n_items for r in rows) == t["lineitem"].count()
    for r in rows:
        assert 0.0 <= r.return_rate <= 1.0
        assert 0.0 <= r.returned_revenue <= r.revenue + 1e-6


def test_knn_purity_on_separable_labels(spark):
    from fuel_spark.sources import from_rows

    rows = []
    for i in range(12):
        rows.append((i, [1.0, 0.001 * i, 0.0], 0))
        rows.append((100 + i, [-1.0, 0.0, 0.001 * i], 1))
    df = from_rows(
        spark, rows, "vec_id bigint, embedding array<float>, label int"
    )
    q = df.where(F.col("vec_id").isin(0, 100))
    out = {r.query_id: r for r in
           similarity.knn_label_purity(df, q, "label", "vec_id",
                                       "embedding", k=5).collect()}
    # perfectly separated clusters: every neighbor shares the label
    assert out[0].purity == 1.0 and out[100].purity == 1.0
    assert out[0].n_neighbors == 5


def test_dedup_summary_consistent(t):
    from fuel_spark.ops import dedup

    d = t["documents"]
    row = dedup.dedup_summary(d, "doc_id", "text").collect()[0]
    assert row.n_docs == d.count()
    assert row.n_unique_texts + row.n_exact_dup_docs == row.n_docs
    assert row.n_near_dup_pairs >= 0
    assert 0.0 <= row.exact_dup_frac < 1.0


def test_gap_histogram_accounts_all_gaps(t):
    rows = analytics.events_gap_histogram(t).collect()
    n_events = t["events"].count()
    n_users = t["events"].select("user_id").distinct().count()
    # one gap per event beyond each user's first
    assert sum(r.n_gaps for r in rows) == n_events - n_users
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-5
    for r in rows:
        assert r.gap_s_lo == 2.0 ** r.log2_bucket - 1


def test_rfm_segments_partition_users(t):
    rows = analytics.events_rfm_segments(t).collect()
    n_users = t["events"].select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) == n_users
    assert {r.segment for r in rows} <= {
        "champion", "loyal", "fresh", "at_risk"
    }


def test_supplier_concentration_bounds(t):
    row = analytics.supplier_revenue_concentration(t).collect()[0]
    assert 0.0 <= row.gini < 1.0
    assert row.n_suppliers == (
        t["lineitem"].select("l_suppkey").distinct().count()
    )


def test_exact_vector_dedup_finds_planted(spark):
    from fuel_spark.ops import dedup
    from fuel_spark.sources import from_rows

    rows = [
        (1, [0.5, -0.25, 0.125]),
        (2, [0.5, -0.25, 0.125]),       # exact dup of 1
        (3, [0.5, -0.25, 0.1250004]),   # rounds to the same 6 dp
        (4, [0.9, 0.1, 0.0]),           # unique
    ]
    df = from_rows(spark, rows, "vec_id bigint, embedding array<float>")
    out = dedup.exact_vector_dedup(df, "vec_id", "embedding").collect()
    assert len(out) == 1
    assert out[0].n_vecs == 3 and out[0].keep_id == 1


def test_entry_points_partition_users(t):
    rows = analytics.events_entry_points(t).collect()
    n_users = t["events"].select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) == n_users
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-5


def test_norm_by_label_bounds(t):
    rows = similarity.norm_by_label(t["embeddings"], "label", "embedding").collect()
    assert sum(r.n_vecs for r in rows) == t["embeddings"].count()
    for r in rows:
        assert r.min_norm <= r.mean_norm <= r.max_norm


def _sep_clusters(spark, sep=10.0):
    from fuel_spark.sources import from_rows

    rows = []
    for i in range(8):
        rows.append((i, [0.0 + 0.1 * (i % 2), 0.0], 0))
        rows.append((100 + i, [sep + 0.1 * (i % 2), 0.0], 1))
        rows.append((200 + i, [0.0, sep + 0.1 * (i % 2)], 2))
    return from_rows(
        spark, rows, "vec_id bigint, embedding array<float>, label int"
    )


def test_silhouette_separated_vs_merged(spark):
    tight = similarity.silhouette_by_label(_sep_clusters(spark, 10.0))
    loose = similarity.silhouette_by_label(_sep_clusters(spark, 0.2))
    st = {r.label: r for r in tight.collect()}
    sl = {r.label: r for r in loose.collect()}
    assert all(st[k].silhouette > 0.95 for k in st)  # a≈0.05, b≈10
    assert all(sl[k].silhouette < st[k].silhouette for k in sl)
    assert st[0].n == 8 and st[0].mean_a < st[0].mean_b


def test_davies_bouldin_orders_separation(spark):
    dbt = similarity.davies_bouldin_by_label(_sep_clusters(spark, 10.0))
    dbl = similarity.davies_bouldin_by_label(_sep_clusters(spark, 0.5))
    rt, rl = dbt.collect(), dbl.collect()
    assert all(r.db_index == rt[0].db_index for r in rt)  # repeated index
    assert rt[0].db_index < rl[0].db_index  # tighter -> lower DB
    assert all(r.scatter >= 0 and r.max_ratio > 0 for r in rt)


def test_calinski_harabasz_orders_separation(spark):
    cht = similarity.calinski_harabasz(_sep_clusters(spark, 10.0)).collect()[0]
    chl = similarity.calinski_harabasz(_sep_clusters(spark, 0.5)).collect()[0]
    assert cht.n == 24 and cht.k == 3
    assert cht.ch > chl.ch > 0
    assert cht.between_ss > cht.within_ss  # separation dominates


# ---- r10 closing five ------------------------------------------------------


def test_stopword_density_drift_split(spark):
    """Parity halves accumulate independently; delta = b - a."""
    import __spark_entry__ as E
    from fuel_spark.sources import from_rows

    rows = [
        (0, "s", "the and of to in"),       # even: all stopwords
        (1, "s", "alpha beta gamma delta"),  # odd: none
    ]
    df = from_rows(spark, rows, schema="doc_id bigint, source string, text string")
    t = {"documents": df}
    # drive the wrapper through the registry shape with a stub loader
    orig = E._t
    E._t = lambda spark_, sf_: t
    try:
        r = E.q_stopword_density_drift(spark, "x").collect()[0]
    finally:
        E._t = orig
    assert (r.n_words_a, r.n_hits_a) == (5, 5)
    assert (r.n_words_b, r.n_hits_b) == (4, 0)
    assert r.rate_a == 1.0 and r.rate_b == 0.0 and r.rate_delta == -1.0


def test_priority_aging_buckets(spark):
    """Ages bucket relative to the newest order; final orders drop."""
    import datetime as dt

    import __spark_entry__ as E
    from fuel_spark.sources import from_rows

    base = dt.datetime(2024, 12, 31)
    rows = [
        (1, 1, "O", 100.0, base, "1-URGENT"),
        (2, 1, "O", 50.0, base - dt.timedelta(days=100), "1-URGENT"),
        (3, 1, "F", 70.0, base - dt.timedelta(days=10), "1-URGENT"),
        (4, 1, "P", 30.0, base - dt.timedelta(days=400), "2-HIGH"),
    ]
    df = from_rows(
        spark, rows,
        schema="o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
               " o_totalprice double, o_orderdate timestamp,"
               " o_orderpriority string",
    )
    orig = E._t
    E._t = lambda spark_, sf_: {"orders": df}
    try:
        got = {(r.priority, r.age_bucket): r
               for r in E.q_orders_priority_aging(spark, "x").collect()}
    finally:
        E._t = orig
    assert got[("1-URGENT", "0-90")].n_orders == 1
    assert got[("1-URGENT", "91-365")].n_orders == 1
    assert got[("2-HIGH", "366+")].open_value == 30.0
    assert ("1-URGENT", "0-90") in got and len(got) == 3  # 'F' excluded

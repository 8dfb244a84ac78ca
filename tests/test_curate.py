"""Curation-planning ops (ops/curate.py) + the r7 dedup lifecycle
additions (index_bucket_profile, incremental_dedup_summary,
snapshot_token_accounting) — invariant tests on hand-built corpora."""

from pyspark.sql import functions as F

from fuel_spark.ops import curate, dedup
from fuel_spark.sources import from_rows, load_tables

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_tables(spark, SF)["documents"]


def test_mixture_weights_normalize_and_alpha1_proportional(spark):
    d = _docs(spark)
    out = curate.domain_mixture_weights(d, "source", "text").collect()
    assert abs(sum(r.weight for r in out) - 1.0) < 1e-3
    # alpha=1 degenerates to proportional-to-tokens weights
    prop = curate.domain_mixture_weights(d, "source", "text", alpha=1.0)
    total = sum(r.n_tokens for r in prop.collect())
    for r in prop.collect():
        assert abs(r.weight - r.n_tokens / total) < 1e-5
        # epochs * tokens == budget * weight (rounded arithmetic)
        assert abs(r.epochs_at_budget - 1_000_000 * r.weight / r.n_tokens) < 1e-5


def test_packing_efficiency_identities(spark):
    d = _docs(spark)
    out = curate.packing_efficiency(d, "text", seq_len=512, bin_size=64)
    rows = out.collect()
    assert sum(r.n_docs for r in rows) == d.count()
    for r in rows:
        assert r.n_waste == r.n_padded - r.n_tokens
        assert r.n_padded % 512 == 0
        assert r.bin_lo % 64 == 0
        assert 0 <= r.waste_rate < 1


def test_curriculum_phases_partition_and_order(spark):
    d = _docs(spark)
    rows = {r.phase: r for r in
            curate.curriculum_phases(d, "n_chars", "text", phases=3).collect()}
    assert set(rows) == {1, 2, 3}
    assert sum(r.n_docs for r in rows.values()) == d.count()
    # phases are ordered, non-overlapping score bands
    assert rows[1].max_score <= rows[2].min_score
    assert rows[2].max_score <= rows[3].min_score
    # exact-percentile targets: phase 1 holds >= ceil(N/3) docs only
    # when its cut value has no ties past the target; at minimum each
    # phase is non-empty and phase 1 reaches the target
    n = d.count()
    assert rows[1].n_docs >= (n + 2) // 3 - 0  # cut is min value reaching target
    assert rows[1].n_docs + rows[2].n_docs >= 2 * ((n + 2) // 3) - 2


def test_curation_funnel_chained_counts(spark):
    d = _docs(spark)
    rows = sorted(curate.curation_funnel(d, "text").collect(),
                  key=lambda r: r.stage)
    assert [r.stage for r in rows] == [1, 2, 3, 4]
    assert rows[0].rows_in == d.count()
    for a, b in zip(rows, rows[1:]):
        assert a.rows_out == b.rows_in       # funnel chains
        assert b.rows_out <= b.rows_in       # monotone drop
    # recompute stage 1 by hand
    n1 = d.where(F.length("text") >= 200).count()
    assert rows[0].rows_out == n1


def test_top_ngrams_by_group_hand_corpus(spark):
    rows = [
        ("a", 1, "x y z x y z x y z"),
        ("a", 2, "x y z q r s"),
        ("b", 3, "p q r"),
    ]
    df = from_rows(spark, rows, schema="source string, doc_id bigint, text string")
    from fuel_spark.ops import text as text_ops

    out = text_ops.top_ngrams_by_group(df, "source", "text", n=3, k=2).collect()
    by = {(r.source, r.rank): (r.gram, r.cnt) for r in out}
    assert by[("a", 1)] == ("x y z", 4)      # 3 in doc1 + 1 in doc2
    assert by[("b", 1)] == ("p q r", 1)
    for r in out:
        assert r.rank <= 2


def test_index_bucket_profile_hand_index(spark):
    rows = [
        (1, 0, "k1"), (2, 0, "k1"), (3, 0, "k1"),   # bucket of 3
        (4, 0, "k2"),                                 # bucket of 1
        (1, 1, "k3"), (2, 1, "k4"),                   # two singletons
    ]
    idx = from_rows(spark, rows,
                    schema="doc_id bigint, band_id int, band_key string")
    out = {r.band_id: r for r in
           dedup.index_bucket_profile(idx, max_bucket=2).collect()}
    assert out[0].n_rows == 4 and out[0].n_buckets == 2
    assert out[0].max_bucket_sz == 3 and out[0].n_over_cap == 1
    assert out[0].mean_bucket == 2.0
    assert out[1].n_rows == 2 and out[1].n_over_cap == 0


def test_incremental_dedup_summary_hand_corpora(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    old = from_rows(
        spark,
        [(1, base), (2, "completely different text body here for doc two"),
         (3, "short doc three retired soon")],
        schema="doc_id bigint, text string",
    )
    new = from_rows(
        spark,
        [(1, base),                                  # unchanged
         (2, "completely different text body here for doc two v2"),  # changed
         (4, base),                                  # added, near-dup of 1
         (5, "a genuinely novel document with fresh words entirely")],  # added
        schema="doc_id bigint, text string",
    )
    out = {r.stage_name: r.n for r in
           dedup.incremental_dedup_summary(old, new).collect()}
    assert out["old_docs"] == 3 and out["new_docs"] == 4
    assert out["diff_added"] == 2 and out["diff_changed"] == 1
    assert out["diff_removed"] == 1
    # doc 4 is an exact copy of doc 1's text: every band collides
    assert out["screen_flagged"] >= 1
    assert out["screen_survivors"] + out["screen_flagged"] == 3  # added+changed
    assert out["index_rows_merged"] > out["index_rows_compacted"] or (
        out["index_rows_merged"] >= out["index_rows_compacted"]
    )
    # compaction drops the removed doc 3's rows: compacted index only
    # holds live ids
    assert out["index_rows_compacted"] <= out["index_rows_merged"]


def test_snapshot_token_accounting_hand_corpora(spark):
    old = from_rows(
        spark,
        [(1, "one two three"), (2, "four five"), (3, "six")],
        schema="doc_id bigint, text string",
    )
    new = from_rows(
        spark,
        [(1, "one two three"), (2, "four five six seven"), (4, "eight nine")],
        schema="doc_id bigint, text string",
    )
    out = {r.status: r for r in
           dedup.snapshot_token_accounting(old, new).collect()}
    assert out["unchanged"].n_docs == 1 and out["unchanged"].old_tokens == 3
    assert out["changed"].old_tokens == 2 and out["changed"].new_tokens == 4
    assert out["changed"].net_tokens == 2
    assert out["removed"].old_tokens == 1 and out["removed"].new_tokens == 0
    assert out["added"].new_tokens == 2 and out["added"].old_tokens == 0


def test_cross_source_dedup_rate_hand_corpus(spark):
    rows = [
        ("a", 1, "same text body"), ("b", 2, "same text body"),
        ("a", 3, "unique one"), ("b", 4, "unique two"),
    ]
    df = from_rows(spark, rows,
                   schema="source string, doc_id bigint, text string")
    out = {r.source: r for r in
           dedup.dedup_rate_by_group(df, "source").collect()}
    # the dup group spans sources: both sides count their member
    assert out["a"].n_dup_docs == 1 and out["b"].n_dup_docs == 1
    # keep-min: doc 1 survives, doc 2 is the loser
    assert out["a"].n_losers == 0 and out["b"].n_losers == 1
    assert out["a"].dup_rate == 0.5


def test_candidate_budget_hand_index(spark):
    rows = [(i, 0, "k1") for i in range(5)] + [(9, 0, "k2"), (10, 0, "k2")]
    idx = from_rows(spark, rows,
                    schema="doc_id bigint, band_id int, band_key string")
    r = dedup.candidate_pair_budget(idx, max_bucket=3).first()
    assert r.n_pairs_budget == 1          # C(2,2 keys in k2) = 1
    assert r.n_pairs_skipped == 10        # C(5,2) from the over-cap k1
    assert r.n_buckets_skipped == 1


def test_truncation_savings_hand_lens(spark):
    # 10 docs of 2 tokens, 1 doc of 100 tokens: p90 cutoff is 2
    rows = [(i, "a b") for i in range(10)] + [(99, " ".join(["w"] * 100))]
    df = from_rows(spark, rows, schema="doc_id bigint, text string")
    out = {r.prob: r for r in
           curate.truncation_savings(df, "text", probs=(0.9,)).collect()}
    r = out[0.9]
    assert r.cutoff_len == 2
    assert r.docs_truncated == 1 and r.tokens_saved == 98


def test_mixture_schedule_sums_exactly(spark):
    d = _docs(spark)
    out = curate.mixture_schedule_slots(d, "source", "text", slots=1000)
    rows = out.collect()
    assert sum(r.slots_alloc for r in rows) == 1000
    assert all(r.slots_alloc >= 0 for r in rows)


def test_snapshot_psi_zero_on_identical(spark):
    d = _docs(spark).select("doc_id", "text")
    out = curate.snapshot_length_psi(d, d, "text").collect()
    assert all(r.psi_term == 0.0 for r in out)
    # a shifted snapshot produces positive total drift
    longer = d.withColumn("text", F.concat_ws(" ", "text", "text"))
    drift = sum(r.psi_term for r in
                curate.snapshot_length_psi(d, longer, "text").collect())
    assert drift > 0.1


def test_token_gini_uniform_zero_and_skew_high(spark):
    flat = from_rows(spark, [(i, "a b c d") for i in range(50)],
                     schema="doc_id bigint, text string")
    assert curate.token_gini(flat, "text").first().gini == 0.0
    skew = from_rows(
        spark,
        [(i, "w") for i in range(40)] + [(99, " ".join(["w"] * 960))],
        schema="doc_id bigint, text string",
    )
    r = curate.token_gini(skew, "text").first()
    assert r.n_docs == 41 and r.total_tokens == 1000
    assert r.gini > 0.85


def test_vocab_overlap_identical_and_disjoint(spark):
    from fuel_spark.ops import text as text_ops

    rows = [("a", 1, "x y z"), ("b", 2, "x y z"), ("c", 3, "p q r")]
    df = from_rows(spark, rows,
                   schema="source string, doc_id bigint, text string")
    out = {(r.group_a, r.group_b): r for r in
           text_ops.source_vocab_overlap(df, "source", "text", 10).collect()}
    assert out[("a", "b")].jaccard == 1.0
    assert out[("a", "c")].jaccard == 0.0 and out[("a", "c")].uni == 6


def test_curriculum_source_mix_fracs_sum(spark):
    d = _docs(spark)
    out = curate.curriculum_source_mix(d, "n_chars", "source", 3).collect()
    from collections import defaultdict

    per_phase = defaultdict(float)
    docs = defaultdict(int)
    for r in out:
        per_phase[r.phase] += r.frac_of_phase
        docs[r.phase] += r.n_docs
    assert all(abs(v - 1.0) < 1e-3 for v in per_phase.values())
    phases = {r.phase: r.n_docs for r in
              curate.curriculum_phases(d, "n_chars", "text", 3).collect()}
    assert docs == phases                    # same assignment, same totals


def test_vocab_churn_hand_snapshots(spark):
    from fuel_spark.ops import text as text_ops

    old = from_rows(spark, [(1, "alpha beta beta"), (2, "gamma")],
                    schema="doc_id bigint, text string")
    new = from_rows(spark, [(1, "alpha alpha delta")],
                    schema="doc_id bigint, text string")
    out = {r.status: r for r in
           text_ops.snapshot_vocab_churn(old, new, "text").collect()}
    assert out["gained"].n_words == 1 and out["gained"].n_occurrences == 1
    assert out["lost"].n_words == 2                       # beta, gamma
    assert out["lost"].n_occurrences == 3                 # 2 beta + 1 gamma
    assert out["shared"].n_words == 1                     # alpha
    assert out["shared"].n_occurrences == 2               # NEW-side mass


def test_concat_vs_pad_identities(spark):
    d = _docs(spark)
    for r in curate.packing_concat_vs_pad(d, "source", "text", 512).collect():
        assert r.concat_sequences <= r.pad_sequences
        assert r.sequences_saved == r.pad_sequences - r.concat_sequences
        assert 0 <= r.save_rate < 1
        assert r.concat_sequences == -(-r.n_tokens // 512)


def test_hot_buckets_hand_index(spark):
    rows = ([(i, 0, "big") for i in range(4)]
            + [(9, 0, "mid"), (10, 0, "mid"), (11, 0, "tiny")])
    idx = from_rows(spark, rows,
                    schema="doc_id bigint, band_id int, band_key string")
    out = dedup.hot_buckets(idx, k=2).collect()
    assert [(r.band_key, r.bucket_sz, r.rank) for r in
            sorted(out, key=lambda r: r.rank)] == [("big", 4, 1), ("mid", 2, 2)]


def test_split_leakage_wrapper_nondegenerate(spark):
    import __spark_entry__ as E

    rows = E.q_split_leakage(spark, SF).collect()
    # the injected exact copies guarantee cross-split shared digests
    assert rows and all(r.n_shared_digests > 0 for r in rows)


def test_bloom_merge_certificate_zero_mismatch(spark):
    from fuel_spark.ops import sketch

    df = from_rows(spark, [(i % 300,) for i in range(900)],
                   schema="k bigint")
    r = sketch.bloom_merge_certificate(
        df, "k", split_col=F.col("k") % 2 == 0
    ).first()
    assert r.n_mismatch == 0 and r.n_positions > 0


def test_funnel_threshold_sweep_monotone_and_consistent(spark):
    d = _docs(spark)
    rows = {r.min_words: r for r in
            curate.funnel_threshold_sweep(d, "text", (10, 30, 100)).collect()}
    assert rows[10].rows_out >= rows[30].rows_out >= rows[100].rows_out
    assert all(r.rows_in == d.count() for r in rows.values())
    # the min_words=30 setting IS the standard funnel's full chain
    funnel = sorted(curate.curation_funnel(d, "text").collect(),
                    key=lambda r: r.stage)
    assert rows[30].rows_out == funnel[-1].rows_out


def test_source_mix_shift_identity_and_shares(spark):
    d = _docs(spark).select("doc_id", "text", "source")
    out = curate.source_mix_shift(d, d, "source").collect()
    assert all(r.share_delta == 0.0 for r in out)
    assert abs(sum(r.share_new for r in out) - 1.0) < 1e-3


def test_pair_jaccard_histogram_hand_pairs(spark):
    pairs = from_rows(
        spark,
        [(1, 2, 0.05), (3, 4, 0.55), (5, 6, 0.58), (7, 8, 1.0)],
        schema="id_a bigint, id_b bigint, jaccard double",
    )
    out = {r.bin_tenths: r.n_pairs for r in
           dedup.pair_jaccard_histogram(pairs).collect()}
    assert out == {0: 1, 5: 2, 10: 1}


def test_sample_rate_certificate_wrapper(spark):
    import __spark_entry__ as E

    rows = E.q_sample_rate_cert(spark, SF).collect()
    for r in rows:
        assert r.eps_95 > 0
        assert r.within_eps == (abs(r.rate - 0.2) <= r.eps_95)


def test_hll_m_sweep_wrapper_err_improves_with_m(spark):
    import __spark_entry__ as E

    rows = {r.m_registers: r for r in
            E.q_hll_m_sweep(spark, "/root/testdata/sf0.01").collect()}
    assert set(rows) == {64, 256, 1024}
    assert all(r.exact_distinct == rows[64].exact_distinct
               for r in rows.values())
    # more registers -> generally tighter; certify the coarse end only
    assert rows[1024].rel_err <= rows[64].rel_err + 0.02


def test_split_fraction_sweep_wrapper_totals(spark):
    import __spark_entry__ as E

    rows = E.q_split_fraction_sweep(spark, SF).collect()
    from collections import defaultdict

    tot = defaultdict(int)
    train = {}
    for r in rows:
        tot[r.train_frac] += r.n_docs
        if r.split == "train":
            train[r.train_frac] = r.n_docs
    n = _docs(spark).count()
    assert all(v == n for v in tot.values())
    assert train[0.8] <= train[0.9] <= train[0.95]


def test_funnel_by_group_matches_global(spark):
    d = _docs(spark)
    per = curate.curation_funnel_by_group(d, "source", "text").collect()
    total_surv = sum(r.n_survivors for r in per)
    funnel = sorted(curate.curation_funnel(d, "text").collect(),
                    key=lambda r: r.stage)
    assert total_surv == funnel[-1].rows_out
    assert sum(r.n_docs for r in per) == d.count()


def test_packing_seqlen_sweep_monotone_waste(spark):
    d = _docs(spark)
    rows = {r.seq_len: r for r in
            curate.packing_seqlen_sweep(d, "text", (256, 512, 1024)).collect()}
    assert rows[256].n_padded <= rows[512].n_padded <= rows[1024].n_padded
    for r in rows.values():
        assert r.n_padded >= r.n_tokens
        assert r.n_padded % r.seq_len == 0  # a sum of seq_len multiples
        assert 0 <= r.waste_rate < 1


def test_unimax_waterfills_capped_surplus(spark):
    # three domains: tiny (caps early), mid (caps after redistribution),
    # big (absorbs the surplus) — the staircase the unroll must walk
    rows = (
        [("tiny", "a b c")] * 2          # 6 tokens, cap 12
        + [("mid", "a b c d e")] * 4     # 20 tokens, cap 40
        + [("big", "a b c d e f g h")] * 50   # 400 tokens, cap 800
    )
    df = from_rows(spark, rows, schema="source string, text string")
    out = {
        r.source: r
        for r in curate.unimax_allocation(
            df, "source", "text", budget_tokens=300, max_epochs=2, rounds=4
        ).collect()
    }
    # share0=100 caps tiny(12) and mid(40); big gets 300-52=248 < 800
    assert out["tiny"].capped and out["tiny"].alloc_tokens == 12.0
    assert out["mid"].capped and out["mid"].alloc_tokens == 40.0
    assert not out["big"].capped and out["big"].alloc_tokens == 248.0
    assert out["tiny"].epochs == 2.0 and out["mid"].epochs == 2.0
    total = sum(r.alloc_tokens for r in out.values())
    assert total == 300.0                      # budget exactly consumed
    # invariant: nobody exceeds their cap
    assert all(r.alloc_tokens <= r.cap_tokens for r in out.values())


def test_unimax_all_capped_leaves_budget_unspent(spark):
    df = from_rows(
        spark, [("a", "x y"), ("b", "x y z")], schema="source string, text string"
    )
    out = curate.unimax_allocation(
        df, "source", "text", budget_tokens=1000, max_epochs=2, rounds=4
    ).collect()
    assert all(r.capped for r in out)
    assert sum(r.alloc_tokens for r in out) == 10.0   # 2*(2+3), not 1000


def test_shard_skew_sweep_conserves_tokens_and_flags_lumping(spark):
    # 63 tiny docs + 1 huge doc: high shard counts cannot dilute the
    # straggler below the huge doc's mass
    rows = [(i, "a b c") for i in range(63)] + [(63, "x " * 5000)]
    df = from_rows(spark, rows, schema="doc_id bigint, text string")
    out = {r.n_shards: r for r in curate.shard_skew_sweep(
        df, "doc_id", "text", (4, 16)).collect()}
    total = 63 * 3 + 5000
    assert all(r.total_tokens == total for r in out.values())
    assert all(r.max_shard_tokens >= 5000 for r in out.values())
    # skew worsens (or holds) as shards grow around a lumped key
    assert out[16].skew >= out[4].skew
    assert all(r.min_shard_tokens >= 1 for r in out.values())


def test_file_layout_planner_identities(spark):
    # 3 docs of 100 bytes in src a, 1 doc of 10 bytes in src b
    rows = [(1, "x" * 100, "a"), (2, "y" * 100, "a"), (3, "z" * 100, "a"),
            (4, "w" * 10, "b")]
    df = from_rows(spark, rows, schema="doc_id bigint, text string, source string")
    out = {(r.target_bytes, r.group): r for r in curate.file_layout_planner(
        df, "source", "text", (128, 1024)).collect()}
    a128 = out[(128, "a")]
    # 300 bytes at a 128-byte target -> 3 files
    assert a128.n_files == 3 and a128.total_bytes == 300 and a128.n_rows == 3
    assert a128.avg_file_bytes == 100.0 and a128.rows_per_file == 1.0
    # a group smaller than the target still emits one file, never zero
    b128 = out[(128, "b")]
    assert b128.n_files == 1 and b128.total_bytes == 10
    # a bigger target never yields more files
    assert out[(1024, "a")].n_files <= a128.n_files


def test_zorder_certificate_textbook_profile(spark):
    """The layout × predicate matrix must show the textbook shape on
    real data: every layout matches the same row counts per
    predicate; the day-sorted layout's day_only pruning beats its
    value_only pruning (which is zero); z-order prunes on BOTH
    single-column predicates; and per-file min/max boxes make
    rows_in_touched >= rows_matched everywhere."""
    t = load_tables(spark, SF)
    out = curate.zorder_skipping_certificate(t["events"]).collect()
    assert len(out) == 12
    by = {(r.layout, r.predicate): r for r in out}
    for pred in ("both", "day_only", "value_only"):
        matched = {r.rows_matched for r in out if r.predicate == pred}
        assert len(matched) == 1  # same predicate, same rows everywhere
        for r in out:
            if r.predicate == pred:
                assert r.rows_in_touched >= r.rows_matched
                assert 0 <= r.files_touched <= r.n_files
    ts = by[("ts_daily", "day_only")]
    assert ts.prune_rate > 0.5
    assert by[("ts_daily", "value_only")].prune_rate == 0.0
    z_day = by[("zorder", "day_only")]
    z_val = by[("zorder", "value_only")]
    assert z_day.prune_rate > 0.0 and z_val.prune_rate > 0.0
    # the box predicate: z-order must beat the natural-id layout
    assert (by[("zorder", "both")].prune_rate
            > by[("id_chunks", "both")].prune_rate)


def test_range_planner_balance_and_boundaries(spark):
    """Uniform values must land near fill_ratio 1 in every range;
    boundaries chain (hi of range i == lo of range i+1); a constant
    column degenerates to one fat range with the rest empty."""
    rows = [(i, float(i % 1000)) for i in range(4000)]
    df = from_rows(spark, rows, schema="event_id bigint, value double")
    out = sorted(curate.range_partition_planner(
        df, "event_id", "value", n_ranges=4, sample_mod=4).collect(),
        key=lambda r: r.range_id)
    assert [r.range_id for r in out] == [0, 1, 2, 3]
    assert sum(r.n_rows for r in out) == 4000
    assert out[0].lo is None and out[-1].hi is None
    for a, b in zip(out, out[1:]):
        assert a.hi == b.lo
    for r in out:
        assert 0.8 <= r.fill_ratio <= 1.2  # uniform -> near-even

    const = from_rows(spark, [(i, 5.0) for i in range(100)],
                      schema="event_id bigint, value double")
    cr = sorted(curate.range_partition_planner(
        const, "event_id", "value", n_ranges=4, sample_mod=2).collect(),
        key=lambda r: r.range_id)
    # all cuts equal 5.0; c < v is false everywhere -> range 0 holds all
    assert cr[0].n_rows == 100 and all(r.n_rows == 0 for r in cr[1:])


def test_mixture_after_dedup_shifts_away_from_clone_heavy_domain(spark):
    """A domain padded with exact clones loses its inflated mass on
    dedup: its weight_after < weight_before, the clean domain gains,
    both weight columns each sum to ~1, and a dup-free corpus shifts
    zero."""
    from fuel_spark.ops.curate import mixture_after_dedup
    from fuel_spark.sources import from_rows

    rows = [(i, "clean", f"unique text number {i} with words") for i in range(10)]
    rows += [(100 + i, "dupey", "the same boilerplate text") for i in range(10)]
    df = from_rows(spark, rows, schema="doc_id bigint, source string, text string")
    got = {r.source: r for r in
           mixture_after_dedup(df, "source", "text").collect()}
    assert got["dupey"].n_docs == 10 and got["dupey"].n_docs_after == 1
    assert got["dupey"].weight_shift < 0 < got["clean"].weight_shift
    assert abs(got["clean"].weight_before + got["dupey"].weight_before - 1.0) < 1e-5
    assert abs(got["clean"].weight_after + got["dupey"].weight_after - 1.0) < 1e-5

    clean_only = df.where(F.col("source") == "clean")
    for r in mixture_after_dedup(clean_only, "source", "text").collect():
        assert r.weight_shift == 0.0 and r.n_docs == r.n_docs_after

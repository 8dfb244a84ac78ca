"""Scale smoke: multiply the sf0.1 tables N× (key-shifted copies) into
a local parquet dataset and time the headline queries against it.

The point is plan behavior under growth — does runtime scale ~linearly
with input (healthy scan-bound plans) or blow up (accidental quadratic
joins / driver materialization)?  Usage:

    python tools/scale_smoke.py [N] [src_sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYED = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHIFT = 10_000_000


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F
    from fuel_spark.session import get_spark
    from fuel_spark.sources import TABLE_NAMES, load_table

    spark = get_spark("scale-smoke", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = tempfile.mkdtemp(prefix="fuel_spark_scale_")
    try:
        for t in TABLE_NAMES:
            df = load_table(spark, src, t)
            if t in KEYED:
                # nation keys must stay in-domain; only surrogate keys shift
                copies = []
                for i in range(n):
                    c = df
                    for k in KEYED[t]:
                        if k in ("c_nationkey", "s_nationkey"):
                            continue
                        c = c.withColumn(k, F.col(k) + F.lit(i * SHIFT))
                    copies.append(c)
                big = copies[0]
                for c in copies[1:]:
                    big = big.unionByName(c)
            else:
                big = df
            big.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))

        qs = entry_mod.queries()
        names = [
            "pricing_summary", "revenue_forecast", "top_revenue_orders",
            "regional_revenue", "events_sessionize", "dedup_exact",
            "dedup_minhash_pairs", "text_quality", "ann_topk_cosine",
            "asof_join", "dedup_ngram_spans", "text_unigram_logprob",
            "events_funnel", "customer_rolling_revenue", "mixture_sample",
            "dedup_decontaminate", "dedup_semantic", "profile_lineitem",
            "check_expectations", "sample_n_per_group", "pack_token_budget",
            "pack_token_budget_local", "text_corpus_stats", "sole_blame_suppliers",
            "min_cost_supplier", "text_chunk_documents", "dedup_containment",
            "ann_pq", "events_range_join", "events_attribution",
            "dedup_segments", "text_dsir_weights", "feature_quantile_bins",
            "text_winnowing", "embedding_pca", "events_key_skew",
            "dedup_fuzzy_join", "text_oov_rate", "events_engagement",
            "embedding_hard_negatives", "embedding_sample_negatives", "events_transitions",
            "events_funnel_windowed", "feature_standardize", "dedup_simhash_pairs",
            "asof_join_forward", "events_attribution_first", "text_c4_filters",
            "text_quality_classifier", "text_lexical_diversity", "documents_length_histogram",
            "embedding_norm_extremes", "events_pareto_share", "events_interarrival",
            "events_hourly_profile", "events_new_vs_returning", "events_type_cooccurrence",
            "customer_ltv_deciles", "shipping_delay_stats", "events_session_stats",
            "events_value_histogram", "events_churn", "basket_part_pairs",
            "revenue_concentration", "dedup_url", "corpus_quality_by_source",
            "text_doc_frequency", "embedding_dim_stats", "events_ab_test",
            "orders_monthly_growth", "events_user_path_topk", "customer_order_gaps",
            "part_price_stats", "dedup_rate_by_source", "text_shingle_uniqueness",
            "embedding_adjacent_cosine", "text_lang_confusion", "scheme_epoch_batches",
            "supplier_balance_tiers", "priority_mix_by_segment", "events_user_anomalies",
            "orders_size_histogram", "text_word_length_hist", "embedding_quantization_error",
            "part_pagerank", "text_quality_model", "events_conversion_lag",
            "customer_order_freq", "events_monthly_type_mix", "discount_revenue_curve",
            "embedding_label_separation", "events_retention_curve", "lineitem_qty_price_corr",
            "text_vocab_coverage", "embedding_centroid_confusion", "customer_balance_ltv_corr",
            "text_bigram_logprob", "embedding_block_profile", "events_dow_hour_heatmap",
            "dedup_pair_quality", "dedup_prefix_groups", "scheme_shards",
            "returns_by_month", "embedding_knn_purity", "dedup_summary",
            "events_gap_histogram", "events_rfm_segments", "supplier_revenue_concentration",
            "dedup_exact_vectors", "events_entry_points", "embedding_norm_by_label",
            "dedup_minhash_calibration", "events_attribution_linear", "events_stickiness",
            "dedup_apply_segments", "text_feature_hashing", "graph_degree_distribution",
            "embedding_matryoshka", "ann_matryoshka", "dedup_apply_keep_longest",
            "dedup_corpus_diff", "sample_weighted", "text_clean",
            "events_daily_ewma", "orders_backlog", "corpus_source_divergence",
            "text_similar_docs", "scheme_curriculum", "check_referential",
            "ann_mmr", "events_attribution_decay", "text_char_entropy",
            "scheme_interleave", "asof_join_nearest", "text_strip_html",
            "events_decompose", "ann_filtered", "pack_concat_sequences",
            "events_chi_square", "events_seasonal_forecast", "feature_winsorize",
            "events_trend_by_type", "events_segment_migration", "customer_cohort_ltv",
            "ann_recall_matryoshka",
            # r5 additions
            "ann_ivf_pivot", "ann_pq_pivot", "dedup_substring_spans",
            "dedup_substring_apply", "text_policy_filters", "text_bpe_encode",
            # r6 additions
            "ann_lsh_pivot", "ann_recall_lsh", "ann_mmr_fixed",
            "dedup_index_compaction", "text_gt_logprob",
            "events_ljung_box", "events_poisson_dispersion",
            "events_value_anova", "shipping_delay_capability",
            "events_welch_weekend", "events_grubbs",
            "orders_priority_trend",
            "events_kruskal_wallis", "events_levene",
            "events_cramers_v", "lineitem_point_biserial",
            "events_theil_sen", "graph_lpa_fixed",
            "events_periodogram", "events_page_hinkley",
            # r7 late additions
            "sketch_kmv_distinct", "sketch_theta_set_ops",
            "linkage_fs_patterns", "linkage_fs_matches",
            "ann_rp_distortion", "mixture_unimax", "sample_priority_certificate",
            "linkage_entity_clusters", "linkage_pipeline", "shard_skew_sweep", "dedup_time_horizon", "ann_rbo_lsh", "events_salted_rollup", "dedup_lsh_scurve",
            "events_session_gap_sweep", "join_broadcast_planner",
            "layout_file_planner", "text_lm_buckets",
            "embedding_centroid_shift", "quality_calibration",
            "sample_kcenter", "layout_zorder_certificate",
            "text_bpe_fertility", "events_salted_join",
            "ann_lsh_pivot_r2", "dedup_keep_best",
            "layout_range_planner", "corpus_compressibility",
            "events_ab_cuped", "events_funnel_window_sweep",
            "events_ab_power_sweep", "dedup_savings_calibration",
            # r8 additions: ANN index lifecycle + snapshot drift +
            # stream resume
            "ann_index_merge_cert", "ann_index_compaction",
            "ann_index_bucket_profile", "ann_incremental_pipeline",
            "ann_recall_after_merge", "embedding_snapshot_diff",
            "embedding_snapshot_drift", "stream_cms_resume",
            "ann_reindex_sweep", "document_snapshot_diff",
            "stream_kmv_resume", "linkage_incremental",
            "ann_planes_sweep", "stream_hll_resume",
            "mixture_after_dedup", "stream_bloom_resume",
            "shard_manifest", "contamination_by_source",
            "dsir_topk_by_source",
        ]
        if len(sys.argv) > 3:
            # explicit subset: smoke only these names (fast re-checks
            # of a new op without the full 90-query sweep)
            names = sys.argv[3].split(",")
        timings = {}
        for name in names:
            # inter-query quiesce (same as bench.py): ~80 queries at 10x
            # accumulate broadcast/cache debris fast enough to OOM the
            # driver heap late in the sweep without it
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            fn = qs[name]
            print(f"smoke: {name} ...", file=sys.stderr, flush=True)

            # honest force, same as bench.py: checksum every output
            # column so nothing can be pruned — a bare count() lets
            # Catalyst ELIDE unique-keyed joins (left join to an
            # aggregate spine) and under-measures such queries by an
            # order of magnitude (bpe_encode read 1.5s by count vs
            # 5.5s honestly at 20x).  count rides along for the row
            # report.
            def run():
                df = fn(spark, out_dir)
                row = df.select(
                    F.count(F.lit(1)).alias("n"),
                    F.bit_xor(F.xxhash64(*df.columns)).alias("chk"),
                ).collect()[0]
                return int(row["n"])

            run()  # warm
            t0 = time.perf_counter()
            cnt = run()
            timings[name] = {"sec": round(time.perf_counter() - t0, 2), "rows": cnt}
            print(
                f"smoke: {name} {timings[name]['sec']}s {cnt} rows",
                file=sys.stderr, flush=True,
            )
        print(json.dumps({"multiplier": n, "src": src, "timings": timings}))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

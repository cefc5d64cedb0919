#!/usr/bin/env python
"""Physical-plan audit → PLANS.md.

For each headline query: count exchanges (shuffles), broadcast joins,
whole-stage-codegen spans, and whether the parquet scans carry pushed
filters — the four properties that decide 100 TB behavior. The point
is a reviewable artifact: "this is the plan we ship, and these are the
scale-relevant facts about it."

Run:  python scripts/explain_audit.py   (writes PLANS.md at repo root)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anomaly_detection_spark.session import get_spark
from anomaly_detection_spark import queries as reg

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

AUDIT_QUERIES = [
    "rule_flags_events",
    "tpch_q1_agg",
    "tpch_q3_top10",
    "tpch_q7_nation_volume",
    "tpch_q18_big_orders",
    "tpch_q19_disjunctive_join",
    "revenue_by_nation",
    "top5_events_per_user",
    "run_length_events",
    "interval_join_error_purchases",
    "gap_fill_daily_series",
    "sliding_window_counts",
    "chunk_documents_overlap",
    "dedup_exact_docs",
    "ngram_jaccard_pairs",
    "cosine_topk_embeddings",
    "rank_family_orders",
    "minhash_near_dups",
    "embedding_near_dups",
    "near_dup_components",
    "tpch_q9_profit_by_nation_year",
    "tpch_q21_sole_late_supplier",
    "pack_documents_contiguous",
    "native_session_windows",
    "decontaminate_docs",
    "hash_split_docs",
    "simhash_portable_docs",
    "repetition_stats_docs",
    "unigram_logprob_docs",
    "redact_pii_docs",
    "tfidf_top_terms",
    "cluster_assign_embeddings",
    "boilerplate_ngrams",
    "curated_corpus",
    "incremental_dedup_docs",
    "trend_per_user",
    "psi_drift_events",
    "duplicate_passages",
    "time_weighted_avg_user",
    "ewma_events",
    "forecast_error_mase_user",
    "funnel_conversion_steps",
    "cohort_retention_events",
    "rolling_median_hampel",
    "cusum_shift_events",
    "semantic_dedup_embeddings",
    "pq_topk_embeddings",
    "heavy_hitter_words",
    "bloom_pruned_join",
    "mixture_sample_docs",
    "editdist_near_dups",
    "incremental_agg_events",
    "variant_props_stats",
    "shard_corpus_docs",
    "frame_sample_media",
    "ks_drift_events",
    "benford_digit_audit",
    "ann_recall_eval",
    "incremental_distinct_users",
    "ohlc_bars_events",
    "sliding_distinct_users",
    "quality_topp_docs",
    "recursive_dup_closure",
    "lateral_top2_orders",
    "funnel_time_bounded",
    "iqr_flags_events",
    "dow_baseline_flags",
    "changepoint_argmax_user",
    "char_entropy_docs",
    "robust_z_events",
    "anomaly_ensemble_events",
    "session_paths_events",
    "markov_transitions_events",
    "dup_family_keep_best",
    "winsorize_events",
    "holt_smoothing_user",
    "term_cooccurrence_lift",
    "novelty_curve_docs",
    "textrank_keywords",
    "containment_rare_gram",
    "simhash_hamming_pairs",
    "hard_negatives_embeddings",
    "k_anonymity_audit",
    "cdc_apply_lineitem",
    "attribution_last_touch",
    "rolling_corr_events",
    "dup_graph_triangles",
    "profile_columns_events",
    "quantize_embeddings_int8",
    "trimmed_mean_events",
    "peak_detection_events",
    "salted_agg_events",
    "salted_join_orders",
    "asof_cogrouped_error_purchase",
    # round 3 additions
    "session_histogram_batch",
    "bm25_topk_docs",
    "dup_span_grams",
    "gopher_quality_docs",
    "scd2_user_state",
    "equi_depth_value_buckets",
    "daily_distinct_sketch",
    "skyline_value_recency",
    "weighted_sample_docs",
    "cms_word_frequency",
    "incremental_join_orders",
    "phrase_match_docs",
    "chi_square_drift_events",
    "ab_test_lift_events",
    "interval_union_time_user",
    "map_functions_per_user",
    "hll_overlap_segments",
    # round 4 additions
    "ppjoin_jaccard_pairs",
    "hierarchical_rollup_events",
    "spatial_neighbor_counts",
    "leakage_safe_split",
    "sequential_patterns_events",
    "unicode_clean_docs",
    "jaro_winkler_parts",
    "kaplan_meier_conversion",
    "wasserstein_value_drift",
    "zipf_heaps_corpus",
    "stratified_kfold_docs",
    "evt_pot_tail_fit",
    "simpsons_paradox_audit",
    "wilson_ci_event_types",
    "dickey_fuller_users",
    "join_size_estimate_cms",
    "dtw_distance_users",
    "hits_user_type_engagement",
    "sax_symbols_users",
    "borda_consensus_docs",
    "rrf_hybrid_retrieval",
    "viterbi_burst_users",
    "bh_fdr_user_anomalies",
    "kaplan_meier_conversion",
    "wasserstein_value_drift",
    "zipf_heaps_corpus",
    "stratified_kfold_docs",
    "evt_pot_tail_fit",
    "simpsons_paradox_audit",
    "wilson_ci_event_types",
    "dickey_fuller_users",
    # round 3 batches 2-4
    "window_function_suite",
    "full_outer_reconciliation",
    "asof_forward_tolerance",
    "activity_bitmap_user",
    "numeric_functions_suite",
    "record_linkage_parts",
    "normalized_exact_dedup",
    "pagerank_dup_graph",
    "embedding_covariance_top",
    "pca_project_embeddings",
    "rolling_slope_events",
    "sparse_cosine_pairs",
    "graph_common_neighbors",
    "mode_median_by_type",
    # round 3 batches 5-7
    "pit_join_purchase_state",
    "theilsen_slope_user",
    "referential_integrity_audit",
    "running_balance_resets",
    "throttle_dedup_hourly",
    "key_skew_profiler",
    "attribution_linear_touch",
    "share_of_total_by_type",
    "pythagorean_means_by_type",
    # round 3 batches 8-9
    "growth_accounting_daily",
    "weighted_median_lineitem",
    "table_fingerprint_daily",
    "skipgram_pairs_docs",
    "decile_lift_table",
    "isotonic_fit_user",
    "mann_whitney_drift",
    "cross_correlation_lags",
    "feature_hashing_docs",
    "ols_fit_user",
    "period_over_period_revenue",
    "hll_reagg_weekly",
    "order_lifecycle_durations",
    "k_of_n_alerts",
    "quantile_normalize_values",
    "session_association_rules",
    "clustering_coefficient_docs",
    "sorted_neighborhood_parts",
    "next_higher_spend_user",
    "ppjoin_jaccard_pairs",
    "latest_value_percentile",
    "sweepline_peak_concurrency",
    "largest_remainder_allocation",
    "linear_interpolation_grid",
]


def audit(plan: str) -> dict[str, object]:
    # count only shuffle exchanges, not broadcast exchanges / reuses
    shuffles = len(re.findall(r"\bExchange (?:hash|range|Single)", plan))
    return {
        "shuffles": shuffles,
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("NestedLoop") + plan.count("CartesianProduct"),
        # codegen spans appear as `*(N) Operator` prefixes in the plan tree
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]+\]", plan)),
        "python_stages": plan.count("ArrowEvalPython")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("MapInPandas"),
    }


def main() -> None:
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    # Audit the STATIC plan: with AQE on, codegen/broadcast decisions are
    # deferred into runtime query stages and the printed plan under-reports
    # them ("Found 0 WholeStageCodegen subtrees" pre-execution). The static
    # plan is also the honest 100 TB picture — AQE only improves on it.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    lines = [
        "# PLANS — physical-plan audit of the headline queries",
        "",
        f"Generated by `scripts/explain_audit.py` at sf_dir=`{SF_DIR}` "
        "over the STATIC physical plan (AQE disabled for the audit; at",
        "runtime AQE only improves on these shapes — coalescing shuffles,",
        "upgrading joins to broadcast, splitting skewed partitions).",
        "",
        "Scale-relevant counters per query: shuffle exchanges, join",
        "strategies, whole-stage-codegen spans, parquet filter pushdown,",
        "Python (Arrow) stages. Invariants the test suite enforces:",
        "no accidental NestedLoop/Cartesian joins (the one by-design case",
        "is brute-force cosine top-k, which IS a broadcast cross product —",
        "its scale path is `ivf_topk`/`lsh_ann_topk`); the flags pipeline",
        "is exactly one shuffle; bucketed joins eliminate their exchange.",
        "",
        "| query | shuffles | bcast joins | SMJ | NLJ | codegen spans | pushdown | py stages |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name in AUDIT_QUERIES:
        df = reg.QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        a = audit(plan)
        lines.append(
            f"| `{name}` | {a['shuffles']} | {a['broadcast_joins']} | "
            f"{a['sortmerge_joins']} | {a['nested_loop_joins']} | "
            f"{a['codegen_spans']} | {'✓' if a['pushed_filters'] else '—'} | "
            f"{a['python_stages']} |"
        )
        print(name, a, file=sys.stderr)
    lines += [
        "",
        "Notes:",
        "- `rule_flags_events`: the entire 26-column flags pipeline runs",
        "  after ONE hash exchange on the series key; every window reuses",
        "  that partitioning (the W11 segment window is a refinement).",
        "- Joins to dims are broadcast by hint; AQE picks broadcast for",
        "  small filtered sides at bench scale and falls back to",
        "  shuffle joins beyond the threshold — no plan rewrite needed at",
        "  100 TB.",
        "- `interval_join_error_purchases` proves the bucketed range join",
        "  stays an equi hash join (NLJ column is 0 by construction).",
        "- Python stages appear only where semantics require them (STL,",
        "  MinHash signature kernel, multimodal decode) — always",
        "  Arrow-batched, never row-at-a-time.",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()

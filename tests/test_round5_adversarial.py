"""Adversarial-shape differentials for round-5 operators: run the REAL
driver comparison (tests.oracle_check.compare) on synthetic fixtures
engineered for the edge cases the sf fixtures don't hit — value ties
everywhere, constant series, minimum-length users, and a >64-token
vocabulary that forces PPJoin onto its full prefix-filter path instead
of the bitmask fast path."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from anomaly_detection_spark import queries as reg
from tests.oracle_check import compare

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _d(days, minutes=0):
    return BASE + dt.timedelta(days=days, minutes=minutes)


def _write(spark, d, name, rows, schema):
    t = spark.createDataFrame(rows, schema)
    pq.write_table(
        pa.Table.from_pandas(t.toPandas()), os.path.join(d, f"{name}.parquet")
    )


def _adversarial_events_dir(spark):
    """Ties on every value, one constant-value user, one minimum-length
    user, bursty and regular users, purchases and signups."""
    from pyspark.sql import functions as F

    rows = []
    eid = 0
    # user 1: constant value (sigma = 0 paths), 20 days
    for i in range(20):
        eid += 1
        rows.append((1, eid, _d(i), "view", 7.0))
    # user 2: heavy ties (only two distinct values), 20 days
    for i in range(20):
        eid += 1
        rows.append((2, eid, _d(i), "click", 5.0 if i % 2 else 9.0))
    # user 3: minimum viable series (5 days)
    for i in range(5):
        eid += 1
        rows.append((3, eid, _d(i), "view", float(i + 1)))
    # user 4: signup -> purchases (survival/attribution paths)
    eid += 1
    rows.append((4, eid, _d(0), "signup", 1.0))
    for i in range(1, 16):
        eid += 1
        rows.append((4, eid, _d(i), "purchase", 10.0 + (i % 3)))
    # user 5: signup, never converts (censoring path)
    eid += 1
    rows.append((5, eid, _d(0), "signup", 1.0))
    for i in range(1, 16):
        eid += 1
        rows.append((5, eid, _d(i), "error", 2.5))
    d = tempfile.mkdtemp()
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    pq.write_table(
        pa.Table.from_pandas(ev.toPandas()), os.path.join(d, "events.parquet")
    )
    return d


ADVERSARIAL_EVENT_QUERIES = [
    "stl_iqr_events",
    "shesd_anomalies_events",
    "holt_winters_user",
    "binseg_changepoints_user",
    "page_hinkley_users",
    "conformal_interval_events",
    "hodges_lehmann_user",
    "rfm_segments_users",
    "nelson_aalen_conversion",
    "logrank_test_conversion",
    "cohort_ltv_daily",
    "attribution_time_decay",
    "croston_demand_user",
    "ljung_box_users",
    "kruskal_wallis_types",
    "fano_factor_users",
    "diff_in_diff_events",
    "cuped_adjusted_lift",
    "mutual_information_type_value",
    "decision_stump_events",
    "theta_sketch_users",
    "hbos_outlier_events",
    "negbin_dispersion_types",
    "gumbel_block_maxima",
    # -- round-6 extension (verdict item 6): every statistical query
    # with a degenerate regime (zero variance, all-ties, single-row
    # groups, censored tails) through the REAL compare --
    "wilson_ci_event_types",
    "dickey_fuller_users",
    "markov_stationary_types",
    "markov_entropy_users",
    "hazard_rate_conversion",
    "lorenz_curve_users",
    "wasserstein_value_drift",
    "evt_pot_tail_fit",
    "simpsons_paradox_audit",
    "bh_fdr_user_anomalies",
    "viterbi_burst_users",
    "sax_symbols_users",
    "hill_tail_index_events",
    "bootstrap_mean_ci_events",
    "dtw_distance_users",
    "hits_user_type_engagement",
    "kaplan_meier_conversion",
    "markov_removal_attribution",
    "streaming_left_interval_join_events",
    "streaming_session_histogram_events",
    "streaming_cdc_state_events",
    "benford_digit_audit",
    "jensen_shannon_types",
    "welch_t_drift_types",
    "eb_shrunk_conversion_users",
    "sprt_conversion_users",
    "kendall_tau_users",
    "cochran_armitage_trend",
    "forecast_error_mase_user",
]


def test_adversarial_events_differentials(spark):
    d = _adversarial_events_dir(spark)
    fails = {}
    for name in ADVERSARIAL_EVENT_QUERIES:
        try:
            problems = compare(
                reg.QUERIES[name](spark, d), reg.ORACLES[name], d
            )
        except Exception as exc:  # crash = red
            problems = [repr(exc)[:200]]
        if problems:
            fails[name] = problems
    assert not fails, fails


def _adversarial_documents_dir(spark):
    """Degenerate document shapes: empty text, single word, one word
    repeated (zero entropy), an exact-duplicate family, whitespace-only,
    unicode confusables, and a long doc — the regimes sf corpora and
    their Zipf tails never pin down."""
    docs = [
        (1, "", "en", 0, "s"),
        (2, "word", "en", 4, "s"),
        (3, "same same same same same same same same", "en", 39, "s"),
        (4, "alpha beta gamma delta epsilon", "en", 30, "s"),
        (5, "alpha beta gamma delta epsilon", "en", 30, "s"),  # exact dup
        (6, "alpha beta gamma delta epsilon", "en", 30, "s"),  # exact dup
        (7, "   ", "en", 3, "s"),
        (8, "Ω≈ç√∫ µ≤≥ ÷ Ω≈ç√∫", "xx", 17, "s"),
        (9, " ".join(f"tok{i % 11}" for i in range(400)), "en", 2000, "s"),
        (10, "One sentence. Two sentences here! And a third?", "en", 46, "s"),
    ]
    d = tempfile.mkdtemp()
    _write(spark, d, "documents",
           docs, "doc_id long, text string, lang string, n_chars long, "
                 "source string")
    return d


ADVERSARIAL_DOCUMENT_QUERIES = [
    "readability_docs",
    "good_turing_vocab",
    "zipf_heaps_corpus",
    "gtest_collocations",
    "borda_consensus_docs",
    "brier_calibration_docs",
    "roc_points_quality",
    "woe_iv_quality_bins",
    "png_roundtrip_media",
    "auc_quality_classifier",
]


def test_adversarial_documents_differentials(spark):
    d = _adversarial_documents_dir(spark)
    fails = {}
    for name in ADVERSARIAL_DOCUMENT_QUERIES:
        try:
            problems = compare(
                reg.QUERIES[name](spark, d), reg.ORACLES[name], d
            )
        except Exception as exc:  # crash = red
            problems = [repr(exc)[:200]]
        if problems:
            fails[name] = problems
    assert not fails, fails


def test_ppjoin_full_prefix_path_above_64_tokens(spark, monkeypatch):
    # force the Xiao prefix/length/positional stack by zeroing the
    # bitset budget — the prefix path must stay oracle-exact on its own
    monkeypatch.setattr(reg, "PPJOIN_BITSET_BUDGET", 0)
    vocab = [f"tok{i:03d}" for i in range(120)]
    docs = []
    for i in range(40):
        words = [vocab[(i * 7 + j) % 120] for j in range(30)]
        docs.append((i, " ".join(words), "en", 200, "s"))
        if i % 8 == 0:  # near copy: drop one word
            docs.append((1000 + i, " ".join(words[:-1]), "en", 195, "s"))
    d = tempfile.mkdtemp()
    _write(spark, d, "documents",
           docs, "doc_id long, text string, lang string, n_chars long, "
                 "source string")
    problems = compare(
        reg.QUERIES["ppjoin_jaccard_pairs"](spark, d),
        reg.ORACLES["ppjoin_jaccard_pairs"], d,
    )
    assert not problems, problems


def test_ppjoin_multiword_bitset_path(spark):
    # vocab > 64 but n_sets^2*W under budget: the MULTIWORD bitset path
    vocab = [f"tok{i:03d}" for i in range(120)]
    docs = []
    for i in range(40):
        words = [vocab[(i * 7 + j) % 120] for j in range(30)]
        docs.append((i, " ".join(words), "en", 200, "s"))
        if i % 8 == 0:
            docs.append((1000 + i, " ".join(words[:-1]), "en", 195, "s"))
    d = tempfile.mkdtemp()
    _write(spark, d, "documents",
           docs, "doc_id long, text string, lang string, n_chars long, "
                 "source string")
    assert not compare(
        reg.QUERIES["ppjoin_jaccard_pairs"](spark, d),
        reg.ORACLES["ppjoin_jaccard_pairs"], d,
    )


def _adversarial_embeddings_dir(spark):
    """Degenerate vector shapes over the real 64-dim schema: an all-zero
    vector (undefined cosine), exact duplicates, a 2x-scaled copy
    (cosine exactly 1), a negated copy (cosine exactly -1), one-hot
    basis vectors, and a constant vector — the norms/denominators the
    sf fixtures never push to the boundary."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []

    def add(vid, vec, label):
        rows.append((vid, [float(x) for x in vec], label))

    base = rng.normal(size=(8, 64)).astype("float32")
    for i in range(8):
        add(i, base[i], i % 3)
    add(100, np.zeros(64), 0)                 # zero vector
    add(101, base[0], 1)                      # exact duplicate of 0
    add(102, base[1] * 2.0, 2)                # scaled copy: cosine == 1
    add(103, -base[2], 0)                     # negated: cosine == -1
    onehot = np.zeros(64); onehot[5] = 1.0
    add(104, onehot, 1)                       # one-hot basis
    add(105, np.full(64, 0.25), 2)            # constant vector
    add(106, np.full(64, 1e-8), 0)            # denormal-ish norms
    d = tempfile.mkdtemp()
    t = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    pq.write_table(
        pa.Table.from_pandas(t.toPandas()),
        os.path.join(d, "embeddings.parquet"),
    )
    return d


ADVERSARIAL_EMBEDDING_QUERIES = [
    "embedding_norms_by_label",
    "cosine_topk_embeddings",
    "embedding_near_dups",
    "semantic_dedup_embeddings",
    "quantize_embeddings_int8",
    "embedding_covariance_top",
    "pca_project_embeddings",
    "spatial_neighbor_counts",
    "cluster_assign_embeddings",
    "hard_negatives_embeddings",
    "lsh_ann_topk",
    "ivf_topk_embeddings",
    "pq_topk_embeddings",
    "mmr_select_embeddings",
    "cluster_balanced_sample",
    # ann_recall_eval is EXCLUDED: its recall_8t3p >= 0.3 floor is a
    # data-dependent contract calibrated to the sf corpus (its own
    # docstring says so), not a theorem — on 15 near-random vectors the
    # floor legitimately fails.  Its zero-vector robustness is still
    # covered: the operator shares nonzero_vectors + brute_force_topk /
    # lsh_ann_topk with the queries above, and the crash fix is
    # regression-tested through them.
]


def test_adversarial_embeddings_differentials(spark):
    d = _adversarial_embeddings_dir(spark)
    fails = {}
    for name in ADVERSARIAL_EMBEDDING_QUERIES:
        try:
            problems = compare(
                reg.QUERIES[name](spark, d), reg.ORACLES[name], d
            )
        except Exception as exc:  # crash = red
            problems = [repr(exc)[:200]]
        if problems:
            fails[name] = problems
    assert not fails, fails


def _adversarial_parts_dir(spark):
    """Degenerate part names: empty, whitespace, single char, unicode,
    an identical-name family, near-identical long names."""
    rows = [
        (1, "", "Brand#1", "SMALL PLATED TIN", 1, 100.0),
        (2, " ", "Brand#1", "SMALL PLATED TIN", 1, 100.5),
        (3, "x", "Brand#2", "LARGE BRUSHED COPPER", 2, 200.0),
        (4, "ivory chocolate navy linen sky", "Brand#2",
         "LARGE BRUSHED COPPER", 3, 300.0),
        (5, "ivory chocolate navy linen sky", "Brand#3",
         "MEDIUM ANODIZED STEEL", 4, 301.0),
        (6, "ivory chocolate navy linen sea", "Brand#3",
         "MEDIUM ANODIZED STEEL", 5, 302.0),
        (7, "Ωmega çedilla ünïcode pärt", "Brand#4",
         "STANDARD POLISHED BRASS", 6, 400.0),
        (8, "a" * 80, "Brand#4", "STANDARD POLISHED BRASS", 7, 500.0),
        (9, "a" * 79 + "b", "Brand#5", "ECONOMY BURNISHED NICKEL",
         8, 501.0),
        (10, "x", "Brand#5", "ECONOMY BURNISHED NICKEL", 9, 502.0),
    ]
    d = tempfile.mkdtemp()
    t = spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string, "
              "p_type string, p_size int, p_retailprice double",
    )
    pq.write_table(
        pa.Table.from_pandas(t.toPandas()), os.path.join(d, "part.parquet")
    )
    return d


ADVERSARIAL_PART_QUERIES = [
    "jaro_winkler_parts",
    "record_linkage_parts",
    "sorted_neighborhood_parts",
]


def test_adversarial_parts_differentials(spark):
    d = _adversarial_parts_dir(spark)
    fails = {}
    for name in ADVERSARIAL_PART_QUERIES:
        try:
            problems = compare(
                reg.QUERIES[name](spark, d), reg.ORACLES[name], d
            )
        except Exception as exc:  # crash = red
            problems = [repr(exc)[:200]]
        if problems:
            fails[name] = problems
    assert not fails, fails

"""Round-7 session-2 operator laws: every operator added in this
session gets a CLOSED-FORM fixture (hand-derivable exact values) plus
the REAL oracle compare on the same fixture — the driver's gate in
miniature.  Covers: runs test, McNemar, Spearman, ANOVA,
Brown-Forsythe, matrix-profile discord, burstiness-memory, padding
efficiency, LOF, PACF, Cramér's V, Pettitt, k-means Lloyd step,
Granger, ICSS, Cook's distance, Ansari-Bradley, Little's law,
capture-recapture, IPF raking, DAU/WAU, TwoNN, max drawdown, peak
prominence, trapezoid integral, Aalen-Johansen, Wilcoxon signed-rank,
circular hour stats, Deming/TLS, assortativity, Cochran's Q, RDD,
term burstiness, MCF, Moran's I, Jonckheere-Terpstra, partial
correlation, and kNN hubness."""

from __future__ import annotations

import datetime as dt
import math
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from anomaly_detection_spark import queries as reg
from tests.oracle_check import compare

BASE = dt.datetime(2024, 1, 1)


def _events_dir(spark, per_user):
    from pyspark.sql import functions as F

    rows = []
    eid = 0
    for uid, values in per_user.items():
        for i, v in enumerate(values):
            eid += 1
            rows.append((uid, eid, BASE + dt.timedelta(days=i), "view",
                         float(v)))
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


def test_runs_test_alternating_and_clustered_closed_form(spark):
    # alternating 1,9,1,9,... (10 values): median2 = 1+9 = 10 so every
    # value is off-median; runs = 10 (max), n1 = n2 = 5.
    # clustered 1x5 then 9x5: runs = 2 (min).
    # Z = (R - 6) / sqrt(2*5*5*(2*5*5-10) / (100*9)) = (R-6)/sqrt(40/9)
    d = _events_dir(spark, {
        1: [1, 9] * 5,
        2: [1] * 5 + [9] * 5,
        3: [7] * 12,            # constant: all values tie the median
    })
    out = {r["user_id"]: r for r in
           reg.QUERIES["runs_test_users"](spark, d).collect()}
    sd = math.sqrt(2 * 5 * 5 * (2 * 5 * 5 - 10) / (100.0 * 9))
    assert out[1]["runs"] == 10 and out[1]["n1"] == 5 and out[1]["n2"] == 5
    assert out[1]["z_runs"] == round((10 - 6) / sd, 6)
    assert out[2]["runs"] == 2
    assert out[2]["z_runs"] == round((2 - 6) / sd, 6)
    # constant series: every value equals the median -> nothing to test
    assert out[3]["n_used"] == 0 and out[3]["z_runs"] is None
    assert not compare(reg.QUERIES["runs_test_users"](spark, d),
                       reg.ORACLES["runs_test_users"], d)


def test_runs_test_even_split_median(spark):
    # 10 values 1..10: med2 = v[5]+v[6] = 11, no value satisfies
    # 2v = 11 (odd), so all 10 survive; monotone series -> 2 runs.
    d = _events_dir(spark, {1: list(range(1, 11))})
    row = reg.QUERIES["runs_test_users"](spark, d).collect()[0]
    assert row["n_used"] == 10 and row["runs"] == 2
    assert not compare(reg.QUERIES["runs_test_users"](spark, d),
                       reg.ORACLES["runs_test_users"], d)


def test_anova_identical_groups_zero_between(spark):
    # two types with IDENTICAL value multisets: SSB = 0 exactly, F = 0
    d = _events_dir(spark, {1: [1, 2, 3, 4], 2: [5, 6, 7, 8]})
    # rewrite types so user 1 -> 'a', user 2 -> 'b' with the same values
    import os
    import pyarrow.parquet as pq2
    t = pq2.read_table(os.path.join(d, "events.parquet")).to_pandas()
    t["event_type"] = ["a", "a", "b", "b", "a", "a", "b", "b"]
    t["value"] = [1.0, 2.0, 1.0, 2.0, 3.0, 4.0, 3.0, 4.0]
    pq.write_table(pa.Table.from_pandas(t), os.path.join(d, "events.parquet"))
    row = reg.QUERIES["anova_f_value_types"](spark, d).collect()[0]
    assert row["ssb_c2"] == 0 and row["f_ppm"] == 0
    assert row["eta2_ppm"] == 0
    assert not compare(reg.QUERIES["anova_f_value_types"](spark, d),
                       reg.ORACLES["anova_f_value_types"], d)
    # Brown-Forsythe on the same data: identical spreads -> W = 0
    bf = reg.QUERIES["brown_forsythe_types"](spark, d).collect()[0]
    assert bf["ssb_z2"] == 0 and bf["w_ppm"] == 0
    assert not compare(reg.QUERIES["brown_forsythe_types"](spark, d),
                       reg.ORACLES["brown_forsythe_types"], d)


def test_anova_constant_within_groups_null_f(spark):
    # constant value inside each type but different across types:
    # SSW = 0 -> F guard yields NULL, eta2 = 1e6
    d = _events_dir(spark, {1: [5, 5, 5], 2: [9, 9, 9]})
    import os
    t = pq.read_table(os.path.join(d, "events.parquet")).to_pandas()
    t["event_type"] = ["a"] * 3 + ["b"] * 3
    pq.write_table(pa.Table.from_pandas(t), os.path.join(d, "events.parquet"))
    row = reg.QUERIES["anova_f_value_types"](spark, d).collect()[0]
    assert row["ssw_c2"] == 0 and row["f_ppm"] is None
    assert row["eta2_ppm"] == 1000000
    assert not compare(reg.QUERIES["anova_f_value_types"](spark, d),
                       reg.ORACLES["anova_f_value_types"], d)


def test_spearman_perfect_monotone_is_one(spark):
    import tempfile

    docs = [
        (1, "a", ),
        (2, "a b"),
        (3, "a b c"),
        (4, "a b c d"),
    ]
    d = tempfile.mkdtemp()
    t = spark.createDataFrame(
        [(i, s, "en", len(s), "s") for i, s in docs],
        "doc_id long, text string, lang string, n_chars long, source string",
    )
    pq.write_table(pa.Table.from_pandas(t.toPandas()),
                   os.path.join(d, "documents.parquet"))
    row = reg.QUERIES["spearman_tokens_docs"](spark, d).collect()[0]
    # all tokens distinct per doc: x == y, rho = +1 exactly
    assert row["rho_ppm"] == 1000000
    assert not compare(reg.QUERIES["spearman_tokens_docs"](spark, d),
                       reg.ORACLES["spearman_tokens_docs"], d)


def test_discord_planted_spike(spark):
    # constant series with one spike at position 8: every subsequence
    # window overlapping the spike is far from all non-overlapping
    # windows -> the discord must cover index 8 (subsequence i in 5..8)
    vals = [1.0] * 16
    vals[7] = 100.0  # 1-based position 8
    d = _events_dir(spark, {1: vals, 2: [3.0] * 16})
    out = {r["user_id"]: r for r in
           reg.QUERIES["discord_matrix_profile_users"](spark, d).collect()}
    assert 5 <= out[1]["discord_idx"] <= 8
    assert out[1]["discord_d2"] > 0 and out[1]["motif_d2"] == 0
    # constant series: all pairwise distances exactly zero
    assert out[2]["discord_d2"] == 0 and out[2]["discord_idx"] == 1
    assert not compare(
        reg.QUERIES["discord_matrix_profile_users"](spark, d),
        reg.ORACLES["discord_matrix_profile_users"], d)


def test_burstiness_periodic_is_minus_one(spark):
    # user 1: perfectly periodic daily gaps -> sigma = 0 -> B = -1,
    # M undefined (zero gap variance).  user 2: alternating short/long
    # gaps -> anticorrelated consecutive gaps, M < 0.
    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for i in range(14):
        eid += 1
        rows.append((1, eid, base + dt.timedelta(days=i), "view", 1.0))
    t = base
    for i in range(14):
        eid += 1
        t = t + dt.timedelta(hours=1 if i % 2 else 47)
        rows.append((2, eid, t, "view", 1.0))
    import tempfile
    from pyspark.sql import functions as F

    d = tempfile.mkdtemp()
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    pq.write_table(pa.Table.from_pandas(ev.toPandas()),
                   os.path.join(d, "events.parquet"))
    out = {r["user_id"]: r for r in
           reg.QUERIES["burstiness_memory_users"](spark, d).collect()}
    assert out[1]["b_ppm"] == -1000000 and out[1]["m_ppm"] is None
    assert out[2]["b_ppm"] > 0 and out[2]["m_ppm"] < -900000
    assert not compare(reg.QUERIES["burstiness_memory_users"](spark, d),
                       reg.ORACLES["burstiness_memory_users"], d)


def test_padding_efficiency_exact_buckets(spark):
    import tempfile

    docs = [(1, "a b c d e"), (2, "a b c d e f g h"), (3, ""), (4, "x")]
    d = tempfile.mkdtemp()
    t = spark.createDataFrame(
        [(i, s, "en", len(s), "s") for i, s in docs],
        "doc_id long, text string, lang string, n_chars long, source string",
    )
    pq.write_table(pa.Table.from_pandas(t.toPandas()),
                   os.path.join(d, "documents.parquet"))
    out = {r["bucket_max"]: r for r in
           reg.QUERIES["padding_efficiency_buckets"](spark, d).collect()}
    # 5 tokens -> bucket 8 (pad 3); 8 tokens -> bucket 8 (pad 0);
    # empty and single-token docs clamp to n_tok >= 1 -> bucket 1
    assert out[8]["n_docs"] == 2 and out[8]["pad_tokens"] == 3
    assert out[8]["efficiency_ppm"] == 13 * 1000000 // 16
    assert out[1]["n_docs"] == 2 and out[1]["pad_tokens"] == 0
    assert out[1]["efficiency_ppm"] == 1000000
    assert not compare(reg.QUERIES["padding_efficiency_buckets"](spark, d),
                       reg.ORACLES["padding_efficiency_buckets"], d)


def test_lof_planted_density_outlier(spark):
    import tempfile

    import numpy as np

    # one centroid (vec_id 0); ten tight vectors around [1, 0, 0, ...]
    # (tiny deterministic wiggle so distances are nonzero); one planted
    # outlier pointing well away but still assigned to the only cell.
    rng = []
    dim = 8
    base = np.zeros(dim); base[0] = 1.0
    rows = [(0, [float(x) for x in base], "c")]
    for i in range(10, 20):
        v = base.copy()
        v[1] = 0.001 * (i - 9)     # distinct near-duplicates
        rows.append((i, [float(x) for x in v], "in"))
    out_v = np.zeros(dim); out_v[0] = 1.0; out_v[2] = 1.0  # 45 degrees
    rows.append((20, [float(x) for x in out_v], "out"))
    d = tempfile.mkdtemp()
    t = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    pq.write_table(pa.Table.from_pandas(t.toPandas()),
                   os.path.join(d, "embeddings.parquet"))
    res = {r["vec_id"]: r for r in
           reg.QUERIES["lof_embeddings"](spark, d).collect()}
    inlier_max = max(res[i]["lof_ppm"] for i in range(10, 20))
    assert res[20]["lof_ppm"] > 3 * inlier_max > 0
    assert not compare(reg.QUERIES["lof_embeddings"](spark, d),
                       reg.ORACLES["lof_embeddings"], d)


def test_pacf_constant_and_alternating(spark):
    d = _events_dir(spark, {
        1: [7.0] * 12,          # constant: a0 = 0 -> all NULL
        2: [1.0, 9.0] * 8,      # alternating: r1 near -1
    })
    out = {r["user_id"]: r for r in
           reg.QUERIES["pacf_lag2_users"](spark, d).collect()}
    assert out[1]["r1_ppm"] is None and out[1]["phi22_ppm"] is None
    assert out[2]["r1_ppm"] < -800000 and out[2]["r2_ppm"] > 700000
    assert not compare(reg.QUERIES["pacf_lag2_users"](spark, d),
                       reg.ORACLES["pacf_lag2_users"], d)


def test_cramers_v_independence_and_perfect(spark):
    import tempfile
    from pyspark.sql import functions as F

    # 2024-01-01 is a Monday.  Independent block: each type appears
    # the same number of times on each of two weekdays -> V = 0.
    rows, eid = [], 0
    for ty in ("a", "b"):
        for day in (0, 1):
            for _ in range(3):
                eid += 1
                rows.append((1, eid, BASE + dt.timedelta(days=day),
                             ty, 1.0))
    d = tempfile.mkdtemp()
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    pq.write_table(pa.Table.from_pandas(ev.toPandas()),
                   os.path.join(d, "events.parquet"))
    row = reg.QUERIES["cramers_v_type_weekday"](spark, d).collect()[0]
    assert row["chi2_fp"] == 0 and row["v_ppm"] == 0
    assert not compare(reg.QUERIES["cramers_v_type_weekday"](spark, d),
                       reg.ORACLES["cramers_v_type_weekday"], d)

    # perfect association: each type pinned to its own weekday -> V = 1
    rows2 = [(1, i + 1, BASE + dt.timedelta(days=i % 2),
              "a" if i % 2 == 0 else "b", 1.0) for i in range(12)]
    d2 = tempfile.mkdtemp()
    ev2 = spark.createDataFrame(
        rows2,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    pq.write_table(pa.Table.from_pandas(ev2.toPandas()),
                   os.path.join(d2, "events.parquet"))
    row2 = reg.QUERIES["cramers_v_type_weekday"](spark, d2).collect()[0]
    assert row2["v_ppm"] == 1000000
    assert not compare(reg.QUERIES["cramers_v_type_weekday"](spark, d2),
                       reg.ORACLES["cramers_v_type_weekday"], d2)


def test_pettitt_planted_shift(spark):
    # level shift exactly after position 10: U_t peaks at t = 10 with
    # K = 10*10 (every pre-shift value below every post-shift value)
    d = _events_dir(spark, {1: [1.0] * 10 + [9.0] * 10,
                            2: [5.0] * 15})
    out = {r["user_id"]: r for r in
           reg.QUERIES["pettitt_changepoint_users"](spark, d).collect()}
    assert out[1]["change_t"] == 10 and out[1]["k_stat"] == 100
    # constant series: U_t = 0 everywhere, argmax ties -> t = 1
    assert out[2]["k_stat"] == 0 and out[2]["change_t"] == 1
    assert not compare(
        reg.QUERIES["pettitt_changepoint_users"](spark, d),
        reg.ORACLES["pettitt_changepoint_users"], d)


def test_kmeans_update_fixed_point_and_pull(spark):
    import tempfile

    # cluster 0's members sit exactly ON the centroid -> zero shift;
    # cluster 1 has one member pulled away -> positive shift
    dim = 4
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], "c"),
        (1, [0.0, 1.0, 0.0, 0.0], "c"),
        (10, [1.0, 0.0, 0.0, 0.0], "m"),
        (11, [1.0, 0.0, 0.0, 0.0], "m"),
        (12, [0.0, 1.0, 0.5, 0.0], "m"),
    ]
    d = tempfile.mkdtemp()
    t = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    pq.write_table(pa.Table.from_pandas(t.toPandas()),
                   os.path.join(d, "embeddings.parquet"))
    out = {r["cluster_id"]: r for r in
           reg.QUERIES["kmeans_update_embeddings"](spark, d).collect()}
    assert out[0]["l1_shift_fp"] == 0 and out[0]["n_members"] == 3
    assert out[1]["l1_shift_fp"] > 0 and out[1]["n_members"] == 2
    assert not compare(reg.QUERIES["kmeans_update_embeddings"](spark, d),
                       reg.ORACLES["kmeans_update_embeddings"], d)


def test_granger_planted_cross_lag(spark):
    import tempfile
    from pyspark.sql import functions as F

    # user 1: an error on every even day, a purchase on every odd day
    # -> purchases(t) = errors(t-1) almost exactly (one planted
    # exception on day 8 keeps the full-model residual nonzero), so
    # the cross-lag term explains nearly everything: F large, coef ~ 1.
    # user 2: no errors at all -> Cxx = 0 -> NULL guards.
    rows, eid = [], 0
    for day in range(14):
        if day % 2 == 0:
            eid += 1
            rows.append((1, eid, BASE + dt.timedelta(days=day), "error", 1.0))
        else:
            eid += 1
            rows.append((1, eid, BASE + dt.timedelta(days=day),
                         "purchase", 1.0))
    eid += 1
    rows.append((1, eid, BASE + dt.timedelta(days=8), "purchase", 1.0))
    for day in range(14):
        eid += 1
        rows.append((2, eid, BASE + dt.timedelta(days=day),
                     "purchase" if day in (3, 9) else "view", 1.0))
    d = tempfile.mkdtemp()
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    pq.write_table(pa.Table.from_pandas(ev.toPandas()),
                   os.path.join(d, "events.parquet"))
    out = {r["user_id"]: r for r in
           reg.QUERIES["granger_lag_users"](spark, d).collect()}
    assert out[1]["f_ppm"] > 5_000_000          # F > 5
    assert 800_000 < out[1]["xlag_coef_ppm"] < 1_200_000
    assert out[2]["f_ppm"] is None and out[2]["xlag_coef_ppm"] is None
    assert not compare(reg.QUERIES["granger_lag_users"](spark, d),
                       reg.ORACLES["granger_lag_users"], d)


def test_icss_planted_variance_shift(spark):
    # low-variance regime (alternating 4.9/5.1) then high-variance
    # (alternating 1/9): the centered cumulative sum of squares bends
    # hardest at the regime boundary
    d = _events_dir(spark, {
        1: [4.9, 5.1] * 5 + [1.0, 9.0] * 5,
        2: [7.0] * 12,      # constant -> Q_n = 0 -> NULL
    })
    out = {r["user_id"]: r for r in
           reg.QUERIES["icss_variance_changepoint_users"](spark, d)
           .collect()}
    assert 9 <= out[1]["change_t"] <= 11 and out[1]["d_ppm"] > 300000
    assert out[2]["change_t"] is None and out[2]["d_ppm"] is None
    assert not compare(
        reg.QUERIES["icss_variance_changepoint_users"](spark, d),
        reg.ORACLES["icss_variance_changepoint_users"], d)


def test_cooks_distance_flags_endpoint_outlier(spark):
    # near-perfect line with one corrupted ENDPOINT (max leverage +
    # max residual): Cook's D must pick that event; a second user on
    # an exact line has RSS = 0 and drops out entirely
    vals = [float(i) for i in range(1, 20)] + [100.0]
    d = _events_dir(spark, {1: vals,
                            2: [float(2 * i) for i in range(1, 15)]})
    rows = reg.QUERIES["cooks_distance_users"](spark, d).collect()
    out = {r["user_id"]: r for r in rows}
    # user 1's events are event_id 1..20 in order; the outlier is #20
    assert out[1]["top_event_id"] == 20 and out[1]["cook_d_fp"] > 1000000
    assert 2 not in out        # perfect line -> undefined, excluded
    assert not compare(reg.QUERIES["cooks_distance_users"](spark, d),
                       reg.ORACLES["cooks_distance_users"], d)


def test_ansari_bradley_closed_form(spark):
    import tempfile
    from pyspark.sql import functions as F

    # one type, combined sorted sample {1, 4, 5, 9}: AB scores
    # min(r, 5-r) = 1,2,2,1.  Early sample = {4, 5} (mid-range,
    # ranks 2,3) -> doubled AB = 2*(2+2) = 8 -> 8e6; doubled H0
    # expectation = n1 * sum(2S)/N = 2 * 12/4 = 6 -> 6e6.  The
    # early sample scoring ABOVE expectation = concentrated = LESS
    # dispersed, exactly the reading the test is for.
    rows = [
        (1, 1, BASE, "view", 4.0),
        (1, 2, BASE + dt.timedelta(days=1), "view", 5.0),
        (1, 3, BASE + dt.timedelta(days=20), "view", 1.0),
        (1, 4, BASE + dt.timedelta(days=21), "view", 9.0),
    ]
    d = tempfile.mkdtemp()
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    pq.write_table(pa.Table.from_pandas(ev.toPandas()),
                   os.path.join(d, "events.parquet"))
    row = reg.QUERIES["ansari_bradley_types"](spark, d).collect()[0]
    assert row["n_early"] == 2 and row["n_late"] == 2
    assert row["ab2_fp"] == 8_000_000
    assert row["ab2_h0_fp"] == 6_000_000
    assert not compare(reg.QUERIES["ansari_bradley_types"](spark, d),
                       reg.ORACLES["ansari_bradley_types"], d)


def test_littles_law_overlapping_sessions(spark):
    import tempfile
    from pyspark.sql import functions as F

    # user 1 session [0, 10 min], user 2 session [5, 15 min]:
    # concurrency 1,2,1 over three 5-min intervals -> integral
    # = 20 min = sum of durations; L = 20/15
    m = dt.timedelta(minutes=1)
    rows = [
        (1, 1, BASE, "view", 1.0),
        (1, 2, BASE + 10 * m, "view", 1.0),
        (2, 3, BASE + 5 * m, "view", 1.0),
        (2, 4, BASE + 15 * m, "view", 1.0),
    ]
    d = tempfile.mkdtemp()
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    pq.write_table(pa.Table.from_pandas(ev.toPandas()),
                   os.path.join(d, "events.parquet"))
    row = reg.QUERIES["littles_law_sessions"](spark, d).collect()[0]
    assert row["n_sessions"] == 2
    assert row["sum_dur_us"] == 20 * 60_000_000
    assert row["integral_us"] == row["sum_dur_us"]
    assert row["littles_ok"] is True
    assert row["l_ppm"] == 20 * 60_000_000 * 1000000 // (15 * 60_000_000)
    assert not compare(reg.QUERIES["littles_law_sessions"](spark, d),
                       reg.ORACLES["littles_law_sessions"], d)


def _docs_dir(spark, texts):
    import tempfile

    d = tempfile.mkdtemp()
    t = spark.createDataFrame(
        [(i + 1, s, "en", len(s), "s") for i, s in enumerate(texts)],
        "doc_id long, text string, lang string, n_chars long, source string",
    )
    pq.write_table(pa.Table.from_pandas(t.toPandas()),
                   os.path.join(d, "documents.parquet"))
    return d


def test_capture_recapture_two_list_closed_form(spark):
    # exact pair: caught by BOTH signatures; reorder pair: bag only;
    # shared-8-token-prefix pair with different tails: prefix only;
    # two singletons caught by neither.
    pre = "p1 p2 p3 p4 p5 p6 p7 p8"
    d = _docs_dir(spark, [
        "a b c", "a b c",                     # exact dup pair
        "x y z", "z y x",                     # reorder pair (bag only)
        pre + " tail1 t1", pre + " tail2 t2", # prefix pair (pre only)
        "lonely one", "another single",
    ])
    row = reg.QUERIES["capture_recapture_dups"](spark, d).collect()[0]
    assert row["n_a"] == 4 and row["n_b"] == 4 and row["n_both"] == 2
    assert row["chapman_est_fp"] == (5 * 5 * 1000000) // 3 - 1000000
    assert not compare(reg.QUERIES["capture_recapture_dups"](spark, d),
                       reg.ORACLES["capture_recapture_dups"], d)


def test_ipf_raking_hits_source_margin(spark):
    sf = "/root/testdata/sf0.001"
    rows = reg.QUERIES["ipf_raking_lang_source"](spark, sf).collect()
    nn = sum(r["n"] for r in rows)
    ns = len({r["source"] for r in rows})
    target = (nn * 1000000) // ns
    by_src = {}
    for r in rows:
        by_src[r["source"]] = by_src.get(r["source"], 0) + r["mass_fp"]
    # after the column step every source margin hits the uniform
    # target up to per-cell truncation
    for s, mass in by_src.items():
        assert abs(mass - target) / target < 0.01, (s, mass, target)


def test_dau_wau_stickiness_closed_form(spark):
    # user 1 active on days 0 and 3; user 2 on day 0 only.
    # day 0: dau 2, wau 2; day 3: dau 1 (u1), wau 2 (both within 7d);
    # day 2 (silent): dau 0, wau 2 -> stickiness 0
    import tempfile
    from pyspark.sql import functions as F

    rows = [
        (1, 1, BASE, "view", 1.0),
        (1, 2, BASE + dt.timedelta(days=3), "view", 1.0),
        (2, 3, BASE, "view", 1.0),
    ]
    d = tempfile.mkdtemp()
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    pq.write_table(pa.Table.from_pandas(ev.toPandas()),
                   os.path.join(d, "events.parquet"))
    out = {str(r["day"]): r for r in
           reg.QUERIES["dau_wau_stickiness"](spark, d).collect()}
    assert out["2024-01-01"]["dau"] == 2 and out["2024-01-01"]["wau"] == 2
    assert out["2024-01-01"]["stickiness_ppm"] == 1000000
    assert out["2024-01-03"]["dau"] == 0 and out["2024-01-03"]["wau"] == 2
    assert out["2024-01-03"]["stickiness_ppm"] == 0
    assert out["2024-01-04"]["dau"] == 1 and out["2024-01-04"]["wau"] == 2
    assert out["2024-01-04"]["stickiness_ppm"] == 500000
    assert not compare(reg.QUERIES["dau_wau_stickiness"](spark, d),
                       reg.ORACLES["dau_wau_stickiness"], d)


def test_twonn_arc_closed_form(spark):
    import math
    import tempfile

    # ten unit vectors evenly spaced 0.01 rad apart on a 2-D arc,
    # one centroid (vec 0): the eight INTERIOR vectors see equidistant
    # neighbors on both sides (r1 = r2 = 50 on the 1e-6 grid, ln mu
    # = 0) and only the two ENDPOINTS see 50 then 200 (mu = 4), so
    # the cluster sum is exactly 2 * round(ln 4, 6)*1e6 = 2772588
    # and the estimate is the deterministic 10e12 // 2772588
    rows = []
    for i in range(10):
        th = 0.01 * i
        # only vec 0 is a centroid (the vec_id < 8 convention);
        # the rest start at id 10 so the cell has all ten members
        rows.append((0 if i == 0 else 9 + i,
                     [math.cos(th), math.sin(th), 0.0, 0.0], "a"))
    d = tempfile.mkdtemp()
    t = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    pq.write_table(pa.Table.from_pandas(t.toPandas()),
                   os.path.join(d, "embeddings.parquet"))
    out = reg.QUERIES["twonn_intrinsic_dim"](spark, d).collect()
    assert len(out) == 1
    row = out[0]
    assert row["n_used"] == 10
    assert row["id_ppm"] == (10 * 10**12) // (2 * 1386294)
    assert not compare(reg.QUERIES["twonn_intrinsic_dim"](spark, d),
                       reg.ORACLES["twonn_intrinsic_dim"], d)


def test_max_drawdown_closed_form(spark):
    # peaks 5,5,8,8,9 -> drawdowns 0,2,0,6,0: max 6.0 at event 4;
    # monotone user: zero drawdown, earliest trough = event 1's tie
    d = _events_dir(spark, {1: [5.0, 3.0, 8.0, 2.0, 9.0],
                            2: [1.0, 2.0, 3.0]})
    out = {r["user_id"]: r for r in
           reg.QUERIES["max_drawdown_users"](spark, d).collect()}
    assert out[1]["max_drawdown_cents"] == 600
    assert out[1]["trough_event_id"] == 4
    assert out[1]["peak_cents"] == 900
    assert out[2]["max_drawdown_cents"] == 0
    assert not compare(reg.QUERIES["max_drawdown_users"](spark, d),
                       reg.ORACLES["max_drawdown_users"], d)


def test_peak_prominence_closed_form(spark):
    # cents series 100,500,200,700,300: peaks at idx 2 (prom = 500 -
    # max(100, 200) = 300) and idx 4 (global max, scipy convention:
    # base = the HIGHER side minimum -> prom = 700 - 300 = 400);
    # both clear the 100-cent bar
    d = _events_dir(spark, {1: [1.0, 5.0, 2.0, 7.0, 3.0],
                            2: [9.0, 8.0, 7.0, 6.0, 5.0]})
    out = {r["user_id"]: r for r in
           reg.QUERIES["peak_prominence_users"](spark, d).collect()}
    assert out[1]["n_peaks"] == 2 and out[1]["n_prominent"] == 2
    assert out[1]["top_peak_idx"] == 4 and out[1]["top_prominence"] == 400
    # strictly decreasing: no interior peak at all
    assert out[2]["n_peaks"] == 0 and out[2]["top_prominence"] is None
    assert not compare(reg.QUERIES["peak_prominence_users"](spark, d),
                       reg.ORACLES["peak_prominence_users"], d)


def test_trapezoid_exposure_closed_form(spark):
    # two samples one day apart: area = (v1+v2)/2 * 86400e6 us
    d = _events_dir(spark, {1: [1.0, 3.0]})
    row = reg.QUERIES["trapezoid_exposure_users"](spark, d).collect()[0]
    assert row["exposure_cents_us"] == (100 + 300) * 86_400_000_000 // 2
    assert not compare(reg.QUERIES["trapezoid_exposure_users"](spark, d),
                       reg.ORACLES["trapezoid_exposure_users"], d)


def test_aj_cumulative_incidence_closed_form(spark):
    import tempfile
    from pyspark.sql import functions as F

    # four signups at day 0: u1 purchases day 1, u2 errors day 1,
    # u3 purchases day 2, u4 censored.  Day 1: S_prev = 1, n = 4 ->
    # each cause gains 1/4.  Day 2: S(1-) = exp(ln(2/4)) = 0.5,
    # n = 2, purchase gains 0.5 * 1/2 = 1/4 -> CIF_p = 0.5, CIF_e
    # = 0.25, and S(2) = 0.25 closes the identity.
    rows, eid = [], 0
    for u in (1, 2, 3, 4):
        eid += 1
        rows.append((u, eid, BASE, "signup", 1.0))
    eid += 1; rows.append((1, eid, BASE + dt.timedelta(days=1), "purchase", 1.0))
    eid += 1; rows.append((2, eid, BASE + dt.timedelta(days=1), "error", 1.0))
    eid += 1; rows.append((3, eid, BASE + dt.timedelta(days=2), "purchase", 1.0))
    d = tempfile.mkdtemp()
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    pq.write_table(pa.Table.from_pandas(ev.toPandas()),
                   os.path.join(d, "events.parquet"))
    out = {r["day"]: r for r in
           reg.QUERIES["aj_cumulative_incidence"](spark, d).collect()}
    assert out[1]["n_at_risk"] == 4
    assert out[1]["cif_purchase_fp"] == 250000
    assert out[1]["cif_error_fp"] == 250000
    assert out[2]["n_at_risk"] == 2
    assert out[2]["cif_purchase_fp"] == 500000
    assert out[2]["cif_error_fp"] == 250000
    assert not compare(reg.QUERIES["aj_cumulative_incidence"](spark, d),
                       reg.ORACLES["aj_cumulative_incidence"], d)


def test_wilcoxon_signed_rank_closed_form(spark):
    # per-user first-6 vs last-6 cent sums: u1 d = +600, u2 d = -1200,
    # u3 d = 0 (discarded), u4 d = +300.  Ranks of |d| 300 < 600 <
    # 1200 -> doubled ranks 2, 4, 6; W2+ = 2 + 4 = 6; H0 = 3*4/2 = 6.
    d = _events_dir(spark, {
        1: [1.0] * 6 + [2.0] * 6,
        2: [3.0] * 6 + [1.0] * 6,
        3: [5.0] * 12,
        4: [1.0] * 6 + [1.5] * 6,
    })
    row = reg.QUERIES["wilcoxon_signed_rank_users"](spark, d).collect()[0]
    assert row["m"] == 3 and row["w2_plus"] == 6 and row["w2_h0"] == 6
    assert not compare(
        reg.QUERIES["wilcoxon_signed_rank_users"](spark, d),
        reg.ORACLES["wilcoxon_signed_rank_users"], d)


def test_circular_hour_stats_closed_form(spark):
    import math
    import tempfile
    from pyspark.sql import functions as F

    # type 'a': every event at hour 6 -> R = 1.  type 'b': one event
    # at 23:00 and one at 01:00 -> the circular mean sits at midnight
    # with R = cos(15 deg) ~ 0.966 (the linear mean would absurdly say
    # noon).  type 'c': one event in every hour -> R = 0 exactly (the
    # quantized cosine table is symmetric).
    rows, eid = [], 0
    for i in range(4):
        eid += 1
        rows.append((1, eid, BASE + dt.timedelta(days=i, hours=6),
                     "a", 1.0))
    eid += 1
    rows.append((1, eid, BASE + dt.timedelta(hours=23), "b", 1.0))
    eid += 1
    rows.append((1, eid, BASE + dt.timedelta(days=1, hours=1), "b", 1.0))
    for h in range(24):
        eid += 1
        rows.append((2, eid, BASE + dt.timedelta(days=2, hours=h),
                     "c", 1.0))
    d = tempfile.mkdtemp()
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    pq.write_table(pa.Table.from_pandas(ev.toPandas()),
                   os.path.join(d, "events.parquet"))
    out = {r["event_type"]: r for r in
           reg.QUERIES["circular_hour_stats"](spark, d).collect()}
    assert out["a"]["rbar_ppm"] == 1000000
    cos15 = round(round(math.cos(2 * math.pi * 1 / 24), 6) * 1e6)
    assert abs(out["b"]["rbar_ppm"] - cos15) <= 1
    assert out["c"]["rbar_ppm"] == 0 and out["c"]["rayleigh_z_ppm"] == 0
    assert not compare(reg.QUERIES["circular_hour_stats"](spark, d),
                       reg.ORACLES["circular_hour_stats"], d)


def test_deming_slope_exact_line(spark):
    import tempfile

    # price = 2.00 * quantity exactly: the TLS axis is the line itself
    # and the closed form collapses to slope = 200 cents/unit
    d = tempfile.mkdtemp()
    li = spark.createDataFrame(
        [(i, 1, float(i), 2.0 * i) for i in range(1, 9)],
        "l_orderkey long, l_partkey long, l_quantity double, "
        "l_extendedprice double",
    )
    pt = spark.createDataFrame(
        [(1, "Brand#11")], "p_partkey long, p_brand string"
    )
    pq.write_table(pa.Table.from_pandas(li.toPandas()),
                   os.path.join(d, "lineitem.parquet"))
    pq.write_table(pa.Table.from_pandas(pt.toPandas()),
                   os.path.join(d, "part.parquet"))
    row = reg.QUERIES["deming_slope_brands"](spark, d).collect()[0]
    assert row["tls_slope_fp"] == 200 * 1000000
    assert not compare(reg.QUERIES["deming_slope_brands"](spark, d),
                       reg.ORACLES["deming_slope_brands"], d)


def test_assortativity_two_cliques(spark):
    # a 2-clique plus a 3-clique of exact duplicates: every edge joins
    # equal degrees, so the endpoint-degree correlation is exactly +1
    d = _docs_dir(spark, [
        "alpha beta gamma", "alpha beta gamma",
        "delta epsilon zeta", "delta epsilon zeta", "delta epsilon zeta",
    ])
    row = reg.QUERIES["assortativity_dup_graph"](spark, d).collect()[0]
    assert row["n_edges"] == 4          # 1 pair edge + 3 triangle edges
    assert row["assortativity_ppm"] == 1000000
    assert not compare(reg.QUERIES["assortativity_dup_graph"](spark, d),
                       reg.ORACLES["assortativity_dup_graph"], d)


def test_cochran_q_closed_form(spark):
    import tempfile
    from pyspark.sql import functions as F

    # u1 active weeks 0,1; u2 active week 0; u3 active all four
    # (uninformative, dropped).  T = 3, sum C^2 = 5, sum R^2 = 5:
    # Q = 3*(4*5 - 9)/(4*3 - 5) = 33/7
    rows, eid = [], 0
    for wk in (0, 1):
        eid += 1
        rows.append((1, eid, BASE + dt.timedelta(days=7 * wk), "view", 1.0))
    eid += 1
    rows.append((2, eid, BASE, "view", 1.0))
    for wk in range(4):
        eid += 1
        rows.append((3, eid, BASE + dt.timedelta(days=7 * wk), "view", 1.0))
    d = tempfile.mkdtemp()
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    pq.write_table(pa.Table.from_pandas(ev.toPandas()),
                   os.path.join(d, "events.parquet"))
    row = reg.QUERIES["cochran_q_weekly_activity"](spark, d).collect()[0]
    assert row["n_blocks"] == 2 and row["n_active_cells"] == 3
    assert row["q_fp"] == (3 * (4 * 5 - 9) * 1000000) // (4 * 3 - 5)
    assert not compare(
        reg.QUERIES["cochran_q_weekly_activity"](spark, d),
        reg.ORACLES["cochran_q_weekly_activity"], d)


def test_rdd_planted_level_jump(spark):
    import tempfile
    from pyspark.sql import functions as F

    # exactly 2 events/day before the cutoff, 5/day after: both side
    # fits are flat lines, jump = 3 exactly
    rows, eid = [], 0
    day0 = dt.datetime(2024, 1, 2)
    for i in range(28):
        per = 2 if i < 14 else 5
        for j in range(per):
            eid += 1
            rows.append((j + 1, eid, day0 + dt.timedelta(days=i, hours=j),
                         "view", 1.0))
    d = tempfile.mkdtemp()
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    pq.write_table(pa.Table.from_pandas(ev.toPandas()),
                   os.path.join(d, "events.parquet"))
    row = reg.QUERIES["rdd_cutoff_daily_events"](spark, d).collect()[0]
    assert row["left_at_cutoff_fp"] == 2_000_000
    assert row["right_at_cutoff_fp"] == 5_000_000
    assert row["jump_fp"] == 3_000_000
    assert row["left_slope_fp"] == 0 and row["right_slope_fp"] == 0
    assert not compare(reg.QUERIES["rdd_cutoff_daily_events"](spark, d),
                       reg.ORACLES["rdd_cutoff_daily_events"], d)


def test_term_burstiness_bursty_vs_spread(spark):
    # same corpus rate (tf = 4, N = 5) for both terms, opposite
    # clumping: 'xx' packs all four occurrences into one doc
    # (P(>=2 | >=1) = 1), 'yy' spreads one per doc (= 0); the Poisson
    # baseline is identical for both, so only burstiness separates them
    d = _docs_dir(spark, [
        "xx xx xx xx",
        "yy f1", "yy f2", "yy f3", "yy f4",
    ])
    out = {r["term"]: r for r in
           reg.QUERIES["term_burstiness_corpus"](spark, d).collect()}
    assert out["xx"]["p2_obs_ppm"] == 1000000 and out["xx"]["df"] == 1
    assert out["yy"]["p2_obs_ppm"] == 0 and out["yy"]["df"] == 4
    assert out["xx"]["p2_poisson_ppm"] == out["yy"]["p2_poisson_ppm"]
    assert not compare(reg.QUERIES["term_burstiness_corpus"](spark, d),
                       reg.ORACLES["term_burstiness_corpus"], d)


def test_mcf_recurrent_closed_form(spark):
    import tempfile
    from pyspark.sql import functions as F

    # two signups; u1 purchases twice at age 1 and once at age 3,
    # u2 once at age 1: MCF(1) = 3/2, MCF(3) = 3/2 + 1/2 = 2 — the
    # average cumulative purchases per user, exactly
    rows = [
        (1, 1, BASE, "signup", 1.0),
        (2, 2, BASE, "signup", 1.0),
        (1, 3, BASE + dt.timedelta(days=1), "purchase", 1.0),
        (1, 4, BASE + dt.timedelta(days=1, hours=2), "purchase", 1.0),
        (2, 5, BASE + dt.timedelta(days=1, hours=3), "purchase", 1.0),
        (1, 6, BASE + dt.timedelta(days=3), "purchase", 1.0),
    ]
    d = tempfile.mkdtemp()
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    pq.write_table(pa.Table.from_pandas(ev.toPandas()),
                   os.path.join(d, "events.parquet"))
    out = {r["age"]: r for r in
           reg.QUERIES["mcf_recurrent_purchases"](spark, d).collect()}
    assert out[1]["n_events"] == 3 and out[1]["n_risk"] == 2
    assert out[1]["mcf_fp"] == 1_500_000
    assert out[3]["mcf_fp"] == 2_000_000
    assert not compare(reg.QUERIES["mcf_recurrent_purchases"](spark, d),
                       reg.ORACLES["mcf_recurrent_purchases"], d)


def test_morans_i_checkerboard_closed_form(spark):
    import tempfile

    # 2x2 occupied cells with counts 1,3,3,1 (checkerboard): every
    # cell neighbors every other (queen), so cross_sum = (sum dx)^2 -
    # sum dx^2 = -64, var = 64, W = 12 -> I = 4*(-64)/(12*64) = -1/3
    rows, vid = [], 0
    def put(cx, cy, k):
        nonlocal vid, rows
        for _ in range(k):
            vid += 1
            rows.append((vid, [cx * 0.05 + 0.01, cy * 0.05 + 0.01,
                               0.0, 0.0], "a"))
    put(0, 0, 1); put(0, 1, 3); put(1, 0, 3); put(1, 1, 1)
    d = tempfile.mkdtemp()
    t = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    pq.write_table(pa.Table.from_pandas(t.toPandas()),
                   os.path.join(d, "embeddings.parquet"))
    row = reg.QUERIES["morans_i_embedding_grid"](spark, d).collect()[0]
    assert row["n_cells"] == 4 and row["n_neighbor_pairs"] == 6
    assert row["morans_i_ppm"] == -333333
    assert not compare(reg.QUERIES["morans_i_embedding_grid"](spark, d),
                       reg.ORACLES["morans_i_embedding_grid"], d)


def test_jonckheere_perfect_trend(spark):
    import tempfile
    from pyspark.sql import functions as F

    # two events per day part with values rising 1 -> 4 across parts:
    # every ordered cross pair is concordant, so the doubled statistic
    # is 2 * sum n_i*n_j = 48 against its doubled H0 mean of 24
    rows, eid = [], 0
    for g, val in enumerate([1.0, 2.0, 3.0, 4.0]):
        for j in range(2):
            eid += 1
            rows.append((1, eid, BASE + dt.timedelta(days=j, hours=6 * g),
                         "view", val))
    d = tempfile.mkdtemp()
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    pq.write_table(pa.Table.from_pandas(ev.toPandas()),
                   os.path.join(d, "events.parquet"))
    row = reg.QUERIES["jonckheere_trend_dayparts"](spark, d).collect()[0]
    assert row["jt2_stat"] == 48 and row["jt2_h0"] == 24
    assert not compare(
        reg.QUERIES["jonckheere_trend_dayparts"](spark, d),
        reg.ORACLES["jonckheere_trend_dayparts"], d)


def test_partial_corr_confounded_null(spark):
    import tempfile
    from pyspark.sql import functions as F

    # errors and purchases BOTH exactly track total volume (x = y =
    # z/2): raw r_xy = +1, but the control correlations are also +1,
    # so the partial is undefined and the guard yields NULL — the
    # pure-confounding signature
    rows, eid = [], 0
    for i, per in enumerate([1, 2, 1, 2, 3, 1, 2, 3, 1, 2, 1, 3]):
        for j in range(per):
            eid += 1
            rows.append((1, eid, BASE + dt.timedelta(days=i, hours=j),
                         "error", 1.0))
            eid += 1
            rows.append((1, eid, BASE + dt.timedelta(days=i, hours=j + 12),
                         "purchase", 1.0))
    d = tempfile.mkdtemp()
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    pq.write_table(pa.Table.from_pandas(ev.toPandas()),
                   os.path.join(d, "events.parquet"))
    row = reg.QUERIES["partial_corr_err_purchase"](spark, d).collect()[0]
    assert row["r_xy_ppm"] == 1000000
    assert row["r_xy_given_z_ppm"] is None
    assert not compare(
        reg.QUERIES["partial_corr_err_purchase"](spark, d),
        reg.ORACLES["partial_corr_err_purchase"], d)


def test_knn_hubness_star_fixture(spark):
    import tempfile

    # hub = the uniform direction, 8 axis vectors pairwise orthogonal
    # but all moderately close to the hub: the hub lands in every
    # axis vector's 3NN (N_k = 8), the smallest-id axes absorb the
    # tie-broken remainder, and axes 13..17 are never chosen
    # (5 antihubs) — N_k = [8,8,8,3,0,0,0,0,0], strongly right-skewed
    dim = 10
    hub = [1.0 / dim ** 0.5] * dim
    rows = [(0, hub, "hub")]
    for i in range(8):
        v = [0.0] * dim
        v[i] = 1.0
        rows.append((10 + i, v, "axis"))
    d = tempfile.mkdtemp()
    t = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    pq.write_table(pa.Table.from_pandas(t.toPandas()),
                   os.path.join(d, "embeddings.parquet"))
    row = reg.QUERIES["knn_hubness_embeddings"](spark, d).collect()[0]
    assert row["n_vectors"] == 9
    assert row["max_nk"] == 8 and row["antihubs"] == 5
    assert row["hubness_skew_ppm"] > 500000
    assert not compare(reg.QUERIES["knn_hubness_embeddings"](spark, d),
                       reg.ORACLES["knn_hubness_embeddings"], d)


def test_mcnemar_identities_sf0001(spark):
    sf = "/root/testdata/sf0.001"
    row = reg.QUERIES["mcnemar_rule_classifier"](spark, sf).collect()[0]
    n10, n01 = row["n10"], row["n01"]
    if n10 + n01 > 0:
        assert row["chi2_fp"] == ((n10 - n01) ** 2 * 1000000) // (n10 + n01)
        assert row["chi2_cc_fp"] <= row["chi2_fp"]
    else:
        assert row["chi2_fp"] is None and row["chi2_cc_fp"] is None

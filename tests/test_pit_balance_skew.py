"""Planted-data semantics tests for the batch-5/6 queries: the
union-window point-in-time join (tie rules, NULL before first state),
Theil-Sen outlier robustness, referential-integrity orphan counting,
segmented running balance with resets, throttle dedup keep-first, and
the key-skew profiler's exact shares.

The oracle-differential suite covers engine parity; these pin the
*semantics* on hand-built inputs where the right answer is computed by
inspection.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from anomaly_detection_spark import queries as reg

BASE = dt.datetime(2024, 1, 1)


def _mini_dir(spark, events_rows, extra_tables=None):
    """Write a single-file mini warehouse: events plus optional extra
    tables, in load_table's one-parquet-per-table layout."""
    d = tempfile.mkdtemp()
    ev = spark.createDataFrame(
        events_rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    pq.write_table(
        pa.Table.from_pandas(ev.toPandas()),
        os.path.join(d, "events.parquet"),
    )
    for name, (rows, schema) in (extra_tables or {}).items():
        t = spark.createDataFrame(rows, schema)
        pq.write_table(
            pa.Table.from_pandas(t.toPandas()),
            os.path.join(d, f"{name}.parquet"),
        )
    return d


def _m(minutes):
    return BASE + dt.timedelta(minutes=minutes)


def test_pit_join_state_at_purchase_ties_and_null(spark):
    rows = [
        # user 1: view@0, error@10, purchase@5 (between), purchase@10
        # (exactly at the error change -> the change applies), purchase
        # BEFORE any state (user 2) -> NULL
        (1, 1, _m(0), "view", 1.0),
        (1, 2, _m(10), "error", 1.0),
        (1, 3, _m(5), "purchase", 1.0),
        (1, 4, _m(10), "purchase", 1.0),
        (2, 5, _m(0), "purchase", 1.0),
        (2, 6, _m(1), "click", 1.0),
    ]
    d = _mini_dir(spark, rows)
    out = {
        r.purchase_id: r.state_at_purchase
        for r in reg.QUERIES["pit_join_purchase_state"](spark, d).collect()
    }
    assert out[3] == "view"      # last change before t=5
    assert out[4] == "error"     # change at the same instant applies
    assert out[5] is None        # no state yet
    assert len(out) == 3


def test_pit_join_same_ts_changes_highest_event_id_wins(spark):
    rows = [
        (1, 1, _m(0), "view", 1.0),
        (1, 2, _m(0), "error", 1.0),   # same ts, higher id -> wins
        (1, 3, _m(1), "purchase", 1.0),
    ]
    d = _mini_dir(spark, rows)
    out = reg.QUERIES["pit_join_purchase_state"](spark, d).collect()
    assert out[0].state_at_purchase == "error"


def test_theilsen_median_slope_ignores_outlier(spark):
    # value climbs exactly 1.0/day; one wild outlier at day 2
    rows = [
        (1, i, BASE + dt.timedelta(days=i), "purchase",
         float(i) if i != 2 else 1000.0)
        for i in range(5)
    ]
    d = _mini_dir(spark, rows)
    out = reg.QUERIES["theilsen_slope_user"](spark, d).collect()[0]
    assert out.n_pairs == 10
    # 6 of 10 pairwise slopes are exactly 1.0 -> the median is 1.0;
    # the outlier would drag a least-squares fit far off
    assert out.med_slope_day == 1.0
    assert out.max_slope_day > 100


def test_referential_integrity_counts_orphans(spark):
    rows = [(1, 1, _m(0), "view", 1.0), (99, 2, _m(1), "click", 1.0)]
    extra = {
        "customer": ([(1,), (2,)], "c_custkey long"),
        "orders": ([(10, 1), (11, 2), (12, 7)],
                   "o_orderkey long, o_custkey long"),
        "lineitem": ([(10,), (10,), (55,)], "l_orderkey long"),
    }
    d = _mini_dir(spark, rows, extra)
    out = {
        r.relation: (r.n_rows, r.n_orphans)
        for r in reg.QUERIES["referential_integrity_audit"](
            spark, d
        ).collect()
    }
    assert out["orders->customer"] == (3, 1)    # custkey 7 missing
    assert out["lineitem->orders"] == (3, 1)    # orderkey 55 missing
    assert out["events->customer"] == (2, 1)    # user 99 missing


def test_running_balance_resets_on_signup(spark):
    rows = [
        (1, 1, _m(0), "purchase", 2.00),
        (1, 2, _m(1), "purchase", 3.00),
        (1, 3, _m(2), "signup", 0.0),    # reset
        (1, 4, _m(3), "purchase", 5.00),
        (1, 5, _m(4), "view", 1.0),      # filtered out of the result
    ]
    d = _mini_dir(spark, rows)
    out = {
        r.event_id: (r.segment, r.balance_cents)
        for r in reg.QUERIES["running_balance_resets"](spark, d).collect()
    }
    assert out[1] == (0, 200)
    assert out[2] == (0, 500)
    assert out[3] == (1, 0)      # the signup row itself starts segment 1
    assert out[4] == (1, 500)
    assert 5 not in out


def test_throttle_dedup_keeps_first_and_counts(spark):
    rows = [
        (1, 7, _m(5), "click", 1.0),
        (1, 3, _m(1), "click", 1.0),    # earliest in the hour -> kept
        (1, 9, _m(59), "click", 1.0),
        (1, 4, _m(61), "click", 1.0),   # next hour -> its own keeper
        (1, 5, _m(2), "view", 1.0),     # different type -> own keeper
    ]
    d = _mini_dir(spark, rows)
    out = {
        (r.user_id, r.event_type, r.win): (r.kept_event_id, r.n_suppressed)
        for r in reg.QUERIES["throttle_dedup_hourly"](spark, d).collect()
    }
    assert out[(1, "click", BASE)] == (3, 2)
    assert out[(1, "click", BASE + dt.timedelta(hours=1))] == (4, 0)
    assert out[(1, "view", BASE)] == (5, 0)


def test_key_skew_profiler_exact_shares(spark):
    # 8 events: user 1 holds 6 of 8 rows -> top1 share = 750000 ppm
    rows = [
        (1, i, _m(i), "click", 1.0) for i in range(6)
    ] + [(2, 6, _m(6), "click", 1.0), (3, 7, _m(7), "click", 1.0)]
    d = _mini_dir(spark, rows)
    out = {
        r.key_name: r
        for r in reg.QUERIES["key_skew_profiler"](spark, d).collect()
    }
    u = out["user_id"]
    assert (u.n_keys, u.n_rows, u.max_key_rows) == (3, 8, 6)
    assert u.top1_share_ppm == 750000
    assert u.cr8_ppm == 1000000          # only 3 keys, all within top-8
    t = out["event_type"]
    assert t.n_keys == 1 and t.top1_share_ppm == 1000000


def test_linear_attribution_splits_evenly(spark):
    rows = [
        (1, 1, _m(0), "click", 1.0),
        (1, 2, _m(10), "click", 1.0),
        (1, 3, _m(20), "purchase", 9.0),           # 90000 q4-units
        (1, 4, BASE - dt.timedelta(days=8), "click", 1.0),  # outside 7d
        (2, 5, _m(0), "purchase", 5.0),            # no clicks -> dropped
    ]
    d = _mini_dir(spark, rows)
    out = {
        r.click_day: (r.n_touches, r.credited_micro)
        for r in reg.QUERIES["attribution_linear_touch"](spark, d).collect()
    }
    # both in-window clicks are on the same day; each gets half of
    # 90000 * 1e6 micro-units
    assert out[BASE.date()] == (2, 2 * (90000 * 1000000 // 2))
    assert (BASE - dt.timedelta(days=8)).date() not in out


def test_share_of_total_exact_ppm(spark):
    rows = [
        (1, 1, _m(0), "click", 1.0),
        (1, 2, _m(1), "click", 1.0),
        (1, 3, _m(2), "view", 2.0),
        (1, 4, _m(3), "view", 2.0),
    ]
    d = _mini_dir(spark, rows)
    out = {
        r.event_type: r
        for r in reg.QUERIES["share_of_total_by_type"](spark, d).collect()
    }
    assert out["click"].row_share_ppm == 500000
    # clicks: 200 cents of 600 total -> 333333 ppm (floor)
    assert out["click"].value_share_ppm == 333333
    assert out["view"].value_share_ppm == 666666


def test_pythagorean_means_constant_series(spark):
    rows = [(1, i, _m(i), "view", 4.0) for i in range(3)]
    d = _mini_dir(spark, rows)
    out = reg.QUERIES["pythagorean_means_by_type"](spark, d).collect()[0]
    # constant series: harmonic mean == the value, mean_log == ln(4)
    assert out.harmonic_mean == 4.0
    assert abs(out.mean_log - 1.3863) < 1e-9


def test_growth_accounting_classification(spark):
    d0, d1, d3 = BASE, _m(24 * 60), BASE + dt.timedelta(days=3)
    rows = [
        (1, 1, d0, "view", 1.0),          # new on d0
        (1, 2, d1, "view", 1.0),          # retained on d1
        (1, 3, d3, "view", 1.0),          # resurrected on d3 (gap)
        (2, 4, d1, "view", 1.0),          # new on d1, churns after
    ]
    d = _mini_dir(spark, rows)
    out = {
        r.day: (r.n_active, r.n_new, r.n_retained, r.n_resurrected,
                r.n_churned_after)
        for r in reg.QUERIES["growth_accounting_daily"](spark, d).collect()
    }
    assert out[d0.date()] == (1, 1, 0, 0, 0)       # user 1 returns d1
    assert out[d1.date()] == (2, 1, 1, 0, 2)       # both churn after d1
    assert out[d3.date()] == (1, 0, 0, 1, 1)


def test_weighted_median_cumulative_weight(spark):
    rows = [(1, 1, _m(0), "view", 1.0)]
    extra = {
        "lineitem": (
            # flag A: price 1.00 w=1, price 2.00 w=1, price 9.00 w=2
            # -> cumulative reaches half the total (2 of 4) at 2.00
            [("A", 1.00, 1.0), ("A", 2.00, 1.0), ("A", 9.00, 2.0)],
            "l_returnflag string, l_extendedprice double, l_quantity double",
        ),
    }
    d = _mini_dir(spark, rows, extra)
    out = reg.QUERIES["weighted_median_lineitem"](spark, d).collect()[0]
    assert out.wmedian_cents == 200
    assert out.total_weight == 4
    assert out.n_distinct_prices == 3


def test_table_fingerprint_detects_single_value_change(spark):
    rows = [(1, i, _m(i), "view", float(i)) for i in range(4)]
    d1 = _mini_dir(spark, rows)
    tweaked = rows[:3] + [(1, 3, _m(3), "view", 3.0001)]
    d2 = _mini_dir(spark, tweaked)
    a = reg.QUERIES["table_fingerprint_daily"](spark, d1).collect()[0]
    b = reg.QUERIES["table_fingerprint_daily"](spark, d2).collect()[0]
    # same shape (row counts match) but the checksum flips on a 1e-4
    # value change — exactly what an anti-entropy sweep must catch
    assert a.n_rows == b.n_rows == 4
    assert a.xor_fingerprint != b.xor_fingerprint


def test_isotonic_pava_known_fit_and_monotone(spark):
    # values 3.00, 1.00, 2.00 -> PAVA pools the violating prefix:
    # mean(300,100) = 200, then 200 <= 200 holds -> [200, 200, 200]
    rows = [
        (1, 1, _m(0), "purchase", 3.0),
        (1, 2, _m(1), "purchase", 1.0),
        (1, 3, _m(2), "purchase", 2.0),
        (2, 4, _m(0), "purchase", 1.0),
        (2, 5, _m(1), "purchase", 5.0),   # already monotone: unchanged
    ]
    d = _mini_dir(spark, rows)
    out = {
        r.event_id: r.fitted_cents
        for r in reg.QUERIES["isotonic_fit_user"](spark, d).collect()
    }
    assert out[1] == out[2] == out[3] == 200.0
    assert (out[4], out[5]) == (100.0, 500.0)


def test_skipgram_pairs_distances(spark, sf_dir):
    import os
    import tempfile

    d = tempfile.mkdtemp()
    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b")],
        "doc_id long, text string",
    )
    pq.write_table(
        pa.Table.from_pandas(docs.toPandas()),
        os.path.join(d, "documents.parquet"),
    )
    out = {
        (r.w1, r.w2, r.dist): r.n
        for r in reg.QUERIES["skipgram_pairs_docs"](spark, d).collect()
    }
    # 'a b' at dist 1 appears twice in doc 1 + once in doc 2 = 3
    assert out[("a", "b", 1)] == 3
    assert out[("b", "c", 1)] == 2
    assert out[("a", "c", 2)] == 2     # a _ c windows in doc 1
    # singleton pairs (n < 2) are filtered
    assert ("c", "a", 1) not in out


def test_decile_lift_partitions_users_evenly(spark, sf_dir):
    out = reg.QUERIES["decile_lift_table"](spark, sf_dir).collect()
    assert len(out) == 10
    sizes = [r.n_users for r in out]
    assert max(sizes) - min(sizes) <= 1          # exact ntile fairness
    total = sum(r.n_converted for r in out)
    # lift_ppm is exactly conv_decile/conv_overall in ppm
    for r in out:
        if total and r.n_users:
            n_all = sum(x.n_users for x in out)
            expect = (r.n_converted * n_all * 1000000) // (r.n_users * total)
            assert r.lift_ppm == expect


def test_mann_whitney_separated_and_tied_groups(spark):
    # type 'a': first half {1,2}, second half {3,4} -> complete
    # separation, U1 = 0; type 'b': all values equal -> U1 = n1*n2/2
    rows = [
        (1, 1, _m(0), "a", 1.0), (1, 2, _m(1), "a", 2.0),
        (1, 3, _m(2), "a", 3.0), (1, 4, _m(3), "a", 4.0),
        (1, 5, _m(0), "b", 7.0), (1, 6, _m(1), "b", 7.0),
        (1, 7, _m(2), "b", 7.0), (1, 8, _m(3), "b", 7.0),
    ]
    d = _mini_dir(spark, rows)
    out = {
        r.event_type: r
        for r in reg.QUERIES["mann_whitney_drift"](spark, d).collect()
    }
    a = out["a"]
    assert (a.n1, a.n2) == (2, 2)
    assert a.r1_x2 == 2 * (1 + 2)      # doubled rank sum of {1,2}
    assert a.u1_x2 == 0                # complete separation
    b = out["b"]
    # fully tied case: U1 = n1*n2/2 exactly, so doubled U1 = n1*n2
    assert b.u1_x2 == b.n1 * b.n2


def test_cross_correlation_perfect_at_lag_zero(spark):
    # rev and err move together day by day -> ccf(0) == 1.0
    rows = []
    eid = 0
    for day, k in enumerate([1, 3, 2, 5, 4]):
        t = BASE + dt.timedelta(days=day)
        for _ in range(k):
            eid += 1
            rows.append((1, eid, t, "purchase", 1.0))   # rev = 100*k
            eid += 1
            rows.append((1, eid, t, "error", 0.5))      # err = k
    d = _mini_dir(spark, rows)
    out = {r.lag: r.ccf for r in
           reg.QUERIES["cross_correlation_lags"](spark, d).collect()}
    assert out[0] == 1.0
    assert -1.0 <= min(out.values()) and max(out.values()) <= 1.0


def test_feature_hashing_counts_and_format(spark):
    import tempfile

    d = tempfile.mkdtemp()
    docs = spark.createDataFrame(
        [(1, "alpha alpha beta"), (2, "alpha")],
        "doc_id long, text string",
    )
    pq.write_table(
        pa.Table.from_pandas(docs.toPandas()),
        os.path.join(d, "documents.parquet"),
    )
    out = {r.doc_id: r for r in
           reg.QUERIES["feature_hashing_docs"](spark, d).collect()}
    assert out[1].n_tokens == 3
    parts = dict(kv.split(":") for kv in out[1].sparse_vec.split(","))
    assert sum(int(v) for v in parts.values()) == 3
    # same token hashes to the same bucket in every document
    alpha_bucket_doc2 = out[2].sparse_vec.split(":")[0]
    assert parts[alpha_bucket_doc2] in ("2", "3")   # alpha count in doc 1
    # buckets ascend in the serialization
    keys = [int(kv.split(":")[0]) for kv in out[1].sparse_vec.split(",")]
    assert keys == sorted(keys)


def test_ols_fit_recovers_exact_line(spark):
    # y = 1.00 + 0.50*x dollars at days 0..4 -> slope 50 cents/day, r2=1
    rows = [
        (1, i, BASE + dt.timedelta(days=i), "purchase", 1.0 + 0.5 * i)
        for i in range(5)
    ]
    d = _mini_dir(spark, rows)
    out = reg.QUERIES["ols_fit_user"](spark, d).collect()[0]
    assert out.n == 5
    assert out.slope_cents_day == 50.0
    assert out.intercept_cents == 100.0
    assert out.r2 == 1.0


def test_period_over_period_exact_ppm_and_gap_null(spark):
    rows = [
        (1, 1, BASE, "purchase", 1.0),                          # 100c
        (1, 2, BASE + dt.timedelta(days=1), "purchase", 1.5),   # 150c
        # day 2 missing -> the day-3 DoD delta must be NULL
        (1, 3, BASE + dt.timedelta(days=3), "purchase", 3.0),
    ]
    d = _mini_dir(spark, rows)
    out = {r.day: (r.dod_ppm, r.wow_ppm) for r in
           reg.QUERIES["period_over_period_revenue"](spark, d).collect()}
    assert out[BASE.date()] == (None, None)
    assert out[(BASE + dt.timedelta(days=1)).date()][0] == 500000  # +50%
    assert out[(BASE + dt.timedelta(days=3)).date()] == (None, None)


def test_hll_reagg_merge_flags_hold(spark, sf_dir):
    out = reg.QUERIES["hll_reagg_weekly"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        # merged-from-daily == direct weekly sketch, estimate in band
        assert r.merge_equals_direct is True
        assert r.merged_in_5pct is True
        assert r.exact_users > 0


def test_order_lifecycle_exact_day_math(spark):
    rows = [(1, 1, _m(0), "view", 1.0)]
    extra = {
        "orders": (
            [(10, "1-URGENT", dt.datetime(2024, 1, 1)),
             (11, "1-URGENT", dt.datetime(2024, 1, 1))],
            "o_orderkey long, o_orderpriority string, "
            "o_orderdate timestamp_ntz",
        ),
        "lineitem": (
            [(10, dt.datetime(2024, 1, 11)),     # 10 days
             (10, dt.datetime(2024, 1, 21)),     # 20 days
             (11, dt.datetime(2024, 5, 1))],     # 121 days -> slow
            "l_orderkey long, l_shipdate timestamp_ntz",
        ),
    }
    d = _mini_dir(spark, rows, extra)
    out = reg.QUERIES["order_lifecycle_durations"](spark, d).collect()[0]
    assert (out.n_lineitems, out.n_orders) == (3, 2)
    assert out.order_to_ship_days == 10 + 20 + 121
    assert out.min_days == 10 and out.max_days == 121
    assert out.slow_ship_ppm == 1000000 // 3
    assert out.avg_order_to_ship == round((10 + 20 + 121) / 3, 4)


def test_k_of_n_alerts_debounce(spark):
    # user 1: 3 spike days inside one week -> alert fires on day 3;
    # user 2: 3 spikes spread over a month -> never 3-in-7, no alert
    def spike_days(uid, days, start_eid):
        rows = []
        for i, day in enumerate(days):
            t = BASE + dt.timedelta(days=day)
            rows.append((uid, start_eid + 2 * i, t, "purchase", 100.0))
        return rows

    base_days = [(1, i) for i in range(20)]  # baseline 1.0 purchases
    rows = []
    eid = 1000
    for uid, day in base_days:
        rows.append((uid, eid, BASE + dt.timedelta(days=day), "purchase",
                     1.0))
        eid += 1
        rows.append((2, eid, BASE + dt.timedelta(days=day), "purchase",
                     1.0))
        eid += 1
    rows += spike_days(1, [30, 32, 34], 1)
    rows += spike_days(2, [30, 40, 50], 100)
    d = _mini_dir(spark, rows)
    out = [(r.user_id, r.day) for r in
           reg.QUERIES["k_of_n_alerts"](spark, d).collect()]
    assert (1, (BASE + dt.timedelta(days=34)).date()) in out
    assert all(u != 2 for u, _ in out)


def test_quantile_normalization_known_mapping(spark):
    rows = [
        (1, 1, _m(0), "a", 1.0), (1, 2, _m(1), "a", 2.0),
        (1, 3, _m(2), "b", 3.0), (1, 4, _m(3), "b", 4.0),
    ]
    d = _mini_dir(spark, rows)
    out = {
        (r.event_type, r.value): r.normalized_value
        for r in reg.QUERIES["quantile_normalize_values"](
            spark, d
        ).collect()
    }
    # pooled fracs: 1->.25, 2->.5, 3->.75, 4->1.0
    # type a: 1 is its .5 quantile -> pooled value at >=.5 is 2
    assert out[("a", 1.0)] == 2.0
    assert out[("a", 2.0)] == 4.0
    assert out[("b", 3.0)] == 2.0
    assert out[("b", 4.0)] == 4.0


def test_association_rules_confidence_directional(spark):
    rows = []
    eid = 0
    # 6 sessions where click AND view co-occur (distinct users so each
    # is its own session), plus 2 click-only sessions
    for u in range(1, 7):
        eid += 1; rows.append((u, eid, _m(0), "click", 1.0))
        eid += 1; rows.append((u, eid, _m(1), "view", 1.0))
    for u in range(7, 9):
        eid += 1; rows.append((u, eid, _m(0), "click", 1.0))
    d = _mini_dir(spark, rows)
    out = {
        (r.ante, r.cons): r
        for r in reg.QUERIES["session_association_rules"](
            spark, d
        ).collect()
    }
    cv = out[("click", "view")]
    vc = out[("view", "click")]
    assert cv.n_sessions_both == vc.n_sessions_both == 6
    # click appears in 8 sessions, view in 6 -> confidence differs by
    # direction, lift is symmetric
    assert cv.confidence_ppm == 6 * 1000000 // 8
    assert vc.confidence_ppm == 1000000
    assert cv.lift_ppm == vc.lift_ppm == 6 * 8 * 1000000 // (8 * 6)


def test_clustering_coefficient_triangle(spark):
    import tempfile

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d = tempfile.mkdtemp()
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, text), (4, "totally different words "
                                              "nothing shared here at all "
                                              "qq ww ee rr tt yy")],
        "doc_id long, text string",
    )
    pq.write_table(
        pa.Table.from_pandas(docs.toPandas()),
        os.path.join(d, "documents.parquet"),
    )
    out = {
        r.doc_id: r
        for r in reg.QUERIES["clustering_coefficient_docs"](
            spark, d
        ).collect()
    }
    # 1-2-3 form a perfect triangle: degree 2, one triangle, coeff 1.0
    for doc in (1, 2, 3):
        assert (out[doc].degree, out[doc].n_triangles) == (2, 1)
        assert out[doc].clustering_ppm == 1000000
    assert 4 not in out          # isolated node has no edges


def test_next_higher_spend_stack_semantics(spark):
    # values 3, 1, 2, 5: NGE(3)=5, NGE(1)=2, NGE(2)=5, NGE(5)=None
    vals = [3.0, 1.0, 2.0, 5.0]
    rows = [(1, i + 1, _m(i), "purchase", v) for i, v in enumerate(vals)]
    d = _mini_dir(spark, rows)
    out = {r.event_id: r.nge_event_id for r in
           reg.QUERIES["next_higher_spend_user"](spark, d).collect()}
    assert out == {1: 4, 2: 3, 3: 4, 4: None}


def test_sorted_neighborhood_blocks_canonical_neighbors(spark):
    rows = [(1, 1, _m(0), "view", 1.0)]
    extra = {
        "part": (
            [("widget alpha",), ("Widget-Alphb",), ("zz unrelated name",)],
            "p_name string",
        ),
    }
    d = _mini_dir(spark, rows, extra)
    out = [
        (r.name_a, r.name_b, r.lev)
        for r in reg.QUERIES["sorted_neighborhood_parts"](
            spark, d
        ).collect()
    ]
    # the two widget variants sort adjacent on the canonical key and
    # pass the Levenshtein gate; the unrelated name pairs with nothing
    pairs = {frozenset((a, b)) for a, b, _ in out}
    assert frozenset(("widget alpha", "Widget-Alphb")) in pairs
    assert all("zz unrelated name" not in p for p in pairs)


def test_ppjoin_boundary_and_exclusion(spark):
    import tempfile

    d = tempfile.mkdtemp()
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),      # with doc 2: inter=3, union=5 -> 0.6
            (2, "a b c e"),      #   exactly at the threshold: KEPT
            (3, "x y z w q r"),  # with 1: inter=0 -> excluded
        ],
        "doc_id long, text string",
    )
    pq.write_table(
        pa.Table.from_pandas(docs.toPandas()),
        os.path.join(d, "documents.parquet"),
    )
    out = {r.doc_id: (r.match_id, r.n_shared, r.jaccard) for r in
           reg.QUERIES["ppjoin_jaccard_pairs"](spark, d).collect()}
    # best-match form: 1 and 2 pick each other at exactly the 0.6
    # threshold; 3 shares nothing and emits no row
    assert out == {1: (2, 3, 0.6), 2: (1, 3, 0.6)}


def test_ppjoin_duplicate_family_and_tiebreak(spark):
    import tempfile

    d = tempfile.mkdtemp()
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),     # duplicate family {1, 4}
            (4, "a b c d"),
            (2, "a b c e"),     # 0.6 vs the family; 0.6 vs doc 5
            (5, "a b c e f"),   # 4/5 = 0.8 with doc 2? inter=4 union=5
            (3, "zz yy"),       # no match
        ],
        "doc_id long, text string",
    )
    pq.write_table(
        pa.Table.from_pandas(docs.toPandas()),
        os.path.join(d, "documents.parquet"),
    )
    out = {r.doc_id: (r.match_id, r.jaccard) for r in
           reg.QUERIES["ppjoin_jaccard_pairs"](spark, d).collect()}
    # family members match within the family at 1.0 (1<->4);
    # doc 2's best is doc 5 (0.8 beats 0.6); doc 5's best is doc 2
    assert out[1] == (4, 1.0)
    assert out[4] == (1, 1.0)
    assert out[2] == (5, 0.8)
    assert out[5] == (2, 0.8)
    assert 3 not in out


def test_latest_value_percentile_counts_below(spark):
    rows = [
        (1, i, _m(i), "purchase", float(i)) for i in range(1, 6)
    ]  # history 1..5, latest value 5 -> 4 of 5 strictly below
    rows.append((2, 10, _m(0), "purchase", 7.0))  # single-purchase user
    d = _mini_dir(spark, rows)
    out = {r.user_id: r for r in
           reg.QUERIES["latest_value_percentile"](spark, d).collect()}
    assert out[1].latest_event_id == 5
    assert out[1].percentile_ppm == 4 * 1000000 // 5
    assert out[2].percentile_ppm == 0     # nothing below its only value

"""Semantic tests for the event-analytics operators (funnel, cohort,
Hampel, CUSUM) on planted data — the oracle differential in
test_oracle_parity pins cross-engine agreement; these pin that the
operators detect what they claim to detect."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from anomaly_detection_spark.detect.robust import cusum, rolling_median_hampel
from anomaly_detection_spark.operators.funnel import funnel_summary, funnel_times


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double"
    )


def _ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)


def test_funnel_strict_ordering(spark):
    rows = [
        # user 1: full funnel in order
        (1, 1, _ts(0), "view", 0.0),
        (1, 2, _ts(1), "click", 0.0),
        (1, 3, _ts(2), "purchase", 0.0),
        # user 2: purchase BEFORE click -> completes step 2 only
        (2, 4, _ts(0), "view", 0.0),
        (2, 5, _ts(2), "click", 0.0),
        (2, 6, _ts(1), "purchase", 0.0),
        # user 3: never views -> completes nothing (click ignored)
        (3, 7, _ts(0), "click", 0.0),
    ]
    steps = [
        ("s_view", F.col("event_type") == "view"),
        ("s_click", F.col("event_type") == "click"),
        ("s_purchase", F.col("event_type") == "purchase"),
    ]
    pu = funnel_times(_events(spark, rows), steps).orderBy("user_id").collect()
    assert [r["s_view"] is not None for r in pu] == [True, True, False]
    assert [r["s_click"] is not None for r in pu] == [True, True, False]
    assert [r["s_purchase"] is not None for r in pu] == [True, False, False]

    summary = funnel_summary(
        funnel_times(_events(spark, rows), steps), [n for n, _ in steps]
    ).collect()
    assert [(r["step"], r["users"]) for r in summary] == [(1, 2), (2, 2), (3, 1)]
    assert abs(summary[2]["conv_rate"] - 1 / 3) < 1e-6


def test_hampel_flags_planted_spike_median_robust(spark):
    # constant series with one huge spike: the spike is flagged, and the
    # rolling median STAYS at the baseline through the spike (robustness
    # — a rolling mean would smear)
    rows = []
    for i in range(30):
        v = 500.0 if i == 20 else 10.0 + (0.01 if i % 2 else -0.01)
        rows.append((1, i, _ts(i), "tick", v))
    out = (
        rolling_median_hampel(
            _events(spark, rows), ["user_id"], ["ts", "event_id"], "value",
            window=15,
        )
        .orderBy("event_id")
        .collect()
    )
    flagged = [r["event_id"] for r in out if r["hampel_outlier"]]
    assert flagged == [20]
    assert abs(out[20]["roll_median"] - 10.0) < 0.02
    # MAD is tiny (alternating +-0.01) and never polluted by the spike
    assert all(r["roll_mad"] <= 0.02 for r in out[2:])


def test_cusum_detects_level_shift_at_shift_point(spark):
    # flat at 100 for 40 obs, then a +3 step: C+ grows linearly after
    # the shift and crosses 5 sigma well before the series ends
    rows = [
        (1, i, _ts(i), "tick", 100.0 + (3.0 if i >= 40 else 0.0))
        for i in range(80)
    ]
    out = (
        cusum(_events(spark, rows), ["user_id"], ["ts", "event_id"], "value")
        .orderBy("event_id")
        .collect()
    )
    flagged = [r["event_id"] for r in out if r["shift_flag"]]
    assert flagged, "level shift never flagged"
    assert min(flagged) >= 40, "flag fired before the shift"
    # C+ is maximal at the end of the shifted run, C- stays ~0 after it
    assert out[-1]["cusum_pos"] > out[45]["cusum_pos"] > 0
    # no-shift control: same construction, flat everywhere
    flat = [(1, i, _ts(i), "tick", 100.0 + (0.5 if i % 2 else -0.5))
            for i in range(80)]
    out_flat = cusum(
        _events(spark, flat), ["user_id"], ["ts", "event_id"], "value"
    ).collect()
    assert not any(r["shift_flag"] for r in out_flat)


def test_cusum_closed_form_matches_recursion(spark):
    # differential vs the textbook recursion C+_i = max(0, C+_{i-1} + d_i)
    import random

    rng = random.Random(7)
    vals = [round(rng.uniform(50, 150), 4) for _ in range(60)]
    rows = [(1, i, _ts(i), "tick", v) for i, v in enumerate(vals)]
    out = (
        cusum(_events(spark, rows), ["user_id"], ["ts", "event_id"], "value")
        .orderBy("event_id")
        .collect()
    )
    mu = sum(vals) / len(vals)
    cp = cn = 0.0
    for i, v in enumerate(vals):
        cp = max(0.0, cp + (v - mu))
        cn = max(0.0, cn + (mu - v))
        assert abs(out[i]["cusum_pos"] - cp) < 1e-6, i
        assert abs(out[i]["cusum_neg"] - cn) < 1e-6, i


def test_funnel_within_seconds_bound(spark):
    """Step credit requires conversion INSIDE the window; the unbounded
    funnel credits the same user."""
    import datetime as dt

    from pyspark.sql import functions as F

    from anomaly_detection_spark.operators.funnel import funnel_times

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, "view"),
        (1, base + dt.timedelta(hours=30), "click"),   # outside 24h
        (2, base, "view"),
        (2, base + dt.timedelta(hours=2), "click"),    # inside
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, event_type string")
    steps = [("view", F.col("event_type") == "view"),
             ("click", F.col("event_type") == "click")]
    bounded = {r.user_id: r.click
               for r in funnel_times(ev, steps, within_seconds=86400).collect()}
    unbounded = {r.user_id: r.click
                 for r in funnel_times(ev, steps).collect()}
    assert bounded[1] is None and unbounded[1] is not None
    assert bounded[2] is not None


def test_robust_z_flags_planted_outlier_not_poisoned(spark):
    """One wild spike must be flagged AND must not poison the rule for
    the rest (the failure mode of mean/stddev z-scores)."""
    import datetime as dt

    from anomaly_detection_spark.detect.robust import robust_z

    rows = [(1, i, 100.0 + (i % 3)) for i in range(20)] + [(1, 99, 100000.0)]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    out = {r.event_id: r for r in robust_z(ev, ["user_id"], "value").collect()}
    assert out[99].robust_flag == 1            # spike flagged
    assert all(out[i].robust_flag == 0 for i in range(20))  # rest clean
    # median/MAD ignore the spike: median stays at the bulk level
    assert abs(out[0].series_median - 101.0) <= 1.0


def test_anomaly_ensemble_consensus_on_planted_spike(spark, sf_dir):
    """Corrupt one event to an extreme value: the robust and IQR rules
    must both vote, producing a consensus flag on exactly that event
    (plus any organic ones)."""
    from pyspark.sql import functions as F

    from anomaly_detection_spark import queries as reg
    from anomaly_detection_spark.sources.tables import load_table

    name = "anomaly_ensemble_events"
    base = reg.QUERIES[name](spark, sf_dir)
    organic = {(r.user_id, r.event_id) for r in
               base.where("consensus").collect()}

    ev = load_table(spark, "events", sf_dir)
    target = ev.orderBy("event_id").first()
    spiked = ev.withColumn(
        "value",
        F.when(F.col("event_id") == target.event_id, 99999.0)
        .otherwise(F.col("value")),
    )
    spiked.createOrReplaceTempView("_ens_spiked")

    # rebuild the same ensemble over the corrupted table
    from anomaly_detection_spark.detect.robust import robust_z
    rz = robust_z(spiked, ["user_id"], "value").select(
        "user_id", "event_id", F.col("robust_flag").alias("robust_vote"))
    from pyspark.sql.window import Window
    wp = Window.partitionBy("user_id")
    q25 = F.expr("percentile(value, 0.25)").over(wp)
    q75 = F.expr("percentile(value, 0.75)").over(wp)
    iqr_vote = F.when(
        (F.col("value") < q25 - 3 * (q75 - q25))
        | (F.col("value") > q75 + 3 * (q75 - q25)), 1).otherwise(0)
    flags = spiked.select(
        "user_id", "event_id", iqr_vote.alias("iqr_vote")
    ).join(rz, ["user_id", "event_id"])
    got = {(r.user_id, r.event_id) for r in
           flags.where("robust_vote + iqr_vote >= 2").collect()}
    assert (target.user_id, target.event_id) in got

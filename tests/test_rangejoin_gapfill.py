"""Bucketed interval join + calendar gap fill: correctness vs naive
plans, and plan-shape guarantees (equi-join, never nested-loop)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from anomaly_detection_spark.operators.gapfill import gap_fill_daily
from anomaly_detection_spark.operators.rangejoin import interval_join
from anomaly_detection_spark.sources.tables import load_table


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _sides(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    intervals = (
        ev.where(F.col("event_type") == "error")
        .select(F.col("event_id").alias("iv_id"), "user_id", "ts")
        .withColumn("win_end", F.col("ts") + F.expr("INTERVAL 45 MINUTES"))
    )
    points = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id",
        F.col("ts").alias("p_ts"), "value",
    )
    return points, intervals


def test_interval_join_matches_naive_inner(spark, sf_dir):
    points, intervals = _sides(spark, sf_dir)
    bucketed = interval_join(
        points, intervals, point_ts="p_ts", start_ts="ts", end_ts="win_end",
        keys=["user_id"], bucket_seconds=1800,
    )
    naive = points.alias("p").join(
        intervals.alias("i"),
        (F.col("p.user_id") == F.col("i.user_id"))
        & (F.col("p.p_ts") >= F.col("i.ts"))
        & (F.col("p.p_ts") < F.col("i.win_end")),
    )
    got = sorted((r.p_id, r.iv_id) for r in bucketed.collect())
    want = sorted((r.p_id, r.iv_id) for r in naive.collect())
    assert got == want
    assert len(got) > 0  # fixture actually exercises matches


def test_interval_join_left_keeps_unmatched(spark, sf_dir):
    points, intervals = _sides(spark, sf_dir)
    out = interval_join(
        points, intervals, point_ts="p_ts", start_ts="ts", end_ts="win_end",
        keys=["user_id"], bucket_seconds=1800, how="left",
    )
    assert out.count() >= points.count()
    assert out.where(F.col("iv_id").isNull()).count() > 0


def test_interval_join_plan_is_equi_join(spark, sf_dir):
    points, intervals = _sides(spark, sf_dir)
    plan = _physical_plan(
        interval_join(points, intervals, point_ts="p_ts", start_ts="ts",
                      end_ts="win_end", keys=["user_id"], bucket_seconds=1800)
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_interval_join_spanning_multiple_buckets(spark):
    # interval wider than the bucket → exploded to several buckets,
    # still exactly one match row per (point, interval) pair
    iv = spark.createDataFrame(
        [(1, 7, datetime.datetime(2024, 1, 1, 0, 0),
          datetime.datetime(2024, 1, 1, 6, 0))],
        "iv_id int, user_id int, ts timestamp_ntz, win_end timestamp_ntz",
    )
    pts = spark.createDataFrame(
        [(10, 7, datetime.datetime(2024, 1, 1, 3, 30)),
         (11, 7, datetime.datetime(2024, 1, 1, 6, 0)),   # end-exclusive
         (12, 7, datetime.datetime(2023, 12, 31, 23, 59))],
        "p_id int, user_id int, p_ts timestamp_ntz",
    )
    got = interval_join(pts, iv, point_ts="p_ts", start_ts="ts",
                        end_ts="win_end", keys=["user_id"],
                        bucket_seconds=3600).collect()
    assert [r.p_id for r in got] == [10]


def test_gap_fill_daily_invariants(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).withColumn(
        "value", F.round("value", 4)
    )
    filled = gap_fill_daily(ev, keys=["user_id"], ts="ts", value="value")
    rows = filled.orderBy("user_id", "day").collect()

    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    src_days = {
        (r.user_id, r.day)
        for r in ev.select("user_id", F.to_date("ts").alias("day")).distinct().collect()
    }
    for uid, urows in by_user.items():
        days = [r.day for r in urows]
        # contiguous daily spine, no holes, no duplicates
        assert days == [days[0] + datetime.timedelta(days=i)
                        for i in range(len(days))]
        # observed flag ⇔ a source observation exists that day
        for r in urows:
            assert r.observed == ((uid, r.day) in src_days)
        # forward fill: value never NULL after the first observed day
        assert all(r.value is not None for r in urows)
        # imputed days carry the previous day's value
        for prev, cur in zip(urows, urows[1:]):
            if not cur.observed:
                assert cur.value == prev.value

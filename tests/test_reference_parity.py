"""Reference-parity tests on the planted-anomaly ticker fixture.

Asserts the flags pipeline and the STL engine fire exactly on the
planted corruptions — the asserted version of the reference's
eyeball-validation loop (SURVEY.md §5).
"""

from __future__ import annotations

import pytest

from anomaly_detection_spark.config import DetectorConfig
from anomaly_detection_spark.detect.rules import rule_flags
from anomaly_detection_spark.detect.stl import stl_iqr_detect

from tests.ticker_fixture import (
    CLEAN_KEYS, EVAL_TS, REPEAT_KEY, SHORT_KEY, SPIKE_KEY, STALE_KEY, fixture_df,
)

KEYS = ["index_id", "granularity_item_id"]


@pytest.fixture(scope="module")
def flags_by_key(spark):
    df = fixture_df(spark)
    cfg = DetectorConfig(eval_ts=EVAL_TS, require_complete=True)
    out = rule_flags(df, KEYS, "data_timestamp", "data_value", cfg, emit="latest")
    rows = out.collect()
    return {(r.index_id, r.granularity_item_id): r for r in rows}


def test_spike_trips_stddev_flag(flags_by_key):
    r = flags_by_key[SPIKE_KEY]
    assert r.standard_deviation_flag == 1
    assert r.anomaly == 1
    assert r.absolute_standard_deviations_from_avg >= 4.5
    # value went UP → signed z positive
    assert r.standard_deviations_from_avg > 0


def test_repetition_trips_repeat_flag(flags_by_key):
    r = flags_by_key[REPEAT_KEY]
    assert r.data_repetitions >= 3
    assert r.data_repetitions_flag == 1
    assert r.anomaly == 1
    # a frozen series must NOT also trip the spike flag (Δ=0 is not a spike)
    assert r.standard_deviation_flag == 0


def test_staleness_trips_update_flag(flags_by_key):
    r = flags_by_key[STALE_KEY]
    assert r.days_since_last_update_flag == 1
    assert r.anomaly == 1
    assert r.days_since_last_update > 5.0


def test_short_series_excluded(flags_by_key):
    assert SHORT_KEY not in flags_by_key


def test_clean_series_raise_no_flags(flags_by_key):
    for key in CLEAN_KEYS:
        r = flags_by_key[key]
        assert r.standard_deviation_flag == 0, key
        assert r.data_repetitions_flag == 0, key
        # eval date is exactly one avg-gap after the last point: not stale
        assert r.days_since_last_update_flag == 0, key
        assert r.anomaly == 0, key


def test_stl_engine_agrees_on_spike(spark):
    df = fixture_df(spark)
    out = stl_iqr_detect(df, KEYS, "data_timestamp", "data_value")
    rows = {(r.index_id, r.granularity_item_id): r for r in out.collect()}
    assert rows[SPIKE_KEY].anomaly == "Yes"
    assert rows[SPIKE_KEY].score > 1.0
    for key in CLEAN_KEYS:
        assert rows[key].anomaly == "No", key
        assert rows[key].score < 1.0, key
    # repetitions summary: prior values equal to the frozen last value
    assert rows[REPEAT_KEY].repetitions == 3


def test_bq_compat_interval_mode(spark):
    """bq_compat floors gaps to whole hours (SURVEY W6): a 1.5-day gap
    reads as 36h→1.5 both ways, but a 90-minute gap floors to 1h."""
    import datetime as dt
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("v", T.DoubleType()),
    ])
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1.0),
        (1, base + dt.timedelta(minutes=90), 2.0),
        (1, base + dt.timedelta(minutes=180), 3.0),
    ]
    df = spark.createDataFrame(rows, schema)
    native = rule_flags(
        df, ["k"], "ts", "v",
        DetectorConfig(eval_ts="2024-01-01 03:00:00"), emit="latest",
    ).collect()[0]
    compat = rule_flags(
        df, ["k"], "ts", "v",
        DetectorConfig(eval_ts="2024-01-01 03:00:00", bq_compat_intervals=True),
        emit="latest",
    ).collect()[0]
    assert native.avg_days_bw_data == pytest.approx(0.0625)   # 90 min exact
    assert compat.avg_days_bw_data == pytest.approx(1 / 24)   # floored to 1 h

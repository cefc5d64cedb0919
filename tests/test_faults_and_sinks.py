"""Fault injection round-trip (the reference's model.R loop, asserted)
and parquet sink round-trip (S5)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.config import DetectorConfig
from anomaly_detection_spark.detect.faults import (
    impute_fakes_newest, sample_series,
)
from anomaly_detection_spark.detect.rules import rule_flags
from tests.ticker_fixture import CLEAN_KEYS, EVAL_TS, fixture_df

KEYS = ["index_id", "granularity_item_id"]


def test_impute_fakes_then_detect(spark):
    """model.R end-to-end: plant a zero-out fake on a clean series'
    newest row → the spike flag must fire there and only there."""
    df = fixture_df(spark)
    victim = CLEAN_KEYS[0]
    corrupted = impute_fakes_newest(
        df, KEYS, "data_timestamp", "data_value", factor=0.0,
        key_filter=(F.col("index_id") == victim[0])
        & (F.col("granularity_item_id") == victim[1]),
    )
    # the zero landed exactly once
    assert corrupted.where("data_value = 0.0").count() == 1
    out = rule_flags(
        corrupted, KEYS, "data_timestamp", "data_value",
        DetectorConfig(eval_ts=EVAL_TS), emit="latest",
    )
    flags = {
        (r.index_id, r.granularity_item_id): r.standard_deviation_flag
        for r in out.collect()
    }
    assert flags[victim] == 1
    for k in CLEAN_KEYS[1:]:
        assert flags[k] == 0, k


def test_sample_series_is_deterministic_and_serieswise(spark):
    df = fixture_df(spark)
    s1 = sample_series(df, KEYS, 0.5, seed=7)
    s2 = sample_series(df, KEYS, 0.5, seed=7)
    assert sorted(r.id for r in s1.collect()) == sorted(r.id for r in s2.collect())
    # series-wise: each key is fully in or fully out
    per_key = {
        (r.index_id, r.granularity_item_id): r["count"]
        for r in df.groupBy(*KEYS).count().collect()
    }
    for r in s1.groupBy(*KEYS).count().collect():
        assert r["count"] == per_key[(r.index_id, r.granularity_item_id)]


def test_parquet_sink_roundtrip(spark):
    """S5: write the flags result partitioned by date, read it back."""
    df = fixture_df(spark)
    out = rule_flags(
        df, KEYS, "data_timestamp", "data_value",
        DetectorConfig(eval_ts=EVAL_TS), emit="all",
    ).withColumn("dt", F.to_date("date_recorded"))
    d = tempfile.mkdtemp()
    try:
        path = os.path.join(d, "flags")
        out.write.mode("overwrite").partitionBy("dt").parquet(path)
        back = spark.read.parquet(path)
        assert back.count() == out.count()
        # partition pruning works on the date column
        one_day = back.where(F.col("dt") == "2024-02-29")
        assert one_day.count() == out.where("date_recorded >= '2024-02-29'").count()
    finally:
        shutil.rmtree(d, ignore_errors=True)

#!/usr/bin/env python
"""The reference user's daily job, ported 1:1.

Reference flow (model.R): load trailing-28 rows per ticker with a
pushdown predicate → plant test fakes → run the detector over every
ticker → enrich with both dim tables → inspect worst-first.

Here the same flow runs on Spark against the synthetic ticker fixture
(swap ``fixture_df``/dims for your parquet tables):

    python examples/daily_job.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from anomaly_detection_spark.config import DetectorConfig
from anomaly_detection_spark.detect.faults import impute_fakes_newest, sample_series
from anomaly_detection_spark.detect.master import (
    master_anomaly_detector, master_rule_flags,
)
from anomaly_detection_spark.session import get_spark

from tests.ticker_fixture import EVAL_TS, fixture_df, gran_dim_df, info_dim_df

KEYS = ["index_id", "granularity_item_id"]


def main() -> None:
    spark = get_spark("daily-job")
    spark.sparkContext.setLogLevel("ERROR")

    # --- load (model.R:5-7: days_of_data=28, target_date, where_clause) ----
    cfg = DetectorConfig(
        eval_ts=EVAL_TS,
        data_periods=28,
        require_complete=True,
        predicate=F.col("index_id") < 10_000,  # the where_clause, as a Column
    )
    ticker_data = fixture_df(spark)
    ticker_gran = gran_dim_df(spark)
    ticker_info = info_dim_df(spark)

    # --- plant fakes on 25% of series (model.R:12-18) -----------------------
    victims = sample_series(ticker_data.select(*KEYS).distinct(), KEYS, 0.25)
    victim_filter = F.lit(False)
    for idx, gran in [tuple(r) for r in victims.collect()]:
        victim_filter = victim_filter | (
            (F.col("index_id") == idx) & (F.col("granularity_item_id") == gran)
        )
    corrupted = impute_fakes_newest(
        ticker_data, KEYS, "data_timestamp", "data_value",
        factor=0.0, key_filter=victim_filter,
    )

    # --- engine 1: SQL-engine flags, full 26-col output, worst-first --------
    flags = master_rule_flags(corrupted, ticker_gran, ticker_info, cfg, emit="latest")
    print("=== rule flags (worst anomalies first) ===")
    flags.select(
        "ticker", "granularity", "anomaly", "standard_deviation_flag",
        "data_repetitions_flag", "days_since_last_update_flag",
        "absolute_standard_deviations_from_avg",
    ).show(10, truncate=False)

    # --- engine 2: STL/IQR detector, the R engine's anomaly_df --------------
    anomaly_df = master_anomaly_detector(corrupted, ticker_gran, ticker_info, cfg)
    print("=== decomposition detector ===")
    anomaly_df.select(
        "ticker_index", "anomaly", "value", "seven_day_avg", "score",
        "repetitions", "frequency", "index_name",
    ).orderBy(F.desc("score")).show(10, truncate=False)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""The reference's daily batch, re-run as a live stream.

The reference schedules ``model.R`` once a day ("Automate script" is
still a TODO at ``func.R:3``). This example is the Structured-Streaming
version of that job: ticker observations arrive as files dropped into
a directory, and the engine emits

  1. watermarked daily window stats per series,
  2. rule-engine anomaly flags per arrival (stateful trailing-28
     window, same thresholds as the batch engine),

continuously, with late data handled by watermark instead of the
nightly full recompute.

Run:  python examples/streaming_job.py
(uses a temp dir as the drop zone and availableNow triggers so the
example terminates; a real deployment replaces the source path and
drops the trigger for 24/7 operation.)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from anomaly_detection_spark.config import DetectorConfig
from anomaly_detection_spark.session import get_spark
from anomaly_detection_spark.sources.io import stream_source, write_sink
from anomaly_detection_spark.streaming.rules_stream import (
    stateful_trailing_flags, windowed_series_stats,
)

from tests.ticker_fixture import fixture_df

SCHEMA = (
    "index_id long, granularity_item_id long, data_timestamp timestamp, "
    "data_value double"
)
KEYS = ["index_id", "granularity_item_id"]


def main() -> None:
    spark = get_spark("streaming-job")
    spark.sparkContext.setLogLevel("ERROR")

    drop_zone = tempfile.mkdtemp(prefix="ticker_drop_")
    # simulate the upstream feed: the batch fixture arrives as files
    feed = fixture_df(spark).select(
        *KEYS,
        F.col("data_timestamp").cast("timestamp").alias("data_timestamp"),
        "data_value",
    )
    write_sink(feed.repartition(8), drop_zone, fmt="parquet")

    stream = stream_source(spark, drop_zone, "parquet", SCHEMA,
                           maxFilesPerTrigger="4")

    # 1. daily windowed stats with a 2-day watermark for late arrivals
    daily = windowed_series_stats(
        stream, keys=KEYS, ts_col="data_timestamp", value_col="data_value",
        window="1 day", watermark="2 days",
    )
    q1 = (
        daily.writeStream.format("memory").queryName("daily_stats")
        .outputMode("append").trigger(availableNow=True).start()
    )

    # 2. full rule-flags engine per arrival (stateful trailing window);
    # the stateful operator keys on one numeric series id — pack the
    # composite (index_id, granularity_item_id) into it
    keyed = stream.select(
        (F.col("index_id") * 1_000_000 + F.col("granularity_item_id"))
        .alias("series_id"),
        "data_timestamp", "data_value",
    )
    flags = stateful_trailing_flags(
        keyed, key="series_id", ts_col="data_timestamp",
        value_col="data_value", data_periods=28,
    )
    q2 = (
        flags.writeStream.format("memory").queryName("live_flags")
        .outputMode("append").trigger(availableNow=True).start()
    )

    q1.awaitTermination(300)
    q2.awaitTermination(300)

    print("=== daily windowed stats (sample) ===")
    spark.sql(
        "select * from daily_stats order by index_id, granularity_item_id, "
        "window_start limit 10"
    ).show(truncate=False)

    print("=== live anomaly flags (flagged rows) ===")
    spark.sql(
        "select series_id div 1000000 as index_id, "
        "series_id % 1000000 as granularity_item_id, ts, value, "
        "standard_deviation_flag, data_repetitions_flag, "
        "days_since_last_update_flag, anomaly from live_flags "
        "where anomaly = 1 order by ts desc limit 10"
    ).show(truncate=False)


if __name__ == "__main__":
    main()

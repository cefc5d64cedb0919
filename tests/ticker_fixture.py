"""Deterministic ticker fixture with planted anomalies (FIXTURES.md Set A).

Reproduces the reference's own validation technique — ``impute_fakes``
(func.R:73-80, model.R:12-18): build clean synthetic series, corrupt
chosen ones in known ways, assert the detectors fire exactly there.

Seed 42, pinned eval date. Series are daily unless noted.
"""

from __future__ import annotations

import datetime as dt
import math
import random

EVAL_TS = "2024-03-01 00:00:00"  # one day after the last clean observation
BASE_DATE = dt.datetime(2024, 1, 21)  # 40 daily points → Jan 21..Feb 29
N_DAYS = 40

# (index_id, granularity_item_id) → planted condition
SPIKE_KEY = (1, 1)        # last value ×10 → standard_deviation_flag
REPEAT_KEY = (1, 2)       # last 4 values frozen → data_repetitions_flag
STALE_KEY = (2, 1)        # last 5 days missing → days_since_last_update_flag
SHORT_KEY = (2, 4)        # only 10 rows → dropped by completeness filter
CLEAN_KEYS = [(1, 3), (1, 4), (2, 2), (2, 3)]
ALL_KEYS = [SPIKE_KEY, REPEAT_KEY, STALE_KEY, SHORT_KEY] + CLEAN_KEYS


def build_rows() -> list[dict]:
    rng = random.Random(42)
    rows: list[dict] = []
    rid = 0
    for (idx, gran) in ALL_KEYS:
        n = 10 if (idx, gran) == SHORT_KEY else N_DAYS
        base = 100.0 + 10 * idx + gran
        series = []
        for t in range(n):
            ts = BASE_DATE + dt.timedelta(days=t)
            season = 3.0 * math.sin(2 * math.pi * (t % 7) / 7.0)
            noise = rng.gauss(0, 0.8)
            value = round(base + 0.2 * t + season + noise, 4)
            series.append((ts, value))
        if (idx, gran) == SPIKE_KEY:
            ts, v = series[-1]
            series[-1] = (ts, round(v * 10, 4))  # impute_fakes factor=10
        elif (idx, gran) == REPEAT_KEY:
            frozen = series[-4][1]
            series = series[:-4] + [(ts, frozen) for ts, _ in series[-4:]]
        elif (idx, gran) == STALE_KEY:
            series = series[:-5]  # truncate → 5-day gap to eval date
        for ts, v in series:
            rows.append({
                "id": rid, "index_id": idx, "granularity_item_id": gran,
                "data_timestamp": ts, "data_value": v, "createdate": ts,
            })
            rid += 1
    return rows


def fixture_df(spark):
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("index_id", T.LongType()),
        T.StructField("granularity_item_id", T.LongType()),
        T.StructField("data_timestamp", T.TimestampNTZType()),
        T.StructField("data_value", T.DoubleType()),
        T.StructField("createdate", T.TimestampNTZType()),
    ])
    return spark.createDataFrame(build_rows(), schema=schema)


def gran_dim_df(spark):
    """FIXTURES.md A2 — mirrors indx_granularity_item (capital-D
    Description preserved: the reference selects it case-sensitively)."""
    rows = [
        (g, f"G{g}", f"alt{g}", f"City {g}, ST", f"shape_{g}.shp")
        for g in sorted({k[1] for k in ALL_KEYS})
    ]
    return spark.createDataFrame(
        rows, "id long, granularity1 string, granularity2 string, "
              "Description string, ShapeFile string"
    )


def info_dim_df(spark):
    """FIXTURES.md A3 — mirrors indx_index_definition."""
    rows = [
        (i, f"Index {i} Price", f"TCK{i}", f"Ticker {i} long description",
         "daily", "US Dollars", "$", f"https://docs.example/{i}")
        for i in sorted({k[0] for k in ALL_KEYS})
    ]
    return spark.createDataFrame(
        rows, "id long, index_name string, ticker string, description string, "
              "frequency string, unit_type string, display_unit_type string, "
              "documentation_url string"
    )

"""master_anomaly_detector parity: exact output schema of the
reference's anomaly_df (verified from the saved workspace, SURVEY §1.2)
and correct dim enrichment."""

from __future__ import annotations

from anomaly_detection_spark.config import DetectorConfig
from anomaly_detection_spark.detect.master import master_anomaly_detector

from tests.ticker_fixture import (
    EVAL_TS, SPIKE_KEY, fixture_df, gran_dim_df, info_dim_df,
)

EXPECTED_COLUMNS = [
    "data_timestamp", "index", "region", "ticker_index", "anomaly",
    "value", "seven_day_avg", "score", "repetitions", "frequency",
    "alleged_freq", "granularity", "granularity_desc", "index_name",
    "ticker", "ticker_desc", "display_unit_type", "documentation_url",
]


def test_output_schema_matches_reference(spark):
    out = master_anomaly_detector(
        fixture_df(spark), gran_dim_df(spark), info_dim_df(spark),
        DetectorConfig(eval_ts=EVAL_TS),
    )
    assert out.columns == EXPECTED_COLUMNS


def test_enrichment_and_detection(spark):
    out = master_anomaly_detector(
        fixture_df(spark), gran_dim_df(spark), info_dim_df(spark),
        DetectorConfig(eval_ts=EVAL_TS),
    ).collect()
    # r["index"] not r.index: Row.index is the namedtuple method
    rows = {(r["index"], r["region"]): r for r in out}
    spike = rows[SPIKE_KEY]
    assert spike.anomaly == "Yes"
    assert spike.ticker_index == f"{SPIKE_KEY[0]}_{SPIKE_KEY[1]}"
    assert spike.granularity == f"G{SPIKE_KEY[1]}"
    assert spike.granularity_desc == f"City {SPIKE_KEY[1]}, ST"
    assert spike.index_name == f"Index {SPIKE_KEY[0]} Price"
    assert spike.ticker == f"TCK{SPIKE_KEY[0]}"
    assert spike.alleged_freq == "daily"
    # measured frequency: daily cadence → 1.0 day
    assert abs(spike.frequency - 1.0) < 1e-9

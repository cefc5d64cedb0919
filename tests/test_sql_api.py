"""SQL surface ⇔ DataFrame engine parity.

The generated Spark SQL flags statement (sql_api.py) must return
bit-identical rows to detect/rules.py — same exact-integer statistics,
same rounding, same run-length rewrite — across emit modes.
"""

from __future__ import annotations

from anomaly_detection_spark.config import DetectorConfig
from anomaly_detection_spark.detect.rules import rule_flags
from anomaly_detection_spark.sources.tables import load_table
from anomaly_detection_spark.sql_api import register_views, run_rule_flags_sql

EVAL_TS = "2024-02-01 00:00:00"

COLS = [
    "user_id", "date_recorded", "value", "previous_value",
    "previous_seven_period_avg", "absolute_one_period_difference", "average",
    "standard_deviation", "absolute_standard_deviations_from_avg",
    "standard_deviations_from_avg", "data_repetitions", "avg_days_bw_data",
    "days_since_last_update", "standard_deviation_flag",
    "data_repetitions_flag", "days_since_last_update_flag", "anomaly",
]


def _rows(df):
    return sorted(tuple(r) for r in df.select(*COLS).collect())


def test_sql_port_matches_dataframe_engine(spark, sf_dir):
    cfg = DetectorConfig(eval_ts=EVAL_TS)
    ev = load_table(spark, "events", sf_dir)
    for emit in ("latest", "all"):
        df_engine = rule_flags(ev, ["user_id"], "ts", "value", cfg, emit=emit)
        sql_engine = run_rule_flags_sql(spark, sf_dir, cfg=cfg, emit=emit)
        assert _rows(df_engine) == _rows(sql_engine), f"emit={emit}"


def test_register_views_ad_hoc_sql(spark, sf_dir):
    register_views(spark, sf_dir, tables=("events", "documents"))
    n = spark.sql(
        "SELECT count(DISTINCT user_id) AS u FROM events"
    ).first().u
    assert n > 0
    joined = spark.sql("""
        SELECT lang, count(*) AS n FROM documents GROUP BY lang
    """)
    assert joined.count() >= 1

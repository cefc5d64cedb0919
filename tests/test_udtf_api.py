"""The SQL-callable UDTF surface must match the applyInPandas engine
row-for-row (same numpy kernels, two execution surfaces)."""

from __future__ import annotations

import pandas as pd

from anomaly_detection_spark.detect.stl import stl_iqr_detect
from anomaly_detection_spark.detect.udtf_api import register_detect_udtf
from anomaly_detection_spark.sources.tables import load_table


def _canon(rows):
    out = []
    for r in rows:
        d = r.asDict()
        out.append((
            d["k"] if "k" in d else d["user_id"],
            d["data_timestamp"],
            round(d["value"], 9),
            round(d["seven_day_avg"], 9),
            round(d["score"], 9),
            d["anomaly"],
            d["repetitions"],
            round(d["frequency"], 9),
        ))
    return sorted(out)


def test_udtf_matches_applyinpandas_engine(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    ev.createOrReplaceTempView("ev_udtf_src")
    register_detect_udtf(spark)
    sql_out = spark.sql("""
        SELECT * FROM detect_series(
            TABLE(SELECT user_id AS k, ts, value AS v FROM ev_udtf_src)
            PARTITION BY k ORDER BY ts)
    """)
    df_out = stl_iqr_detect(ev, ["user_id"], "ts", "value")
    got, want = _canon(sql_out.collect()), _canon(df_out.collect())
    assert len(got) > 0
    assert got == want


def test_udtf_min_points_gate(spark):
    rows = [(1, "2024-01-01 00:00:00", 1.0)]  # single observation
    df = spark.createDataFrame(rows, "k long, ts string, v double") \
        .selectExpr("k", "cast(ts as timestamp) ts", "v")
    df.createOrReplaceTempView("ev_udtf_single")
    register_detect_udtf(spark, name="detect_series_minpts")
    out = spark.sql("""
        SELECT * FROM detect_series_minpts(
            TABLE(SELECT k, ts, v FROM ev_udtf_single)
            PARTITION BY k ORDER BY ts)
    """)
    assert out.count() == 0


def test_grouped_agg_pandas_udf_matches_builtin(spark, sf_dir):
    """The GROUPED_AGG pandas UDF surface (the last pandas-API variant
    the engine exposes nowhere else): a vectorized mean must equal the
    built-in JVM avg both as a groupBy aggregate and over a window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from anomaly_detection_spark.sources.tables import load_table

    @pandas_udf("double")
    def pmean(v: pd.Series) -> float:
        return float(v.mean())

    ev = load_table(spark, "events", sf_dir).select("user_id", "value")
    a = {
        r.user_id: round(r.m, 6)
        for r in ev.groupBy("user_id").agg(pmean("value").alias("m")).collect()
    }
    b = {
        r.user_id: round(r.m, 6)
        for r in ev.groupBy("user_id").agg(F.avg("value").alias("m")).collect()
    }
    assert a == b
    w = Window.partitionBy("user_id")
    c = ev.select(
        "user_id",
        pmean("value").over(w).alias("pm"),
        F.avg("value").over(w).alias("jm"),
    ).where(F.round("pm", 6) != F.round("jm", 6)).count()
    assert c == 0

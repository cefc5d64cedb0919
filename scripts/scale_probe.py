#!/usr/bin/env python
"""Scale probe: replicate the events table K× with shifted key spaces
(growing key cardinality, fixed rows-per-key — the 100 TB shape) and
measure the two detection engines. Prints one JSON line per scale.

Usage: python scripts/scale_probe.py [K ...]   (default: 1 5 20)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from anomaly_detection_spark.config import DetectorConfig
from anomaly_detection_spark.detect.rules import rule_flags
from anomaly_detection_spark.detect.stl import stl_iqr_detect
from anomaly_detection_spark.session import get_spark
from anomaly_detection_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated(spark, k: int):
    ev = load_table(spark, "events", SF_DIR)
    copies = spark.range(k).withColumnRenamed("id", "_copy")
    return (
        ev.crossJoin(F.broadcast(copies))
        .withColumn("user_id", F.col("user_id") + F.col("_copy") * 1_000_000)
        .drop("_copy")
        .repartition(spark.sparkContext.defaultParallelism)
    )


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 5, 20]
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for k in ks:
        df = replicated(spark, k)
        n_rows = df.count()  # also warms the replicate
        t0 = time.monotonic()
        n_flags = rule_flags(
            df, ["user_id"], "ts", "value",
            DetectorConfig(eval_ts="2024-02-01"), emit="latest",
        ).count()
        t_rules = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        n_stl = stl_iqr_detect(df, ["user_id"], "ts", "value").count()
        t_stl = round(time.monotonic() - t0, 2)
        print(json.dumps({
            "k": k, "rows": n_rows, "series": n_flags,
            "rules_sec": t_rules, "stl_sec": t_stl,
            "stl_series_per_sec": round(n_stl / t_stl, 1),
        }))


if __name__ == "__main__":
    main()

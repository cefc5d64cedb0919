#!/usr/bin/env python
"""Round-5 scale probe: replicate the sf0.1 fixtures K× with shifted
key spaces (key cardinality grows, rows-per-key fixed — the 100 TB
shape) into a temp dir and run the REGISTERED round-5 heavy queries on
it, so the measured plan is exactly the driver-facing one.

Events probes: HBOS, Poisson-bootstrap CI, Holt-Winters, Page-Hinkley,
Markov removal attribution, Ljung-Box.  Docs probes: PPJoin (bitmask
regime at 1x; token-suffix replication grows the vocabulary past 64,
flipping it onto the full prefix stack — both regimes reported),
k-core, dedup-detector eval.

Usage: python scripts/scale_probe_r5.py [K ...]   (default: 1 5 20)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from anomaly_detection_spark import queries as reg
from anomaly_detection_spark.session import get_spark
from anomaly_detection_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

EVENT_QUERIES = [
    "hbos_outlier_events",
    "bootstrap_mean_ci_events",
    "holt_winters_user",
    "page_hinkley_users",
    "markov_removal_attribution",
    "ljung_box_users",
]
DOC_QUERIES = [
    "ppjoin_jaccard_pairs",
    "kcore_dup_graph",
    "dedup_detector_eval",
]


def write_replicated(spark, k: int) -> str:
    d = tempfile.mkdtemp(prefix=f"r5probe_k{k}_")
    copies = spark.range(k).withColumnRenamed("id", "_copy")
    ev = (
        load_table(spark, "events", SF_DIR)
        .crossJoin(F.broadcast(copies))
        .withColumn("user_id", F.col("user_id") + F.col("_copy") * 1_000_000)
        .withColumn(
            "event_id", F.col("event_id") + F.col("_copy") * 1_000_000_000
        )
        .drop("_copy")
    )
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    docs = (
        load_table(spark, "documents", SF_DIR)
        .crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") + F.col("_copy") * 10_000_000).alias("doc_id"),
            # disjoint replica token spaces: duplicate density constant
            F.array_join(
                F.transform(
                    F.split(F.trim("text"), r"\s+"),
                    lambda t: F.concat(t, F.lit("_"), F.col("_copy")),
                ),
                " ",
            ).alias("text"),
            "lang", "n_chars", "source",
        )
    )
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 5, 20]
    spark = get_spark("scale-probe-r5")
    spark.sparkContext.setLogLevel("ERROR")
    for k in ks:
        d = write_replicated(spark, k)
        out = {"k": k}
        for name in EVENT_QUERIES + DOC_QUERIES:
            t0 = time.monotonic()
            n = reg.QUERIES[name](spark, d).count()
            out[name] = round(time.monotonic() - t0, 2)
            out[f"{name}_rows"] = n
            spark.catalog.clearCache()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-6 scale probe: same protocol as scale_probe_r5.py — replicate
the sf0.1 fixtures K× with shifted key spaces (key cardinality grows,
rows-per-key fixed, the 100 TB shape; replica token spaces disjoint so
duplicate density stays constant) and time the REGISTERED round-6
queries on it, so the measured plan is exactly the driver-facing one.

Events probes: SPRT walk, Kendall tau-b, empirical-Bayes shrinkage,
Welch's t, Jensen-Shannon, the CDC streaming replay.  Docs probes:
PNG round-trip, exact AUC.

Usage: python scripts/scale_probe_r6.py [K ...]   (default: 1 5 20)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anomaly_detection_spark import queries as reg
from anomaly_detection_spark.session import get_spark
from scripts.scale_probe_r5 import write_replicated

EVENT_QUERIES = [
    "sprt_conversion_users",
    "kendall_tau_users",
    "eb_shrunk_conversion_users",
    "welch_t_drift_types",
    "jensen_shannon_types",
    "streaming_cdc_state_events",
]
DOC_QUERIES = [
    "png_roundtrip_media",
    "auc_quality_classifier",
]


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 5, 20]
    spark = get_spark("scale-probe-r6")
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

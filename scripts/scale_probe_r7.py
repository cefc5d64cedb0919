#!/usr/bin/env python
"""Round-7 scale probe: same protocol as scale_probe_r5/r6 — replicate
the sf0.1 fixtures K× with shifted key spaces (key cardinality grows,
rows-per-key fixed, the 100 TB shape; replica token spaces disjoint so
duplicate density stays constant) and time the REGISTERED queries on
it, so the measured plan is exactly the driver-facing one.

Targets (r6 verdict item 8): the backlog's heaviest members —
markov_removal_attribution (12 power iterations × removed channels on
a dictionary-sized transition table: the iteration count is FIXED and
the table is |channels|², so wall time should be flat in corpus size)
and ndcg_dup_retrieval (one doc-keyed shuffle + bounded top-k) — plus
the round's new jpeg_roundtrip_media (per-row codec kernel, linear).

Usage: python scripts/scale_probe_r7.py [K ...]   (default: 1 5 20)
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
    "markov_removal_attribution",
]
DOC_QUERIES = [
    "ndcg_dup_retrieval",
    "jpeg_roundtrip_media",
]


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 5, 20]
    spark = get_spark("scale-probe-r7")
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

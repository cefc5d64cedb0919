#!/usr/bin/env python
"""Round-10 probe: replication-protocol scaling rows for the two r10
registrations.

- ``friedman_test_event_types``: the complete user x event_type grid
  grows linearly in users (replication multiplies the user keyspace,
  the treatment dictionary stays fixed), per-block ranking is a
  many-small-groups window (each block is k rows in one task), and
  everything downstream is dictionary- or scalar-sized.  Expected
  flat-to-linear.
- ``domain_length_deciles_docs``: the GROUPED rank family's
  few-large-groups shape — replication multiplies documents while the
  source dictionary stays fixed, so each domain's group grows k x.
  This is exactly the regime the grouped path exists for (a plain
  ntile window would funnel each domain through one task); expected
  linear with no per-group wall.

Protocol identical to the r5/r9 probes: replicate the sf0.1 tables K
times into disjoint key spaces, run the REGISTERED query callable,
report wall seconds + output rows per K.

Usage: python scripts/scale_probe_r10.py
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


def main() -> None:
    spark = get_spark("scale-probe-r10")
    spark.sparkContext.setLogLevel("ERROR")
    for k in (1, 5, 20):
        d = write_replicated(spark, k)
        out = {"k": k}
        for name in ("friedman_test_event_types",
                     "domain_length_deciles_docs"):
            t0 = time.monotonic()
            n = reg.QUERIES[name](spark, d).count()
            out[name] = round(time.monotonic() - t0, 2)
            out[f"{name}_rows"] = n
        print(json.dumps(out), flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-9 probe: replication-protocol scaling rows for the two r8
registrations (r8 verdict item 8) — neither joined the bench set (the
recorded rationale: both exercise already-benched plan shapes), so
neither had a scaling measurement yet.

- ``adjusted_rand_embeddings``: nearest-centroid assignment (n x K
  broadcast dictionary) + a contingency groupBy whose output is
  |clusters| x |labels| (dictionary-sized) + three 1-row scalar
  crosses.  Expected flat-to-linear in corpus size at pinned K.
- ``fellegi_sunter_weights``: planted m/u pair sets built by KEYED
  joins (doc_id == doc_id, doc_id == doc_id + 1) — no candidate blowup
  by construction — then a 4-field agreement count and a dictionary-
  sized weight table.  Expected linear.

Protocol identical to the r5/r7b probes: replicate the sf0.1 table K
times into disjoint key spaces (embeddings get the component-0 nudge so
replicas are near- but not exact duplicates), run the REGISTERED query
callable, report wall seconds + output rows per K.

Usage: python scripts/scale_probe_r9.py
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
from scripts.scale_probe_r7b import write_replicated_embeddings


def main() -> None:
    spark = get_spark("scale-probe-r9")
    spark.sparkContext.setLogLevel("ERROR")
    for k in (1, 2, 4, 8):
        d = write_replicated_embeddings(spark, k)
        t0 = time.monotonic()
        n = reg.QUERIES["adjusted_rand_embeddings"](spark, d).count()
        print(json.dumps({
            "k_emb": k,
            "adjusted_rand_embeddings": round(time.monotonic() - t0, 2),
            "rows": n,
        }), flush=True)
        spark.catalog.clearCache()
    for k in (1, 5, 20):
        d = write_replicated(spark, k)
        t0 = time.monotonic()
        n = reg.QUERIES["fellegi_sunter_weights"](spark, d).count()
        print(json.dumps({
            "k_docs": k,
            "fellegi_sunter_weights": round(time.monotonic() - t0, 2),
            "rows": n,
        }), flush=True)
        spark.catalog.clearCache()
    # round-9 registrations, same events replicator (disjoint user key
    # spaces -> per-user series identical per replica; durbin_watson is
    # one per-user window, kendall_w ranks the complete type x user
    # grid so its n_items grows k-fold)
    for k in (1, 5, 20):
        d = write_replicated(spark, k)
        out = {"k_events": k}
        for name in ("durbin_watson_users", "kendall_w_event_types"):
            t0 = time.monotonic()
            n = reg.QUERIES[name](spark, d).count()
            out[name] = round(time.monotonic() - t0, 2)
            out[f"{name}_rows"] = n
            spark.catalog.clearCache()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

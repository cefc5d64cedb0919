#!/usr/bin/env python
"""Round-8 probe: the IVF doctrine DEMONSTRATED for the cell-scoped
quadratics (r7 verdict item 5).

The r7 probe measured the cost of VIOLATING the bounded-cell contract:
with the registered fixture's PINNED 8 centroids, replicating the
corpus K× grows every cell K× and the per-cell pair stage ~K²
(lof_embeddings 16 → 105 s at 1× → 4×).  This probe measures the
COMPLIANT regime the production contract states: the centroid count
scales with the corpus (8 centroids per replica — K_cells = 8·copies,
one centroid seeded from each replica's own key space), so the
expected per-cell population is constant and total cost is ~linear in
the corpus.

Protocol: same replicator as scale_probe_r7b (vec_id shift + a
copy-dependent nudge on component 0 so replicas are near- but not
exact duplicates); the operators run through the SAME pipeline
functions the registered queries call
(`pipeline/similarity.py:local_outlier_factor / twonn_intrinsic_dim`),
only the centroid SELECTION widens from `vec_id < 8` to 8 per replica.

Usage: python scripts/scale_probe_r8.py [copies ...]  (default 1 2 4 8)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from anomaly_detection_spark.pipeline.similarity import (
    local_outlier_factor,
    nonzero_vectors,
    twonn_intrinsic_dim,
)
from anomaly_detection_spark.session import get_spark
from anomaly_detection_spark.sources.tables import load_table
from scripts.scale_probe_r7b import write_replicated_embeddings


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    spark = get_spark("scale-probe-r8")
    spark.sparkContext.setLogLevel("ERROR")
    for k in ks:
        d = write_replicated_embeddings(spark, k)
        emb = nonzero_vectors(load_table(spark, "embeddings", d))
        # 8 centroids PER replica: replica j's ids are j*10M + orig,
        # so `vec_id % 10M < 8` seeds 8 centroids from every replica's
        # own key space — K_cells = 8k while cells stay ~constant.
        centroids = emb.where(F.col("vec_id") % 10_000_000 < 8).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        out = {"copies": k, "n_centroids": 8 * k}
        for name, fn in (
            ("lof_compliant", lambda: local_outlier_factor(
                emb, centroids, k=3)),
            ("twonn_compliant", lambda: twonn_intrinsic_dim(
                emb, centroids)),
        ):
            t0 = time.monotonic()
            n = fn().count()
            out[name] = round(time.monotonic() - t0, 2)
            out[f"{name}_rows"] = n
            spark.catalog.clearCache()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

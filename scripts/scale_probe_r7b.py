#!/usr/bin/env python
"""Round-7 session-2 scale probe — same protocol as scale_probe_r5/r6/r7
(replicate the sf0.1 fixtures K× with shifted key spaces: key
cardinality grows, rows-per-key fixed, the 100 TB shape) over the
queries added this session.

Events queries (per-user bounded arrays or dictionary aggregations —
expected flat-to-linear): pettitt_changepoint_users (O(n²) fold per
key), discord_matrix_profile_users (13×13 pairs per key),
burstiness_memory_users, pacf_lag2_users, runs_test_users,
anova_f_value_types / brown_forsythe_types / cramers_v_type_weekday
(dictionary trees).

Embedding queries get their own replicator (vec_id shift + a
copy-dependent nudge on one component so replicas aren't exact
duplicates): kmeans_update_embeddings is one posexplode fold
(linear); lof_embeddings is CELL-scoped quadratic and the registered
fixture pins K = 8 centroids, so replicating the corpus grows every
cell K× and the pair stage ~K² — that is the DOCUMENTED regime, and
the production contract is the IVF doctrine (centroid count scales
with the corpus, cells stay bounded), so lof is probed at 1/2/4 and
the quadratic read as cell-growth, not a plan defect.

Usage: python scripts/scale_probe_r7b.py [K ...]   (default: 1 5 20)
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
from scripts.scale_probe_r5 import SF_DIR, write_replicated

EVENT_QUERIES = [
    "pettitt_changepoint_users",
    "discord_matrix_profile_users",
    "burstiness_memory_users",
    "pacf_lag2_users",
    "runs_test_users",
    "anova_f_value_types",
    "brown_forsythe_types",
    "cramers_v_type_weekday",
    # -- wave 2/3 --
    "granger_lag_users",
    "icss_variance_changepoint_users",
    "cooks_distance_users",
    "ansari_bradley_types",
    "littles_law_sessions",
    "dau_wau_stickiness",
    "max_drawdown_users",
    "peak_prominence_users",
    "trapezoid_exposure_users",
    # -- wave 4 --
    "aj_cumulative_incidence",
    "wilcoxon_signed_rank_users",
    "circular_hour_stats",
    "cochran_q_weekly_activity",
    "rdd_cutoff_daily_events",
    "mcf_recurrent_purchases",
    "jonckheere_trend_dayparts",
    "partial_corr_err_purchase",
]
DOC_QUERIES = [
    "spearman_tokens_docs",
    "padding_efficiency_buckets",
    "mcnemar_rule_classifier",
    "capture_recapture_dups",
    "ipf_raking_lang_source",
    "assortativity_dup_graph",
    "term_burstiness_corpus",
]
EMB_QUERIES = [
    "knn_hubness_embeddings",
    "morans_i_embedding_grid",
    "kmeans_update_embeddings",
    "lof_embeddings",
    "twonn_intrinsic_dim",
]


def write_replicated_embeddings(spark, k: int) -> str:
    d = tempfile.mkdtemp(prefix=f"r7bprobe_emb_k{k}_")
    copies = spark.range(k).withColumnRenamed("id", "_copy")
    emb = (
        load_table(spark, "embeddings", SF_DIR)
        .crossJoin(F.broadcast(copies))
        .select(
            (F.col("vec_id") + F.col("_copy") * 10_000_000).alias("vec_id"),
            # nudge one component per copy so replicas are near- but
            # not exact duplicates (exact dups saturate LOF kNN sets)
            F.expr(
                "transform(embedding, (x, i) -> CAST(x AS DOUBLE)"
                " + IF(i = 0, _copy * 0.001, 0.0))"
            ).alias("embedding"),
            *[c for c in load_table(spark, "embeddings", SF_DIR).columns
              if c not in ("vec_id", "embedding")],
        )
    )
    emb.write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    return d


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 5, 20]
    spark = get_spark("scale-probe-r7b")
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
    for k in (1, 2, 4):
        d = write_replicated_embeddings(spark, k)
        out = {"k_emb": k}
        for name in EMB_QUERIES:
            t0 = time.monotonic()
            n = reg.QUERIES[name](spark, d).count()
            out[name] = round(time.monotonic() - t0, 2)
            out[f"{name}_rows"] = n
            spark.catalog.clearCache()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

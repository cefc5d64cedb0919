"""Round-7 tests: the r6 ADVICE fixes.

1. ``encode_png`` rejects zero-dimension rasters (mirrors
   ``decode_png``'s degenerate-dimensions rejection, so the
   encode->decode round-trip contract holds for every accepted input).
2. ``oracle_check._view_path`` rejects dataset paths containing glob
   metacharacters instead of handing DuckDB an unescaped pattern that
   globs differently from the (escaped) Python existence check.
3. ``rank_family`` leaves NO cached RDD behind (r8: the operator is a
   single plan with no persist at all; the historical
   ``unpersist_after_offsets`` path was removed after the r8 mass
   reverify caught it re-sampling range boundaries — see
   ``test_round8.py`` for the permutation/reuse laws).
4. ``jensen_shannon_types`` on a one-sided window (every event before
   the cutoff) yields NULL instead of an integer-division-by-zero
   crash, matching the oracle.
"""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from anomaly_detection_spark import queries as reg
from anomaly_detection_spark.operators.ranking import rank_family
from anomaly_detection_spark.pipeline.codecs import decode_png, encode_png
from tests.oracle_check import _view_path, compare


def test_encode_png_rejects_zero_dimensions():
    for shape in [(0, 4), (4, 0), (0, 0), (0, 3, 3), (3, 0, 4)]:
        with pytest.raises(ValueError, match="degenerate"):
            encode_png(np.zeros(shape, dtype=np.uint8))


def test_encode_decode_roundtrip_contract_smallest():
    img = np.arange(6, dtype=np.uint8).reshape(1, 2, 3)
    assert (decode_png(encode_png(img)) == img).all()


def test_view_path_rejects_glob_metacharacters(tmp_path):
    for bad in ["evil[1]", "star*", "quest?"]:
        d = tmp_path / bad
        d.mkdir()
        (d / "part-0.parquet").write_bytes(b"")
        with pytest.raises(ValueError, match="glob metacharacters"):
            _view_path(str(d))


def test_rank_family_unpersist_leaves_no_cached_rdd(spark):
    df = spark.range(0, 500).selectExpr(
        "id", "cast(id % 7 as long) as k"
    )
    # Compare persistent-RDD id SETS, not counts: the async
    # ContextCleaner may unpersist EARLIER tests' localCheckpoint RDDs
    # mid-run (count can DROP through no fault of rank_family); only
    # NEW ids appearing across the call indicate a leak.  Mirrors
    # tests/test_round8.py:_persistent_rdd_ids.
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    before = {int(i) for i in jmap.keySet().toArray()}
    out = rank_family(df, ["k", "id"])
    rows = out.orderBy("id").collect()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    after = {int(i) for i in jmap.keySet().toArray()}
    assert not (after - before), (
        f"rank_family cached something: {sorted(after - before)}"
    )
    # global_rn is a permutation of 1..n
    assert sorted(r["global_rn"] for r in rows) == list(range(1, 501))


def test_jensen_shannon_one_sided_window_yields_null(spark, tmp_path):
    rows = [
        {
            "event_id": i,
            "ts": dt.datetime(2024, 1, 10, 0, 0, i),
            "user_id": i % 3,
            "event_type": ["click", "view"][i % 2],
            "value": float(i),
            "props": "{}",
        }
        for i in range(20)
    ]
    pq.write_table(
        pa.Table.from_pylist(rows), os.path.join(tmp_path, "events.parquet")
    )
    df = reg.QUERIES["jensen_shannon_types"](spark, str(tmp_path))
    got = df.collect()
    assert len(got) == 1 and got[0]["js_fp"] is None
    assert not compare(df, reg.ORACLES["jensen_shannon_types"], str(tmp_path))


def test_shapley_efficiency_axiom(spark, sf_dir_oracle):
    """Sum of Shapley credits == n! * (v(grand coalition) - v(empty)):
    the efficiency axiom, checked against independently computed
    conversion counts."""
    import math

    from pyspark.sql import functions as F

    from anomaly_detection_spark import queries as reg
    from anomaly_detection_spark.sources.tables import load_table

    out = reg.QUERIES["shapley_attribution_channels"](
        spark, sf_dir_oracle
    ).collect()
    assert out, "no channels in fixture"
    n = out[0]["n_channels"]
    total_credit = sum(r["credit"] for r in out)

    ev = load_table(spark, "events", sf_dir_oracle)
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select("user_id", "event_type",
                  F.row_number().over(w).alias("rn"))
    p = o.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "purchase", F.col("rn")))
        .alias("prn"))
    # v(full) = all conversions; v(empty) = conversions of users with
    # EMPTY exposure sets (purchase as their first event)
    v_full = p.where(F.col("prn").isNotNull()).count()
    first = o.where(F.col("rn") == 1).select(
        "user_id", F.col("event_type").alias("first_type"))
    v_empty = p.join(first, "user_id").where(
        F.col("prn").isNotNull() & (F.col("first_type") == "purchase")
    ).count()
    assert total_credit == math.factorial(n) * (v_full - v_empty)


def test_silhouette_bounds_and_best_cluster(spark, sf_dir_oracle):
    from anomaly_detection_spark import queries as reg

    rows = reg.QUERIES["silhouette_embeddings"](
        spark, sf_dir_oracle
    ).collect()
    assert rows
    for r in rows:
        if r["silhouette_fp"] is not None:
            # simplified silhouette lies in [0, 1e6] here because the
            # assigned centroid IS the nearest one (b >= a always)
            assert 0 <= r["silhouette_fp"] <= 1_000_000
    # centroids score silhouette against themselves: a == 0 and (unless
    # a twin centroid exists) s == 1e6
    own = [r for r in rows if r["vec_id"] < 8]
    assert own and all(r["cluster_id"] == r["vec_id"] for r in own)


def test_silhouette_plan_no_single_partition(spark, sf_dir):
    """Top-2-per-vector goes through a map-side sorted K-list
    aggregation, never a global window: no SinglePartition exchange of
    table-sized data may appear (the rank_family lesson)."""
    from anomaly_detection_spark import queries as reg

    plan = reg.QUERIES["silhouette_embeddings"](
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_mahalanobis_plan_one_moments_pass_and_topk(spark, sf_dir):
    """One global moments aggregation (its 1-row final agg exchange is
    the only shuffle) + TakeOrderedAndProject for the top-20 — no sort
    of the full table, no join shuffle."""
    from anomaly_detection_spark import queries as reg

    plan = reg.QUERIES["mahalanobis_outliers_events"](
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    import re
    shuffles = len(re.findall(r"\bExchange (?:hash|range|Single)", plan))
    assert shuffles <= 1, plan

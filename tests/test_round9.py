"""Round-9 guards: rank_family fail-fast hardening (r8 ADVICE) and the
freshness-sweep rotation tier (r8 verdict item 2).

rank_family's soundness rests on Catalyst exchange reuse and non-null
order keys; both were documented caveats until now.  These tests pin the
mechanical versions: a disabled ``spark.sql.exchange.reuse`` raises at
call time (before any job could publish mis-shifted ranks), and a NULL
order key fails the job loudly instead of adopting a silent placement.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark import queries as reg
from anomaly_detection_spark.operators.ranking import rank_family


def test_rank_family_raises_when_exchange_reuse_disabled(spark):
    df = spark.range(10).withColumn("k", F.col("id") % 3)
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        with pytest.raises(RuntimeError, match="exchange.reuse"):
            rank_family(df, ["k", "id"])
    finally:
        spark.conf.set("spark.sql.exchange.reuse", "true")
    # restored conf -> normal operation resumes
    assert rank_family(df, ["k", "id"]).count() == 10


def test_rank_family_null_order_key_fails_loudly(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "id int, k int"
    )
    ranked = rank_family(df, ["k"])  # plan builds fine; evaluation raises
    with pytest.raises((Py4JJavaError, PySparkException)) as ei:
        ranked.collect()
    assert "NULL order key" in str(ei.value)


def test_rank_family_non_null_keys_unaffected_by_guard(spark):
    """The assert_true wrapper must be value-transparent: ranks over an
    all-non-null key column match the single-partition window oracle."""
    df = spark.createDataFrame(
        [(i, (i * 7) % 5) for i in range(40)], "id int, k int"
    )
    got = {
        r["id"]: (r["global_rn"], r["rnk"], r["drnk"])
        for r in rank_family(df, ["k", "id"]).collect()
    }
    ref = {
        r["id"]: (r["global_rn"], r["rnk"], r["drnk"])
        for r in df.selectExpr(
            "id",
            "row_number() over (order by k, id) as global_rn",
            "rank() over (order by k, id) as rnk",
            "dense_rank() over (order by k, id) as drnk",
        ).collect()
    }
    assert got == ref


def test_lof_checkpoints_have_a_release_path(spark, sf_dir):
    """r8 ADVICE: LOF's eager localCheckpoints pin executor storage with
    no unpersist handle.  Pin the documented cleanup contract: the
    checkpoints appear while the result is live, and
    release_local_checkpoints() returns storage to the pre-call
    baseline once the result is materialized."""
    from anomaly_detection_spark.pipeline.similarity import (
        local_outlier_factor,
        nonzero_vectors,
        persistent_rdd_ids,
        release_local_checkpoints,
    )
    from anomaly_detection_spark.sources.tables import load_table

    emb = nonzero_vectors(load_table(spark, "embeddings", sf_dir))
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    before = persistent_rdd_ids(spark)
    rows = local_outlier_factor(emb, centroids, k=3).collect()
    assert rows  # fully materialized before any release
    pinned = persistent_rdd_ids(spark) - before
    assert pinned, "LOF's localCheckpoints should pin storage"
    released = release_local_checkpoints(spark, keep_ids=before)
    assert set(released) >= pinned
    assert persistent_rdd_ids(spark) <= before


def test_driver_window_green_tier_sorts_oldest_rows_first():
    """r9 re-tier: spare window slots go to the stalest vouched-for rows
    (ascending last-green round), so each round's slack raises the whole
    registry's freshness floor instead of recycling recent rows."""
    order = reg._ordered(reg.QUERIES)
    green = reg._driver_green()
    fresh = {
        n for n, since in reg.DRIVER_REVERIFY.items()
        if n in reg._driver_green(min_round=since)
    }
    last = reg._last_green_round()
    vouched_oracle = [
        n for n in order
        if n in green and (n not in reg.DRIVER_REVERIFY or n in fresh)
        and n in reg.ORACLES
    ]
    rounds = [last[n] for n in vouched_oracle]
    assert rounds == sorted(rounds), (
        "vouched-for oracle tier is not ordered oldest-green-first"
    )
    # sanity: the tier machinery still fronts reverify entries
    stale = [n for n in order if n in reg.DRIVER_REVERIFY
             and n not in fresh and n in green]
    if stale and vouched_oracle:
        assert max(order.index(n) for n in stale) < order.index(
            vouched_oracle[0]
        )

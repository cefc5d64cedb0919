"""Misra-Gries heavy-hitters: eviction behavior, recall guarantee, and
exactness of the verify pass on planted-skew data (the registered
query's oracle pins cross-engine agreement on real tables)."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomaly_detection_spark.pipeline.sketches import (
    heavy_hitters_exact, misra_gries_partials,
)


def _stream(spark, n_heavy=3000, n_tail=7000):
    # one 30%-heavy item + a long tail of unique items (forces constant
    # eviction at small capacity)
    heavy = spark.range(n_heavy).select(F.lit("HEAVY").alias("item"))
    tail = spark.range(n_tail).select(
        F.concat(F.lit("tail_"), F.col("id")).alias("item")
    )
    return heavy.unionByName(tail).repartition(4)


def test_partials_bounded_by_capacity(spark):
    parts = misra_gries_partials(_stream(spark), capacity=10)
    sizes = (
        parts.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    assert all(r["c"] <= 10 for r in sizes)


def test_heavy_item_recalled_and_exact_despite_eviction(spark):
    # capacity 10 << 7000 distinct tail items: the sketch evicts
    # constantly, but freq(HEAVY)=30% > n/(cap+1)=9.1% so MG guarantees
    # survival; the verify pass then restores the EXACT count
    out = heavy_hitters_exact(_stream(spark), phi=0.2, capacity=10).collect()
    assert [(r["item"], r["cnt"]) for r in out] == [("HEAVY", 3000)]
    assert abs(out[0]["share"] - 0.3) < 1e-6


def test_no_false_positives_from_sketch_noise(spark):
    # phi=0.2: tail items (each freq 1/10000) may sneak into the
    # candidate set but can never pass the exact filter
    out = heavy_hitters_exact(_stream(spark), phi=0.2, capacity=50)
    assert out.where(F.col("item") != "HEAVY").count() == 0


def test_sketch_pass_is_map_only(spark):
    parts = misra_gries_partials(_stream(spark), capacity=10)
    plan = parts._jdf.queryExecution().executedPlan().toString()
    # repartition is the input's own exchange; the MG fold adds none
    assert plan.count("Exchange") <= 1, plan

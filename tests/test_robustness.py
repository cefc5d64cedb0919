"""Robustness: empty inputs and partitioning invariance.

A 100 TB engine cannot care how many partitions its input happens to
arrive in: every operator's RESULT must be identical under degenerate
(1-partition) and parallel layouts, and empty inputs must produce
empty—not crashing—outputs with the right schema.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from anomaly_detection_spark.config import DetectorConfig
from anomaly_detection_spark.detect.rules import rule_flags
from anomaly_detection_spark.operators.ranking import rank_family
from anomaly_detection_spark.pipeline.dedup import (
    exact_dedup, minhash_exact_near_duplicates,
)
from anomaly_detection_spark.pipeline.similarity import embedding_near_duplicates
from anomaly_detection_spark.sources.tables import load_table


EVENTS_SCHEMA = "user_id long, ts timestamp_ntz, value double, " \
    "event_type string, event_id long, props string"


def _empty_events(spark):
    return spark.createDataFrame([], EVENTS_SCHEMA)


def test_rule_flags_empty_input(spark):
    out = rule_flags(
        _empty_events(spark), ["user_id"], "ts", "value",
        DetectorConfig(eval_ts="2024-02-01"), emit="latest",
    )
    assert out.count() == 0
    assert "absolute_standard_deviations_from_avg" in out.columns


def test_rank_family_empty_input(spark):
    df = spark.createDataFrame([], "id long, v double")
    out = rank_family(df, ["v"])
    assert out.count() == 0
    assert {"global_rn", "rnk", "drnk", "pct_rank", "cume", "tile"} <= set(out.columns)


def test_dedup_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(docs, "text", "doc_id").count() == 0
    assert minhash_exact_near_duplicates(docs, "text", "doc_id").count() == 0


def test_embedding_near_dup_empty(spark):
    vecs = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert embedding_near_duplicates(vecs).count() == 0


@pytest.mark.parametrize("n_parts", [1, 7])
def test_partitioning_invariance_flags(spark, sf_dir, n_parts):
    """rule_flags output must be identical whatever the input layout."""
    ev = load_table(spark, "events", sf_dir)
    cfg = DetectorConfig(eval_ts="2024-02-01")
    base = {
        (r.user_id, str(r.date_recorded)): r.absolute_standard_deviations_from_avg
        for r in rule_flags(ev, ["user_id"], "ts", "value", cfg,
                            emit="latest").collect()
    }
    got = {
        (r.user_id, str(r.date_recorded)): r.absolute_standard_deviations_from_avg
        for r in rule_flags(ev.repartition(n_parts), ["user_id"], "ts", "value",
                            cfg, emit="latest").collect()
    }
    assert got == base


@pytest.mark.parametrize("n_parts", [1, 7])
def test_partitioning_invariance_rank_family(spark, sf_dir, n_parts):
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    base = {r.o_orderkey: (r.rnk, r.drnk, r.tile)
            for r in rank_family(o, ["o_totalprice", "o_orderkey"]).collect()}
    got = {r.o_orderkey: (r.rnk, r.drnk, r.tile)
           for r in rank_family(o.repartition(n_parts),
                                ["o_totalprice", "o_orderkey"]).collect()}
    assert got == base


def test_partitioning_invariance_minhash(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    base = {(r.id_a, r.id_b): r.jaccard
            for r in minhash_exact_near_duplicates(
                docs, "text", "doc_id", jaccard_threshold=0.5).collect()}
    got = {(r.id_a, r.id_b): r.jaccard
           for r in minhash_exact_near_duplicates(
               docs.repartition(3), "text", "doc_id",
               jaccard_threshold=0.5).collect()}
    assert got == base

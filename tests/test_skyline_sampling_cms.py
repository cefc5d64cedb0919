"""Skyline, weighted sampling, Count-Min sketch — planted-case unit
tests (fixture-wide agreement is covered by the oracle differential;
the skyline oracle is the naive O(n²) NOT EXISTS, so its green row is
already a semantic proof of the linear rewrite)."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomaly_detection_spark.operators.skyline import skyline_2d
from anomaly_detection_spark.pipeline.mixture import weighted_sample_topk
from anomaly_detection_spark.pipeline.sketches import (
    count_min_build, count_min_estimate,
)


def test_skyline_planted_frontier(spark):
    # frontier: (5,1), (3,4), (1,9); dominated: (2,2) by (3,4), (3,3)
    # by (3,4); duplicate frontier point (3,4) counted twice
    pts = spark.createDataFrame(
        [(5, 1), (3, 4), (3, 4), (1, 9), (2, 2), (3, 3)], "x int, y int"
    )
    got = {(r.x, r.y): r.n_points for r in skyline_2d(pts, "x", "y").collect()}
    assert got == {(5, 1): 1, (3, 4): 2, (1, 9): 1}


def test_skyline_equal_y_keeps_only_largest_x(spark):
    # same y at increasing x: only the largest x survives (others are
    # dominated: greater x, equal y)
    pts = spark.createDataFrame([(1, 7), (2, 7), (3, 7)], "x int, y int")
    got = {(r.x, r.y) for r in skyline_2d(pts, "x", "y").collect()}
    assert got == {(3, 7)}


def test_skyline_grouped_is_per_group(spark):
    pts = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 2), ("b", 1, 5), ("b", 5, 1)],
        "g string, x int, y int",
    )
    got = {(r.g, r.x, r.y)
           for r in skyline_2d(pts, "x", "y", ["g"]).collect()}
    # in group a, (2,2) dominates (1,1); group b keeps both corners
    assert got == {("a", 2, 2), ("b", 1, 5), ("b", 5, 1)}


def test_weighted_sample_scale_invariance(spark, sf_dir):
    """Multiplying every weight by a constant scales every key by the
    same factor — the selected set and its order must not change."""
    from anomaly_detection_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    # power-of-two factor: dividing each key by 1024 is EXACT in IEEE
    # doubles, so ordering is bit-preserved; key_round=12 keeps the
    # fixed-point grid far below the key spacing on this fixture
    base = [r.doc_id for r in weighted_sample_topk(
        docs, "n_chars", "doc_id", k=30, key_round=12).collect()]
    scaled = docs.withColumn("n_chars", F.col("n_chars") * 1024)
    got = [r.doc_id for r in weighted_sample_topk(
        scaled, "n_chars", "doc_id", k=30, key_round=12).collect()]
    assert base == got and len(base) == 30


def test_weighted_sample_huge_weight_always_included(spark, sf_dir):
    from anomaly_detection_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "n_chars",
        F.when(F.col("doc_id") == 7, F.lit(10**12)).otherwise(F.col("n_chars")),
    )
    got = {r.doc_id for r in
           weighted_sample_topk(docs, "n_chars", "doc_id", k=10).collect()}
    assert 7 in got


def test_cms_never_underestimates_and_exact_when_sparse(spark):
    # 3 distinct keys in a 4x256 sketch: collisions are impossible to
    # matter (min over 4 rows), so estimates are EXACT here
    rows = [("a",)] * 100 + [("b",)] * 10 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    sketch = count_min_build(df, "k", depth=4, width=256)
    probes = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    est = {r.k: r.cms_est
           for r in count_min_estimate(sketch, probes, "k").collect()}
    assert est == {"a": 100, "b": 10, "c": 1}
    # total sketch mass per depth row == stream length
    per_d = {r.d: r.s for r in
             sketch.groupBy("d").agg(F.sum("cnt").alias("s")).collect()}
    assert per_d == {0: 111, 1: 111, 2: 111, 3: 111}


def test_cms_overestimate_bounded_under_collisions(spark):
    # 2000 distinct keys in a deliberately TINY 2x16 sketch: heavy
    # collisions, but min-of-rows keeps estimates >= exact and bounded
    # by eps*N in expectation (we assert the hard >= and a loose cap)
    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    sketch = count_min_build(df, "k", depth=2, width=16)
    probes = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact")).limit(100)
    rows = count_min_estimate(
        sketch, probes, "k", depth=2, width=16
    ).join(probes, "k").collect()
    assert all(r.cms_est >= r.exact for r in rows)
    # width 16 -> expected bucket load 125; min over 2 rows stays well
    # under 4x the expectation for every probe on this fixed hash
    assert all(r.cms_est <= 500 for r in rows)


def test_incremental_join_delta_identity(spark):
    """stored-join ∪ delta == full join as a MULTISET (duplicates kept),
    and the delta contains no row derivable from bases alone."""
    from collections import Counter

    from anomaly_detection_spark.operators.incremental import (
        incremental_join_delta,
    )

    base_l = spark.createDataFrame(
        [(1, "l1"), (2, "l2"), (2, "l2b")], "k int, lv string"
    )
    delta_l = spark.createDataFrame([(2, "dl2"), (3, "dl3")], "k int, lv string")
    base_r = spark.createDataFrame([(1, "r1"), (3, "r3")], "k int, rv string")
    delta_r = spark.createDataFrame(
        [(2, "dr2"), (3, "dr3b")], "k int, rv string"
    )

    stored = base_l.join(base_r, "k")
    delta = incremental_join_delta(base_l, delta_l, base_r, delta_r, ["k"])
    full = base_l.unionByName(delta_l).join(
        base_r.unionByName(delta_r), "k"
    )
    got = Counter(tuple(r) for r in stored.unionByName(delta).collect())
    want = Counter(tuple(r) for r in full.collect())
    assert got == want
    # no delta row joins base-only content on both sides
    base_only = {tuple(r) for r in stored.collect()}
    assert not base_only & {tuple(r) for r in delta.collect()}


def test_cms_weighted_build_equals_raw_build(spark):
    """Building the sketch from a pre-aggregated (key, count) table
    with weights must produce the IDENTICAL matrix as building from
    raw occurrences — counters add."""
    rows = [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 5
    raw = spark.createDataFrame(rows, "k string")
    counts = raw.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    m_raw = {(r.d, r.bucket): r.cnt
             for r in count_min_build(raw, "k", depth=3, width=32).collect()}
    m_w = {(r.d, r.bucket): r.cnt
           for r in count_min_build(
               counts, "k", depth=3, width=32, weight_col="c"
           ).collect()}
    assert m_raw == m_w and len(m_raw) > 0


def test_interval_union_planted_overlaps(spark):
    """Overlapping windows merge (no double counting); disjoint ones
    don't; island counts and exact union extents are verified."""
    import datetime as dt
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from anomaly_detection_spark import queries as reg

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: two events 5 min apart (windows overlap -> one island
        # of 20 min), one event an hour later (own 15-min island)
        (1, 1, base, "a", 1.0, "{}"),
        (1, 2, base + dt.timedelta(minutes=5), "a", 1.0, "{}"),
        (1, 3, base + dt.timedelta(hours=2), "a", 1.0, "{}"),
        # user 2: back-to-back at exactly 15 min (s == prev end -> NOT
        # a new island under s > max(e); contiguous intervals merge)
        (2, 4, base, "a", 1.0, "{}"),
        (2, 5, base + dt.timedelta(minutes=15), "a", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp_ntz, "
        "event_type string, value double, props string",
    )
    d = tempfile.mkdtemp()
    pq.write_table(
        pa.Table.from_pandas(ev.toPandas()), os.path.join(d, "events.parquet")
    )
    out = {
        r.user_id: (r.n_active_intervals, r.active_us)
        for r in reg.QUERIES["interval_union_time_user"](spark, d).collect()
    }
    assert out[1] == (2, (20 * 60 + 15 * 60) * 1_000_000)
    assert out[2] == (1, 30 * 60 * 1_000_000)

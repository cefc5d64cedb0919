"""Property-based tests (SURVEY.md §5): run-length vs a pure-Python
oracle, flag monotonicity, NULL-first-row semantics."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from anomaly_detection_spark.config import DetectorConfig
from anomaly_detection_spark.detect.rules import rule_flags
from anomaly_detection_spark.operators.runlength import run_length

from tests.ticker_fixture import EVAL_TS, fixture_df


def _python_run_length(values: list[float]) -> list[int]:
    """The reference's gaps-and-islands semantics, serially."""
    out = []
    for i, v in enumerate(values):
        if i == 0 or values[i - 1] != v:
            out.append(1)
        else:
            out.append(out[-1] + 1)
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=25))
def test_run_length_matches_python_oracle(spark, vals):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(days=i), float(v)) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp_ntz, v double")
    got = [
        r.data_repetitions
        for r in run_length(df, ["k"], "ts", "v").orderBy("ts").collect()
    ]
    assert got == _python_run_length([float(v) for v in vals])


def test_flag_monotonicity_in_stddev_lim(spark):
    """Raising stddev_lim can only remove spike flags, never add."""
    df = fixture_df(spark)
    keys = ["index_id", "granularity_item_id"]

    def flagged(lim):
        cfg = DetectorConfig(eval_ts=EVAL_TS, stddev_lim=lim)
        out = rule_flags(df, keys, "data_timestamp", "data_value", cfg, emit="latest")
        return {
            (r.index_id, r.granularity_item_id)
            for r in out.where("standard_deviation_flag = 1").collect()
        }

    low, mid, high = flagged(1.0), flagged(4.5), flagged(20.0)
    assert high <= mid <= low


def test_null_first_row_semantics(spark):
    """First row per key: previous_value NULL → diff NULL → excluded
    from avg/stddev → z falls to 0 → no spike flag (SURVEY §2.5)."""
    base = dt.datetime(2024, 1, 1)
    rows = [(1, base + dt.timedelta(days=i), float(i)) for i in range(3)]
    df = spark.createDataFrame(rows, "k long, ts timestamp_ntz, v double")
    out = rule_flags(
        df, ["k"], "ts", "v", DetectorConfig(eval_ts="2024-01-04"), emit="all"
    ).orderBy("date_recorded").collect()
    first = out[0]
    assert first.previous_value is None
    assert first.absolute_one_period_difference is None
    assert first.standard_deviation_flag == 0
    # the two non-NULL diffs are both 1.0 → avg over non-NULLs = 1.0
    assert out[-1].average == pytest.approx(1.0)


def test_permutation_invariance(spark):
    """Input row order must not change the flags result (distributed
    scans have no defined order — determinism demands this)."""
    df = fixture_df(spark)
    keys = ["index_id", "granularity_item_id"]
    cfg = DetectorConfig(eval_ts=EVAL_TS)

    def run(frame):
        rows = rule_flags(frame, keys, "data_timestamp", "data_value",
                          cfg, emit="latest").collect()
        return sorted((tuple(r) for r in rows))

    shuffled = df.orderBy(F.xxhash64("id"))  # deterministic scramble
    assert run(df) == run(shuffled)


def test_emit_eval_date(spark):
    """emit='eval_date' keeps only rows stamped exactly at eval_ts
    (the reference's :222 filter)."""
    base = dt.datetime(2024, 1, 1)
    rows = [(1, base + dt.timedelta(days=i), float(i)) for i in range(3)]
    df = spark.createDataFrame(rows, "k long, ts timestamp_ntz, v double")
    out = rule_flags(
        df, ["k"], "ts", "v",
        DetectorConfig(eval_ts="2024-01-03 00:00:00"), emit="eval_date",
    ).collect()
    assert len(out) == 1
    assert out[0].date_recorded == dt.datetime(2024, 1, 3)


def _python_holt(vals: list[float]):
    out = []
    l = b = 0
    for i, v in enumerate(vals):
        vq = int(math.copysign(math.floor(abs(v) * 10000 + 0.5), v))
        if i == 0:
            l, b = vq, 0
        else:
            l_new = (vq + l + b) // 2
            b = (3 * b + (l_new - l)) // 4
            l = l_new
        out.append((l / 10000.0, b / 10000.0))
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(
    st.floats(min_value=-500, max_value=500,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=30,
))
def test_holt_matches_python_oracle(spark, vals):
    from anomaly_detection_spark.detect.robust import holt_smoothing

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(days=i), i, float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, value double"
    )
    got = [
        (r.level, r.trend)
        for r in holt_smoothing(df, ["user_id"], ["ts", "event_id"])
        .orderBy("rn").collect()
    ]
    assert got == _python_holt([float(v) for v in vals])


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edge_idx=st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)),
    min_size=1, max_size=12,
))
def test_textrank_matches_python_on_random_graphs(spark, edge_idx):
    from anomaly_detection_spark.pipeline.text import textrank_terms

    # words w0..w7 (length >= 4 via prefix); docs of two words = edges
    pairs = sorted({
        (f"word{a}", f"word{b}") for a, b in edge_idx if a != b
    })
    if not pairs:
        return
    docs = spark.createDataFrame(
        [(f"{a} {b}",) for a, b in pairs], "text string"
    )
    got = {r.term: r.score
           for r in textrank_terms(docs, n_iter=4).collect()}

    und = {(min(a, b), max(a, b)) for a, b in pairs}
    und |= {(b, a) for a, b in und}
    nodes = sorted({n for e in und for n in e})
    deg = {n: sum(1 for x, _ in und if x == n) for n in nodes}
    scale = 10**12
    n = len(nodes)
    pr = {v: scale // n for v in nodes}
    base = (3 * scale) // (20 * n)
    for _ in range(4):
        contrib = {v: 0 for v in nodes}
        for a, b in und:
            contrib[b] += pr[a] // deg[a]
        pr = {v: base + (17 * contrib[v]) // 20 for v in nodes}
    assert got == pr

"""MERGE/upsert + SCD2 tests, and direct state-logic tests for the
staleness monitor via a fake GroupState (timeout paths are hard to
drive deterministically through a live streaming query)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.operators.upsert import merge_upsert, scd2_apply


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, name string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "id long, name string, v double"
    )
    out = {r.id: (r.name, r.v) for r in merge_upsert(target, updates, ["id"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_scd2_apply(spark):
    base = dt.datetime(2024, 1, 1)
    target = spark.createDataFrame(
        [(1, "x", base, True, None), (2, "y", base, True, None)],
        "id long, attr string, ts timestamp_ntz, is_current boolean, valid_to timestamp_ntz",
    )
    updates = spark.createDataFrame(
        [(1, "x2", base + dt.timedelta(days=5))],
        "id long, attr string, ts timestamp_ntz",
    )
    out = scd2_apply(target, updates, ["id"], "ts").collect()
    by = {(r.id, r.attr): r for r in out}
    old = by[(1, "x")]
    assert old.is_current is False and old.valid_to == base + dt.timedelta(days=5)
    new = by[(1, "x2")]
    assert new.is_current is True and new.valid_to is None
    untouched = by[(2, "y")]
    assert untouched.is_current is True and untouched.valid_to is None
    assert len(out) == 3


class FakeGroupState:
    """Minimal stand-in for pyspark GroupState, for unit-testing
    applyInPandasWithState update functions."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.timeout_ms = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        if self._value is None:
            raise ValueError("state does not exist")
        return self._value

    def update(self, v):
        self._value = v

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left_ts=st.lists(st.integers(0, 50), min_size=1, max_size=12),
    right_ts=st.lists(st.integers(0, 50), min_size=0, max_size=12, unique=True),
)
def test_asof_join_matches_pandas_merge_asof(spark, left_ts, right_ts):
    """as_of_join vs pandas merge_asof on arbitrary small inputs —
    backward direction, <= semantics, single key."""
    import datetime as dt2
    base = dt2.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, i, base + dt2.timedelta(hours=t)) for i, t in enumerate(left_ts)],
        "k long, lid long, lts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(1, 100 + i, base + dt2.timedelta(hours=t)) for i, t in enumerate(right_ts)],
        "k long, rid long, rts timestamp_ntz",
    ) if right_ts else spark.createDataFrame([], "k long, rid long, rts timestamp_ntz")

    from anomaly_detection_spark.operators.asof import as_of_join
    got = {
        r.lid: r.asof_rid
        for r in as_of_join(left, right, ["k"], "lts", "rts", ["rid"]).collect()
    }

    lp = pd.DataFrame({"k": 1, "lid": range(len(left_ts)),
                       "lts": [base + dt2.timedelta(hours=t) for t in left_ts]}
                      ).sort_values("lts", kind="stable")
    rp = pd.DataFrame({
        "k": pd.array([1] * len(right_ts), dtype="int64"),
        "rid": pd.array([100 + i for i in range(len(right_ts))], dtype="int64"),
        "rts": pd.to_datetime([base + dt2.timedelta(hours=t) for t in right_ts]),
    }).sort_values("rts", kind="stable")
    merged = pd.merge_asof(lp, rp, left_on="lts", right_on="rts", by="k",
                           direction="backward")
    want = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in merged.itertuples()
    }
    assert got == want


def test_staleness_monitor_state_logic():
    """Drive the staleness update closure directly through its three
    transitions: ingest → no alert; timeout → STALE; recovery data →
    RECOVERED."""
    from anomaly_detection_spark.streaming.rules_stream import _make_staleness_update

    update = _make_staleness_update("user_id", "ts", stale_after_seconds=3600)
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    state = FakeGroupState()

    # ingest: two events arrive → state records newest, no output
    pdf = pd.DataFrame({"user_id": [1, 1], "ts": [base, base + dt.timedelta(minutes=5)]})
    out = list(update((1,), iter([pdf]), state))
    assert out == []
    last_ts_us, alerted = state.get
    assert last_ts_us == int(pd.Timestamp(base + dt.timedelta(minutes=5)).value // 1000)
    assert alerted is False
    assert state.timeout_ms == 3600 * 1000

    # timeout fires → STALE alert emitted, alerted latched
    state2 = FakeGroupState(value=state.get, timed_out=True)
    out = list(update((1,), iter([]), state2))
    assert len(out) == 1 and out[0].iloc[0]["alert"] == "STALE"
    assert out[0].iloc[0]["silent_seconds"] > 0
    assert state2.get[1] is True

    # new data after the alert → RECOVERED emitted, flag cleared
    state3 = FakeGroupState(value=state2.get)
    pdf2 = pd.DataFrame({"user_id": [1], "ts": [base + dt.timedelta(hours=3)]})
    out = list(update((1,), iter([pdf2]), state3))
    assert len(out) == 1 and out[0].iloc[0]["alert"] == "RECOVERED"
    assert state3.get[1] is False


def test_as_of_join_null_payload_does_not_bleed(spark):
    """A matched right row with a NULL payload field must yield NULL for
    that field — not a value inherited from an OLDER right row — and
    how='inner' must keep left rows whose matched payload is NULL."""
    from anomaly_detection_spark.operators.asof import as_of_join

    left = spark.createDataFrame(
        [("k", 30)], "key string, lts int"
    ).select("key", F.col("lts").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [("k", 10, 1.0, "old"), ("k", 20, None, "new")],
        "key string, rts int, price double, tag string",
    ).select("key", F.col("rts").cast("timestamp").alias("rts"), "price", "tag")

    out = as_of_join(left, right, ["key"], "lts", "rts",
                     ["price", "tag"], how="inner").collect()
    assert len(out) == 1
    row = out[0]
    # matched row is rts=20: tag comes from it, price must stay NULL
    assert row.asof_tag == "new"
    assert row.asof_price is None


def test_asof_cogrouped_matches_window_form(spark, sf_dir):
    """The cogroup().applyInPandas as-of strategy must produce exactly
    the union+window strategy's result on real data (same keys, same
    backward semantics, NULLs for unmatched)."""
    from anomaly_detection_spark.operators.asof import (
        as_of_join, as_of_join_cogrouped,
    )
    from anomaly_detection_spark.sources.tables import load_table
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.col("ts").alias("pts")
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("ets"), F.col("value").alias("err_value")
    )
    a = as_of_join(
        purchases, errors, ["user_id"], "pts", "ets", ["ets", "err_value"]
    )
    b = as_of_join_cogrouped(
        purchases, errors, ["user_id"], "pts", "ets", ["ets", "err_value"]
    )
    ka = sorted(map(tuple, a.select(
        "user_id", "event_id", "asof_ets", "asof_err_value").collect()))
    kb = sorted(map(tuple, b.select(
        "user_id", "event_id", "ets", "err_value").collect()))
    assert ka == kb and len(ka) > 0


def test_cdc_apply_out_of_order_delete_replay(spark):
    from anomaly_detection_spark.operators.upsert import cdc_apply

    # key 1: I(1) U(3) U(2) delivered out of order -> seq 3 wins
    # key 2: I(1) then D(2) -> key disappears
    # key 3: single insert; replay of (1,'U',3,...) must change nothing
    rows = [
        (1, 2, "U", 10.0), (1, 1, "I", 5.0), (1, 3, "U", 20.0),
        (2, 1, "I", 7.0), (2, 2, "D", 0.0),
        (3, 1, "I", 1.0),
    ]
    changes = spark.createDataFrame(
        rows, "key long, seq long, op string, val double"
    )
    got = {
        r.key: (r.seq, r.op, r.val)
        for r in cdc_apply(changes, ["key"], "seq").collect()
    }
    assert got == {1: (3, "U", 20.0), 3: (1, "I", 1.0)}
    replay = changes.unionAll(
        spark.createDataFrame([(1, 3, "U", 20.0)],
                              "key long, seq long, op string, val double")
    )
    got2 = {
        r.key: (r.seq, r.op, r.val)
        for r in cdc_apply(replay, ["key"], "seq").collect()
    }
    assert got2 == got

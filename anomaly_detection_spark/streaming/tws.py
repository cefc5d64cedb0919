"""Run-length counting on the transformWithStateInPandas API.

Spark 4's ``transformWithState`` supersedes ``applyInPandasWithState``
with typed per-key state handles (ValueState/ListState/MapState),
event-time timers, and state-schema evolution. This module carries the
engine's consecutive-repetition counter (the streaming W10/W11,
SURVEY.md §2.10) on the new API; semantics match
``rules_stream.stateful_run_length`` exactly, and the parity test
drives both over the same replay.

State per key is one fixed-width ValueState row — O(1) per live key,
RocksDB-backed on a real cluster — versus the old API's whole-tuple
get/update. Timers (unused here, used by the staleness monitor) and
TTL come from the same handle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor, StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StructField, StructType, TimestampNTZType,
)

_STATE_SCHEMA = StructType([
    StructField("last_value", DoubleType()),
    StructField("run_len", LongType()),
    StructField("max_ts_us", LongType()),
    StructField("pending_late", LongType()),
])


class RunLengthProcessor(StatefulProcessor):
    """Per-key consecutive-duplicate counter with late-row dropping."""

    def __init__(self, key: str, ts_col: str, value_col: str,
                 value_rep_lim: int = 3):
        self._key = key
        self._ts = ts_col
        self._value = value_col
        self._lim = value_rep_lim

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("run_state", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            last_value, run_len, max_ts_us, pending_late = self._state.get()
        else:
            last_value, run_len, max_ts_us, pending_late = None, 0, -1, 0
        out = []
        for pdf in rows:
            pdf = pdf.sort_values(self._ts)
            for ts, v in zip(pdf[self._ts], pdf[self._value]):
                ts_us = int(pd.Timestamp(ts).value // 1000)
                if ts_us <= max_ts_us:
                    pending_late += 1
                    continue
                max_ts_us = ts_us
                if last_value is not None and v == last_value:
                    run_len += 1
                else:
                    run_len = 1
                last_value = float(v)
                out.append((
                    key[0], ts, float(v), run_len,
                    1 if run_len >= self._lim else 0, pending_late,
                ))
                pending_late = 0
        self._state.update((last_value, run_len, max_ts_us, pending_late))
        if out:
            yield pd.DataFrame(
                out,
                columns=[self._key, "ts", "value", "data_repetitions",
                         "data_repetitions_flag", "late_dropped"],
            )

    def close(self) -> None:
        pass


_PEAK_SCHEMA = StructType([StructField("peak_cents", LongType())])
_BUCKET_KEY_SCHEMA = StructType([StructField("bucket", LongType())])
_BUCKET_CNT_SCHEMA = StructType([StructField("cnt", LongType())])


class DrawdownProcessor(StatefulProcessor):
    """Per-key high-water-mark drawdown monitor on TWO typed handles:
    a ValueState (running peak, exact cents) and a MapState (per value
    bucket -> occurrences so far) — the handle surface that
    distinguishes transformWithState from applyInPandasWithState.

    Per event (processed in (ts, event_id) order): the running peak
    including the current row, the drawdown (peak - current), whether
    the row sets-or-ties a new peak, and how many events of this row's
    value bucket the key has produced so far."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._peak = handle.getValueState("peak", _PEAK_SCHEMA)
        self._buckets = handle.getMapState(
            "buckets", _BUCKET_KEY_SCHEMA, _BUCKET_CNT_SCHEMA
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        peak = self._peak.get()[0] if self._peak.exists() else None
        # a key's rows may span arrow batches: concat BEFORE sorting so
        # the (ts, event_id) order is global within the micro-batch
        pdfs = list(rows)
        pdf = (pd.concat(pdfs) if len(pdfs) > 1 else pdfs[0]).sort_values(
            ["ts", "event_id"]
        )
        out = []
        for eid, ts, cents, bucket in zip(
            pdf["event_id"], pdf["ts"], pdf["cents"], pdf["bucket"]
        ):
            cents, bucket = int(cents), int(bucket)
            new_peak = 1 if (peak is None or cents >= peak) else 0
            peak = cents if (peak is None or cents > peak) else peak
            bk = (bucket,)
            cnt = (
                self._buckets.getValue(bk)[0]
                if self._buckets.containsKey(bk) else 0
            ) + 1
            self._buckets.updateValue(bk, (cnt,))
            out.append((
                key[0], int(eid), ts, cents, peak, peak - cents,
                new_peak, cnt,
            ))
        self._peak.update((peak,))
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "event_id", "ts", "cents", "peak_cents",
                         "drawdown_cents", "new_peak", "nth_in_bucket"],
            )

    def close(self) -> None:
        pass


def tws_drawdown(stream: DataFrame) -> DataFrame:
    """transformWithStateInPandas drawdown monitor over
    (user_id, event_id, ts, cents, bucket) rows."""
    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("cents", LongType()),
        StructField("peak_cents", LongType()),
        StructField("drawdown_cents", LongType()),
        StructField("new_peak", IntegerType()),
        StructField("nth_in_bucket", LongType()),
    ])
    return stream.groupBy("user_id").transformWithStateInPandas(
        DrawdownProcessor(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="None",
    )


def tws_run_length(
    stream: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    value_rep_lim: int = 3,
    watermark: str = "10 minutes",
) -> DataFrame:
    """transformWithStateInPandas twin of ``stateful_run_length``."""
    out_schema = StructType([
        StructField(key, LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("value", DoubleType()),
        StructField("data_repetitions", LongType()),
        StructField("data_repetitions_flag", IntegerType()),
        StructField("late_dropped", LongType()),
    ])
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key)
        .transformWithStateInPandas(
            RunLengthProcessor(key, ts_col, value_col, value_rep_lim),
            outputStructType=out_schema,
            outputMode="Append",
            timeMode="None",
        )
    )

"""Custom Python DataSource: a deterministic synthetic ticker feed.

The reference's upstream is a BigQuery table fed by an ingestion
pipeline (``func.R:34-56``); for development and load testing the new
engine ships its own feed as a first-class Spark source via the
Python DataSource API (Spark 4): ``spark.read.format("ticker_feed")``
for batch backfills and ``spark.readStream.format("ticker_feed")``
for a live one-day-per-microbatch replay.

Determinism: every value derives from sha256(seed, series, day) — no
RNG state, so any (partition of the) same feed re-reads identically on
any executor, which is what makes the source usable in differential
tests and restartable streams (offsets are just day indexes).

Scale: batch partitions split the series space evenly (one
InputPartition per chunk — executors generate rows in parallel, no
driver materialization); the stream reader's offset log is a day
counter, state O(1).

Options: ``n_series`` (default 8), ``n_days`` (28), ``seed`` (42),
``partitions`` (4).
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta
from typing import Iterator, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource, DataSourceReader, DataSourceStreamReader, InputPartition,
)

SCHEMA = (
    "index_id bigint, granularity_item_id bigint, "
    "data_timestamp timestamp_ntz, data_value double"
)

_BASE = datetime(2024, 1, 1)


def _step(seed: int, series: int, day: int) -> float:
    digest = hashlib.sha256(f"{seed}:{series}:{day}".encode()).digest()
    # uniform in [-1, 1) from the first 8 bytes
    return int.from_bytes(digest[:8], "big") / 2**63 - 1.0


def _series_rows(seed: int, series: int, upto_day: int,
                 from_day: int = 0) -> Iterator[Tuple]:
    """Rows for one series, days [from_day, upto_day). The random walk
    is cumulative from day 0 so any day range is reproducible."""
    value = 100.0 + (series % 7) * 10.0
    for day in range(upto_day):
        value += _step(seed, series, day)
        if day >= from_day:
            yield (
                series // 4 + 1,          # index_id
                series % 4 + 1,           # granularity_item_id
                _BASE + timedelta(days=day),
                round(value, 4),
            )


class _Opts:
    def __init__(self, options):
        self.n_series = int(options.get("n_series", 8))
        self.n_days = int(options.get("n_days", 28))
        self.seed = int(options.get("seed", 42))
        self.partitions = max(1, int(options.get("partitions", 4)))


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int, from_day: int, upto_day: int):
        self.lo, self.hi = lo, hi
        self.from_day, self.upto_day = from_day, upto_day


class TickerBatchReader(DataSourceReader):
    def __init__(self, options):
        self._o = _Opts(options)

    def partitions(self) -> Sequence[InputPartition]:
        o = self._o
        chunk = -(-o.n_series // o.partitions)
        return [
            _RangePartition(lo, min(lo + chunk, o.n_series), 0, o.n_days)
            for lo in range(0, o.n_series, chunk)
        ]

    def read(self, partition: _RangePartition) -> Iterator[Tuple]:
        for series in range(partition.lo, partition.hi):
            yield from _series_rows(
                self._o.seed, series, partition.upto_day, partition.from_day
            )


class TickerStreamReader(DataSourceStreamReader):
    """One day of feed per micro-batch; offset = {"day": n}."""

    def __init__(self, options):
        self._o = _Opts(options)

    def initialOffset(self) -> dict:
        return {"day": 0}

    def latestOffset(self) -> dict:
        # the feed "fills up" to n_days, then idles
        return {"day": self._o.n_days}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        o = self._o
        chunk = -(-o.n_series // o.partitions)
        return [
            _RangePartition(lo, min(lo + chunk, o.n_series),
                            start["day"], end["day"])
            for lo in range(0, o.n_series, chunk)
        ]

    def read(self, partition: _RangePartition) -> Iterator[Tuple]:
        for series in range(partition.lo, partition.hi):
            yield from _series_rows(
                self._o.seed, series, partition.upto_day, partition.from_day
            )

    def commit(self, end: dict) -> None:
        pass


class TickerDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ticker_feed"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> TickerBatchReader:
        return TickerBatchReader(self.options)

    def streamReader(self, schema) -> TickerStreamReader:
        return TickerStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(TickerDataSource)

"""Temporal scalar helpers (SURVEY.md F6-F10, W6).

All engine timestamps are TIMESTAMP_NTZ (timezone-naive, UTC
convention — matching both parquet NTZ reads and DuckDB's TIMESTAMP).
Spark can't cast NTZ directly to DOUBLE, so epoch extraction goes
through an LTZ cast; the session timezone is pinned to UTC
(session.py), making that conversion the identity on the wall clock.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SECONDS_PER_DAY = 86400.0


def epoch_seconds(c: Column | str) -> Column:
    """Epoch seconds (double, µs precision) of an NTZ/LTZ timestamp."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("timestamp").cast("double")


def ntz_lit(ts: str) -> Column:
    """A TIMESTAMP_NTZ literal from an ISO string."""
    return F.lit(ts).cast("timestamp_ntz")

"""Calendar-spine gap filling for irregular per-key time series.

The reference's STL path breaks on irregular series and works around
it by re-indexing timestamps to dense ranks (``archive/dev1.R:29-34``,
SURVEY.md M12). The lossless alternative is to *regularize* the series:
build each key's daily calendar spine and left-join observations onto
it, forward-filling values so every day has a row (and a flag saying
whether it was observed or imputed).

Spark-first mechanics:
- the spine is ``F.sequence(day_min, day_max)`` + ``explode`` — rows
  are generated executor-side per key, never on the driver;
- the join back to observations is on (key, day), co-partitioned with
  the window that follows — one shuffle end-to-end;
- forward fill is ``F.last(value, ignorenulls=True)`` over an
  unbounded-preceding frame, the same IGNORE NULLS idiom as
  `forward_fill_purchases`.

At 100 TB the spine adds at most one row per key per day — output is
bounded by (keys × days), independent of observation skew; no
collect(), no driver loop.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gap_fill_daily(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    value: str,
) -> DataFrame:
    """One row per key per calendar day from the key's first to last
    observation day. Columns: keys…, ``day``, ``value`` (last value of
    the day, forward-filled across gaps), ``observed`` (false on
    imputed days).

    Multiple observations in a day collapse to the day's latest (by
    timestamp) — the daily-batch reading of the reference's series.
    """
    keys = list(keys)
    day = F.to_date(F.col(ts)).alias("day")

    daily = (
        df.select(*keys, day, F.col(ts).alias("_ts"), F.col(value).alias("_v"))
        .groupBy(*keys, "day")
        .agg(F.max_by("_v", "_ts").alias("day_value"))
    )
    spine = (
        daily.groupBy(*keys)
        .agg(F.min("day").alias("_d0"), F.max("day").alias("_d1"))
        .select(*keys, F.explode(F.sequence("_d0", "_d1")).alias("day"))
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, keys + ["day"], "left")
        .select(
            *keys,
            "day",
            F.last("day_value", ignorenulls=True).over(w).alias(value),
            F.col("day_value").isNotNull().alias("observed"),
        )
    )

"""MERGE / upsert emulation (CDC & SCD2 patterns).

Delta/Iceberg jars aren't in this environment, so MERGE INTO is
composed from relational primitives (the portable emulation):
anti-join keeps unmatched target rows, updates win by key, optional
SCD2 keeps superseded rows with validity stamps.

Scale: one shuffle on the merge key for the anti-join; with bucketed
targets (operators/skew.py:write_bucketed) even that is co-located.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame,
                 keys: Sequence[str]) -> DataFrame:
    """Last-write-wins upsert: rows from ``updates`` replace same-key
    rows in ``target``; unmatched target rows pass through."""
    keys = list(keys)
    kept = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(updates.select(*target.columns))


def scd2_apply(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    current_flag: str = "is_current",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out current rows whose
    key appears in ``updates`` (stamp ``valid_to`` with the update's
    timestamp, clear the current flag) and append the updates as the
    new current version."""
    keys = list(keys)
    upd_times = updates.groupBy(*keys).agg(F.max(ts_col).alias("_new_ts"))
    closed = (
        target.join(upd_times, keys, "left")
        .withColumn(
            current_flag,
            F.when(F.col("_new_ts").isNotNull(), F.lit(False))
            .otherwise(F.col(current_flag)),
        )
        .withColumn(
            valid_to,
            F.when(F.col("_new_ts").isNotNull(), F.col("_new_ts"))
            .otherwise(F.col(valid_to)),
        )
        .drop("_new_ts")
    )
    fresh = (
        updates.withColumn(current_flag, F.lit(True))
        .withColumn(valid_to, F.lit(None).cast(target.schema[valid_to].dataType))
        .select(*target.columns)
    )
    return closed.unionByName(fresh)

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


def cdc_apply(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Reconstruct current state from a CDC change log (the
    Debezium/binlog apply step): per key, the change with the highest
    ``seq_col`` wins, and a winning delete removes the key entirely.

    Handles out-of-order delivery by construction — the argmax over
    sequence is order-independent, so late rows and replays land
    identically on any partitioning (idempotent apply).

    One shuffle on the key; the argmax is a map-side-combinable
    struct-max (no per-key sort, no window), so the change log can be
    arbitrarily deep per key without memory pressure.
    """
    return cdc_reduce(changes, key_cols, seq_col).where(
        F.col(op_col) != delete_op
    )


def cdc_reduce(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
) -> DataFrame:
    """Per-key highest-``seq_col`` change, INCLUDING winning deletes
    (tombstones).  This is the associative inner step of CDC apply —
    ``cdc_reduce(a ∪ b) == cdc_reduce(cdc_reduce(a) ∪ b)`` — which is
    what lets a *streaming* apply fold each microbatch into stored
    state; tombstones must stay in state so late lower-seq rows can't
    resurrect a deleted key.  Readers filter ``op != 'D'``.
    """
    keys = list(key_cols)
    payload = [c for c in changes.columns if c not in keys]
    latest = changes.groupBy(*keys).agg(
        F.max(
            F.struct(
                F.col(seq_col).alias("_seq"),
                *[F.col(c).alias(c) for c in payload if c != seq_col],
            )
        ).alias("_m")
    )
    return latest.select(
        *keys,
        *[F.col(f"_m.{c}").alias(c) for c in payload if c != seq_col],
        F.col("_m._seq").alias(seq_col),
    )

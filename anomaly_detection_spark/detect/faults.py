"""Fault injection — the reference's ``impute_fakes`` as an engine
operator (``func.R:73-80``; used in ``model.R:12-18`` and
``archive/dev.R:110-116,149-155``).

The reference multiplies chosen rows' values by a factor (0 ⇒ hard
zero) to plant known anomalies, selecting rows by *positional index*
after a sort — meaningless in a distributed frame. Here targeting is
declarative: a key/timestamp predicate, or "the newest row of each of
these series" (what model.R actually does), so the transform is a
narrow map with no shuffle (one window pass for newest-row mode).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomaly_detection_spark.operators.windows import series_window_desc


def impute_fakes(
    df: DataFrame,
    value_col: str,
    factor: float,
    where: Column,
) -> DataFrame:
    """Multiply ``value_col`` by ``factor`` on rows matching ``where``."""
    return df.withColumn(
        value_col,
        F.when(where, F.col(value_col) * F.lit(factor)).otherwise(F.col(value_col)),
    )


def impute_fakes_newest(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    factor: float,
    key_filter: Optional[Column] = None,
) -> DataFrame:
    """Corrupt the newest observation of each (selected) series — the
    reference's model.R pattern (fakes on each chosen ticker's latest
    row)."""
    w = series_window_desc(keys, ts_col)
    out = df.withColumn("_rn_fault", F.row_number().over(w))
    target = F.col("_rn_fault") == 1
    if key_filter is not None:
        target = target & key_filter
    return impute_fakes(out, value_col, factor, target).drop("_rn_fault")


def sample_series(
    df: DataFrame,
    keys: Sequence[str],
    fraction: float,
    seed: int = 42,
) -> DataFrame:
    """Deterministically sample a fraction of SERIES (not rows) — the
    reference's ``sample.int`` ticker choice (model.R:14, M9). Uses a
    hash of the key so the same series are chosen on any cluster
    layout (no RNG-per-partition nondeterminism)."""
    bucket = F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.lit(seed)), F.lit(10_000))
    return df.where(bucket < int(fraction * 10_000))

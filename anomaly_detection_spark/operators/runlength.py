"""Consecutive-repetition run length — gaps & islands (SURVEY.md W10/W11).

Reference (``anomaly_proj_query.sql:80-87,111-127``):

1. ``repeated_values``/``reset_count`` indicators of Δ=0 vs Δ≠0 (a NULL
   first-diff counts as a reset, matching SQL CASE semantics),
2. running ``SUM(reset_count)`` over the ordered series window →
   segment id (``reset_reps_sum``),
3. running SUM within ``(key, segment)`` → ``data_repetitions`` = the
   length of the current run of identical values.

Scale note (SURVEY §4): step 3's widened partition key is a refinement
of the base key partitioning, but Catalyst still plans a second
Exchange. Both shuffles hash on fine-grained series keys so there is no
skew; at 100 TB the second exchange moves the same bytes as the first.
If it ever dominates, the streaming engine's per-key state counter
(streaming/state.py) is the no-shuffle alternative.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomaly_detection_spark.operators.windows import series_window


def run_length(df: DataFrame, keys: Sequence[str], ts_col: str, value_col: str,
               out_col: str = "data_repetitions") -> DataFrame:
    """Length of the current run of consecutive identical values per series."""
    w = series_window(keys, ts_col)
    diff = F.col(value_col) - F.lag(value_col, 1).over(w)
    # NULL diff (first row) → ELSE branch, same as the reference's CASE
    repeated = F.when(diff == 0, F.lit(1)).otherwise(F.lit(0))
    reset = F.when(diff == 0, F.lit(0)).otherwise(F.lit(1))
    seg = df.withColumn("_repeated", repeated).withColumn("_reset", reset)
    # single-shuffle form of the W10/W11 pair: run length = distance to
    # the most recent reset position (running max over the SAME key
    # window — the reference's widened (key, segment) partition would
    # cost a second Exchange; see detect/rules.py)
    seg = seg.withColumn("_idx", F.row_number().over(w))
    run = (
        F.col("_idx")
        - F.max(F.when(F.col("_reset") == 1, F.col("_idx"))).over(w)
        + 1
    ).cast("long")
    return seg.withColumn(out_col, run).drop("_repeated", "_reset", "_idx")

"""Rule-based anomaly flags engine — the Spark-native port of the
reference's SQL engine (``anomaly_proj_query.sql:17-228``).

Per series key, over the trailing ``data_periods`` observations:

- **spike flag** — z-score of the one-period |Δ| against the window's
  mean/sample-stddev of |Δ|, threshold ``stddev_lim``
  (ref ``:96-106,133-136``);
- **repetition flag** — length of the current run of identical values
  via the gaps-and-islands window pair, threshold ``value_rep_lim``
  (ref ``:80-87,111-127,137-140``);
- **staleness flag** — days since the observation vs the series' mean
  sampling gap × ``update_lim`` (ref ``:99-102,141-144``).

Architecture: one DataFrame chain, 100% JVM (no Python UDFs).
Every window — including the run-length counter, rewritten from the
reference's widened (key, segment) partition into a running-max
distance over the SAME key window — shares the series-key
partitioning, so Catalyst plans exactly ONE Exchange for the whole
pipeline (asserted by test_scale_patterns.py), whole-stage-codegen'd
end to end. Per-key state is bounded (trailing N rows), keys are
fine-grained (no skew), so the plan scales linearly to 100 TB.

Interval semantics (SURVEY.md §2.5 W6): BigQuery's
``EXTRACT(HOUR FROM ts - ts)/24`` floors gaps to whole hours; the
native mode here uses exact fractional days (``seconds/86400``).
Set ``DetectorConfig.bq_compat_intervals=True`` for quirk parity.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from anomaly_detection_spark.config import DetectorConfig
from anomaly_detection_spark.operators.rounding import (
    exact_mean, exact_stddev_samp, quantized, stable_round,
)
from anomaly_detection_spark.operators.temporal import epoch_seconds, ntz_lit
from anomaly_detection_spark.operators.windows import partition_window, series_window

SECONDS_PER_DAY = 86400.0


def _gap_days(secs: Column, bq_compat: bool) -> Column:
    if bq_compat:
        # BigQuery: interval floored to whole hours, then /24
        return F.floor(secs / 3600.0) / 24.0
    # 6-dp rounding (~0.1s) pins float determinism for the oracle
    # comparisons (FIXTURES.md conventions) without changing semantics
    return F.round(secs / SECONDS_PER_DAY, 6)


def rule_flags(
    fact: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    cfg: Optional[DetectorConfig] = None,
    emit: str = "latest",
) -> DataFrame:
    """Run the flags pipeline over ``fact``.

    Parameters
    ----------
    fact : input observations (one row per key+timestamp).
    keys : series key columns (reference: index_id, granularity_item_id).
    ts_col / value_col : observation timestamp / value columns.
    cfg : thresholds & eval date (reference's DECLARE block).
    emit : ``"latest"`` (newest row per series — ref ``:221`` variant),
        ``"eval_date"`` (rows recorded exactly at ``cfg.eval_ts`` — ref
        ``:222``), or ``"all"`` (every scored row).

    Returns one row per emitted observation with the three flags, the
    OR'd ``anomaly`` bit, and all intermediate statistics (reference
    final select ``:148-190`` minus the dim-join attributes, which are
    the caller's ``enrich`` step).
    """
    cfg = cfg or DetectorConfig()
    keys = list(keys)
    w = series_window(keys, ts_col)
    wp = partition_window(keys)
    w_desc = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col(ts_col).desc())

    df = fact
    if cfg.predicate is not None:
        df = df.where(cfg.predicate)
    eval_ts = ntz_lit(cfg.eval_ts) if cfg.eval_ts else None
    if eval_ts is not None:
        # temporal cutoff (ref :46) — pushed to the parquet scan by Catalyst
        df = df.where(F.col(ts_col) <= eval_ts)

    # --- row_data (ref :17-52): lag/lead context + recency rank -------------
    row_data = df.select(
        *keys,
        F.col(ts_col).alias("date_recorded"),
        F.lag(ts_col).over(w).alias("last_date"),
        F.round(F.col(value_col), 4).alias("value"),
        F.round(F.lag(value_col, 1).over(w), 4).alias("previous_value"),
        # ENGINE CONVENTION (stated, like the other reference quirks):
        # the trailing-7 mean averages values on the 4-dp grid via the
        # exact integer-sum fold (bit-identical across engines), while
        # the reference SQL (anomaly_proj_query.sql:41-44) averages raw
        # values and rounds the result.  For inputs already on the 4-dp
        # grid — the fixture and the reference's price feeds — the two
        # are identical; inputs with >4 decimals are quantized first.
        exact_mean(
            F.sum(quantized(F.col(value_col), 4)).over(w.rowsBetween(-7, -1)),
            F.count(value_col).over(w.rowsBetween(-7, -1)), 4, 4,
        ).alias("previous_seven_period_avg"),
        F.row_number().over(w_desc).alias("row_num"),
        F.count(F.lit(1)).over(wp).alias("_series_n"),
    )

    # --- detrended (ref :53-67): trailing-N cut + diffs ---------------------
    detr = row_data.where(F.col("row_num") <= cfg.data_periods)
    if cfg.require_complete:
        # ref func.R:55 — window-count rewrite of the max_row_num join (P8/J3)
        detr = detr.where(F.col("_series_n") >= cfg.data_periods)
    detr = detr.withColumn(
        "absolute_one_period_difference",
        F.abs(F.round(F.col("value") - F.col("previous_value"), 4)),
    ).withColumn(
        "_gap_secs",
        epoch_seconds("date_recorded") - epoch_seconds("last_date"),
    )

    # --- stats (ref :68-95): whole-partition mean/stddev over the cut -------
    w2 = series_window(keys, "date_recorded")
    wp2 = partition_window(keys)
    # exact integer stats over the 4-dp-quantized diffs: sums are
    # order-independent, so average/stddev (and their rounding) are
    # bit-identical on any engine or cluster layout (see rounding.py)
    q_diff = quantized(F.col("absolute_one_period_difference"), 4)
    stats = (
        detr.withColumn("_q_sum", F.sum(q_diff).over(wp2))
        .withColumn("_q_sum2", F.sum(q_diff * q_diff).over(wp2))
        .withColumn("_q_n", F.count(q_diff).over(wp2))
        .withColumn(
            "average", exact_mean(F.col("_q_sum"), F.col("_q_n"), 4, 4)
        )
        .withColumn(
            "standard_deviation",
            exact_stddev_samp(
                F.col("_q_sum"), F.col("_q_sum2"), F.col("_q_n"), 4, 4
            ),
        )
        .withColumn("_avg_gap_secs", F.avg("_gap_secs").over(wp2))
        .withColumn(
            "repeated_values",
            F.when(F.col("absolute_one_period_difference") == 0, 1).otherwise(0),
        )
        .withColumn(
            "reset_count",
            F.when(F.col("absolute_one_period_difference") == 0, 0).otherwise(1),
        )
    )

    # --- stddev_data (ref :96-116): z-score, staleness, segment id ----------
    ref_now = eval_ts if eval_ts is not None else F.max("date_recorded").over(wp2)
    stddev_data = (
        stats.withColumn(
            "avg_days_bw_data", _gap_days(F.col("_avg_gap_secs"), cfg.bq_compat_intervals)
        )
        .withColumn(
            "days_since_last_update",
            _gap_days(
                epoch_seconds(ref_now) - epoch_seconds("date_recorded"),
                cfg.bq_compat_intervals,
            ),
        )
        .withColumn(
            "absolute_standard_deviations_from_avg",
            # NULL stddev (n<2) and 0 stddev both fall to 0, as in the
            # reference's CASE (NULL != 0 is NULL → ELSE branch)
            F.when(
                F.col("standard_deviation") != 0,
                F.round(
                    F.abs(F.col("absolute_one_period_difference") - F.col("average"))
                    / F.col("standard_deviation"),
                    4,
                ),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("reset_reps_sum", F.sum("reset_count").over(w2))
    )

    # --- repeated_data (ref :117-129): run length of identical values -------
    # The reference re-partitions by (key, segment) for the in-segment
    # running sum — a second Exchange. Equivalent with SAME-KEY windows
    # only: run length = idx − idx_of_last_reset + 1 (the running max of
    # reset positions). One shuffle for the whole pipeline (SURVEY §4).
    idx = F.row_number().over(w2)
    repeated = stddev_data.withColumn("_idx", idx).withColumn(
        "data_repetitions",
        (
            F.col("_idx")
            - F.max(F.when(F.col("reset_count") == 1, F.col("_idx"))).over(w2)
            + 1
        ).cast("long"),
    )

    # --- flag_data + final (ref :130-155,166-169) ---------------------------
    flags = (
        repeated.withColumn(
            "standard_deviation_flag",
            F.when(
                F.col("absolute_standard_deviations_from_avg") >= cfg.stddev_lim, 1
            ).otherwise(0),
        )
        .withColumn(
            "data_repetitions_flag",
            F.when(F.col("data_repetitions") >= cfg.value_rep_lim, 1).otherwise(0),
        )
        .withColumn(
            "days_since_last_update_flag",
            F.when(
                F.col("days_since_last_update")
                > cfg.update_lim * F.col("avg_days_bw_data"),
                1,
            ).otherwise(0),
        )
    )
    flags = flags.withColumn(
        "anomaly",
        F.when(
            (F.col("standard_deviation_flag") == 1)
            | (F.col("data_repetitions_flag") == 1)
            | (F.col("days_since_last_update_flag") == 1),
            1,
        ).otherwise(0),
    ).withColumn(
        "standard_deviations_from_avg",
        F.when(
            F.col("value") - F.col("previous_value") < 0,
            -F.col("absolute_standard_deviations_from_avg"),
        ).otherwise(F.col("absolute_standard_deviations_from_avg")),
    )

    if emit == "latest":
        flags = flags.where(F.col("row_num") == 1)
    elif emit == "eval_date":
        if eval_ts is None:
            raise ValueError("emit='eval_date' requires cfg.eval_ts")
        flags = flags.where(F.col("date_recorded") == eval_ts)
    elif emit != "all":
        raise ValueError(f"unknown emit mode: {emit}")

    return flags.drop(
        "_gap_secs", "_avg_gap_secs", "_series_n", "row_num",
        "_q_sum", "_q_sum2", "_q_n", "_idx",
    )

"""Detector configuration.

Mirrors the reference's 7-variable parameter block
(``anomaly_proj_query.sql:1-15``: eval_date, data_periods, ind_id,
stddev_lim, value_rep_lim, update_lim, day_hours) and the R engine's
function args (``func.R:17``, ``model.R:3-7``) as a plain dataclass.
The reference's injected ``where_clause`` SQL string becomes a Spark
``Column`` predicate (``predicate``) so it participates in Catalyst
pushdown instead of string concatenation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column


@dataclass
class DetectorConfig:
    # trailing observations per series used for all statistics
    # (reference: data_periods=28 / days_of_data=28)
    data_periods: int = 28
    # z-score threshold for the spike flag (reference: stddev_lim=4.5)
    stddev_lim: float = 4.5
    # run length threshold for the repetition flag (reference: value_rep_lim=3)
    value_rep_lim: int = 3
    # staleness multiplier: flag when days_since_last_update >
    # update_lim * avg_days_between_periods (reference: update_lim=1)
    update_lim: float = 1.0
    # evaluation cutoff (ISO date/timestamp string); None = no cutoff
    # (reference: eval_date = current_date — pinned for reproducibility)
    eval_ts: Optional[str] = None
    # optional pushdown predicate (reference: where_clause string arg)
    predicate: Optional[Column] = None
    # require >= data_periods observations per series
    # (reference completeness filter, func.R:55)
    require_complete: bool = False
    # reproduce BigQuery's hour-granular INTERVAL quirk for staleness
    # (EXTRACT(HOUR FROM ts-ts)/24 floors gaps to whole hours,
    # anomaly_proj_query.sql:99-102); False = exact fractional days
    bq_compat_intervals: bool = False

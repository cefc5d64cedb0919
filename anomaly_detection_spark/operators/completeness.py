"""Group-completeness filter (SURVEY.md P8/J3/A1).

Reference: keeps only tickers with >= N observations via a LEFT JOIN
to a ``GROUP BY ticker_index → MAX(ticker_row_num)`` aggregate
(``func.R:47-55``). The Spark-first form replaces the self-join with a
whole-partition window count — one shuffle instead of two and no join,
the exact rewrite SURVEY §4 calls out for 100 TB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomaly_detection_spark.operators.windows import partition_window


def complete_groups(df: DataFrame, keys: Sequence[str], min_rows: int,
                    count_col: str | None = None) -> DataFrame:
    """Keep only groups with at least ``min_rows`` rows."""
    c = F.count(F.lit(1)).over(partition_window(keys))
    if count_col:
        return df.withColumn(count_col, c).where(F.col(count_col) >= min_rows)
    return df.withColumn("_grp_n", c).where(F.col("_grp_n") >= min_rows).drop("_grp_n")

"""Top-N / trailing-N per group (SURVEY.md §2 P7, O3, O4, W4).

Reference: ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY ts DESC)``
then ``row_num <= data_periods`` keeps the trailing 28 observations
per ticker (``anomaly_proj_query.sql:30-33,66``; ``func.R:36,54``).

Spark ≥3.5 rewrites rank-filter patterns with ``InferWindowGroupLimit``
(window group limit pushed into the sort), so this is the efficient
scale path — per-group heaps during the shuffle, not a full sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomaly_detection_spark.operators.windows import series_window_desc


def top_n_per_group(df: DataFrame, keys: Sequence[str], order_col: str | Column,
                    n: int, desc: bool = True, rn_col: str = "rn",
                    keep_rn: bool = False) -> DataFrame:
    """Keep the top-``n`` rows per group ordered by ``order_col``."""
    c = F.col(order_col) if isinstance(order_col, str) else order_col
    from pyspark.sql.window import Window
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(c.desc() if desc else c.asc())
    out = df.withColumn(rn_col, F.row_number().over(w)).where(F.col(rn_col) <= n)
    return out if keep_rn else out.drop(rn_col)


def trailing_n_per_group(df: DataFrame, keys: Sequence[str], ts_col: str, n: int,
                         rn_col: str = "row_num", keep_rn: bool = True) -> DataFrame:
    """Trailing-``n`` newest rows per series — the reference's top-28 cut."""
    out = df.withColumn(rn_col, F.row_number().over(series_window_desc(keys, ts_col)))
    out = out.where(F.col(rn_col) <= n)
    return out if keep_rn else out.drop(rn_col)


def latest_per_group(df: DataFrame, keys: Sequence[str], ts_col: str) -> DataFrame:
    """Last observation per series (O4: ``df[df_len, …]`` in func.R:104)."""
    return trailing_n_per_group(df, keys, ts_col, 1, keep_rn=False)

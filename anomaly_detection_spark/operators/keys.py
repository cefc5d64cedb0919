"""Composite series-key concat/split (SURVEY.md F4/F5).

Reference: ``ticker_index = CONCAT(index_id, '_', granularity_item_id)``
(``func.R:39``) split back into (index, region) at ``func.R:140``.
Provided for API parity; the engine itself groups by the raw key
columns (no string round-trip on the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def concat_key(df: DataFrame, cols: list[str], out_col: str = "ticker_index",
               sep: str = "_") -> DataFrame:
    return df.withColumn(out_col, F.concat_ws(sep, *[F.col(c) for c in cols]))


def split_key(df: DataFrame, key_col: str, out_cols: list[str],
              sep: str = "_", cast: str | None = "long") -> DataFrame:
    parts = F.split(F.col(key_col), sep)
    for i, name in enumerate(out_cols):
        c = parts.getItem(i)
        if cast:
            c = c.cast(cast)
        df = df.withColumn(name, c)
    return df

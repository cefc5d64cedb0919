"""Isotonic regression (PAVA) per series.

Fits the best monotone non-decreasing approximation to each user's
purchase-value series under squared loss, via the Pool-Adjacent-
Violators Algorithm — a linear-time stack of blocks per series, run as
an Arrow-batched grouped kernel (``applyInPandas``), so cost is
O(rows) with bounded per-key groups and ONE hash exchange.

Cross-engine exactness: block state is kept as EXACT INTEGER
(cents_sum, count) pairs; the only float operation is the final
float64 division sum/count per block.  The minimax identity

    fitted[i] = max_{j<=i} min_{k>=i} mean(y[j..k])

yields exactly those block means, and a SQL engine evaluating it
computes the same single division of the same integers — so the
DuckDB oracle (the O(n^3) identity over prefix sums) matches the
O(n) PAVA kernel bit-for-bit.  Two algorithms, one answer.

No reference counterpart (the reference engine has no regression
surface); part of the analytics extension the port brief calls for.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pava_block_means(cents: np.ndarray) -> np.ndarray:
    """Non-decreasing PAVA fit: returns one float64 mean per input
    position, computed as a single exact-int/int division per block."""
    sums: list[int] = []    # block cents sums (exact python ints)
    cnts: list[int] = []    # block lengths
    for c in cents:
        sums.append(int(c))
        cnts.append(1)
        # merge while the last block's mean < the previous one's:
        # compare a/b < c/d as exact integer cross-products
        while (
            len(sums) > 1
            and sums[-1] * cnts[-2] < sums[-2] * cnts[-1]
        ):
            s_last, c_last = sums.pop(), cnts.pop()
            sums[-1] += s_last
            cnts[-1] += c_last
    out = np.empty(len(cents), dtype=np.float64)
    pos = 0
    for s, n in zip(sums, cnts):
        out[pos:pos + n] = np.float64(s) / np.float64(n)
        pos += n
    return out


def isotonic_fit(
    df: DataFrame,
    key_col: str,
    order_cols: Iterable[str],
    cents_col: str,
) -> DataFrame:
    """Per-``key_col`` isotonic (non-decreasing) fit of ``cents_col``
    over the ``order_cols`` ordering.  Returns the input keys plus
    ``fitted`` (float64 block mean, in cents units)."""
    order_cols = list(order_cols)
    # project before the grouped map (applyInPandas ships every column
    # through Arrow) and repartition explicitly on the key so AQE's
    # small-output coalescing cannot serialize the Python stage onto
    # one task (the same discipline as detect/stl.py:203)
    slim = df.select(key_col, *order_cols, cents_col).repartition(
        df.sparkSession.sparkContext.defaultParallelism, key_col
    )
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in slim.schema.fields
    ) + ", fitted double"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        pdf = pdf.reset_index(drop=True)
        pdf["fitted"] = _pava_block_means(pdf[cents_col].to_numpy())
        return pdf

    return slim.groupBy(key_col).applyInPandas(fit, schema=schema)

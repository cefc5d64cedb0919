"""Decomposition-based anomaly engine — the Spark-native port of the
reference's R engine (``func.R:84-157``: tibbletime/anomalize
``time_decompose → anomalize(remainder) → time_recompose`` + scoring).

The reference runs a **serial** per-ticker loop in one R process
(``func.R:131-133`` — its own "TODO: optimize time" bottleneck). Here
the same per-series computation runs as ``groupBy(keys).applyInPandas``:
each series is a bounded pandas frame (trailing-N rows) processed on an
executor, Arrow-batched, embarrassingly parallel across keys — the
single biggest scalability win of the port (SURVEY.md §2.9 M7). At
100 TB key cardinality grows but group size stays bounded, so executor
memory is flat and the job scales linearly.

Decomposition: ``statsmodels.tsa.seasonal.STL(period, robust=True)``
when available; otherwise a pure-numpy classical additive
decomposition (centered moving-average trend + per-phase median
seasonal) with the same observed/season/trend/remainder contract —
the container has no statsmodels, and the IQR anomaly test only needs
a detrended/deseasonalized remainder.

Anomaly test: the anomalize package's IQR method (its default):
limits ``q25 − k·IQR`` / ``q75 + k·IQR`` with ``k = 0.15/alpha``
(alpha=0.05 → 3×IQR), flagged fraction capped at ``max_anoms``
(ranked by distance outside the limits). Score per ``func.R:99-102``:
``buffer_zero=(l1+l2)/2; buffer_radius=|l2−buffer_zero|;
score=|remainder−buffer_zero|/buffer_radius``.

Reference quirks (``reference_quirks=True`` reproduces them,
default normalizes — SURVEY.md §7.3):
- ``seven_day_avg`` actually averages the trailing **8** points
  (``func.R:107``); normalized: trailing 7.
- ``repetitions`` counts the prior **9** values equal to the final
  value (``func.R:110``, R operator-precedence accident); normalized:
  prior 7.
- ``frequency`` reads a global variable instead of the group's frame
  (``func.R:111`` — a genuine bug); always fixed here: the group's own
  last sampling gap in days.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

try:  # statsmodels is not in the v1 container; prefer it when present
    from statsmodels.tsa.seasonal import STL as _STL  # type: ignore
except ImportError:  # pragma: no cover
    _STL = None

ALPHA_DEFAULT = 0.05
MAX_ANOMS_DEFAULT = 0.2
SECONDS_PER_DAY = 86400.0


def _moving_average_trend(values: np.ndarray, period: int) -> np.ndarray:
    """Centered moving-average trend (classical decomposition).

    Even periods use the standard half-weight endpoints (2×period MA).
    Edges are extended with the nearest interior estimate.
    """
    n = len(values)
    if period % 2 == 0:
        kernel = np.ones(period + 1)
        kernel[0] = kernel[-1] = 0.5
        kernel /= period
    else:
        kernel = np.ones(period) / period
    half = len(kernel) // 2
    if n < len(kernel):
        return np.full(n, np.median(values))
    core = np.convolve(values, kernel, mode="valid")
    trend = np.empty(n)
    trend[half:n - half] = core
    trend[:half] = core[0]
    trend[n - half:] = core[-1]
    return trend


def decompose(values: np.ndarray, period: int = 7,
              robust: bool = True) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """observed → (season, trend, remainder), additive.

    STL when statsmodels is importable and the series is long enough
    (≥ 2 full periods, the same constraint the reference hits —
    SURVEY.md §7.6.3); classical numpy decomposition otherwise.
    """
    values = np.asarray(values, dtype=np.float64)
    n = len(values)
    if n < 2 * period:
        # too short for seasonal estimation — trend-only fallback
        trend = _moving_average_trend(values, min(period, max(1, n // 2)))
        season = np.zeros(n)
        return season, trend, values - trend
    if _STL is not None:
        res = _STL(values, period=period, robust=robust).fit()
        return np.asarray(res.seasonal), np.asarray(res.trend), np.asarray(res.resid)
    # vendored pure-numpy LOESS STL (periodic seasonal, robust outer
    # loop) — the faithful stand-in for R's stl(s.window="periodic",
    # robust=TRUE); fidelity pinned by tests/test_stl_fidelity.py
    from anomaly_detection_spark.detect.loess_stl import stl_periodic
    return stl_periodic(values, period=period, robust=robust)


def iqr_anomalize(remainder: np.ndarray, alpha: float = ALPHA_DEFAULT,
                  max_anoms: float = MAX_ANOMS_DEFAULT
                  ) -> tuple[np.ndarray, float, float]:
    """anomalize-style IQR test → (is_anomaly bool array, l1, l2)."""
    q25, q75 = np.percentile(remainder, [25.0, 75.0])
    iqr = q75 - q25
    k = 0.15 / alpha
    l1, l2 = q25 - k * iqr, q75 + k * iqr
    outside = (remainder < l1) | (remainder > l2)
    cap = int(np.floor(max_anoms * len(remainder)))
    if outside.sum() > cap:
        # keep only the `cap` most extreme (distance outside the band)
        dist = np.maximum(l1 - remainder, remainder - l2)
        keep = np.argsort(-dist)[:cap]
        capped = np.zeros_like(outside)
        capped[keep] = True
        outside = capped
    return outside, float(l1), float(l2)


def _score(remainder: np.ndarray, l1: float, l2: float) -> np.ndarray:
    buffer_zero = (l1 + l2) / 2.0
    buffer_radius = abs(l2 - buffer_zero)
    if buffer_radius == 0:
        return np.where(remainder == buffer_zero, 0.0, np.inf)
    return np.abs(remainder - buffer_zero) / buffer_radius


def stl_iqr_detect(
    fact: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    period: int = 7,
    alpha: float = ALPHA_DEFAULT,
    max_anoms: float = MAX_ANOMS_DEFAULT,
    reference_quirks: bool = False,
    min_points: Optional[int] = None,
) -> DataFrame:
    """One summary row per series (the reference's ``detect_anomaly``).

    Output: keys…, ``data_timestamp`` (last obs), ``value``,
    ``seven_day_avg``, ``score``, ``anomaly`` ("Yes"/"No"),
    ``repetitions``, ``frequency`` (last sampling gap, days).
    """
    keys = list(keys)
    min_pts = min_points if min_points is not None else 2
    rep_window = 9 if reference_quirks else 7
    avg_tail = 8 if reference_quirks else 7

    key_fields = ", ".join(
        f"{k} {fact.schema[k].dataType.simpleString()}" for k in keys
    )
    out_schema = (
        f"{key_fields}, data_timestamp timestamp, value double, "
        "seven_day_avg double, score double, anomaly string, "
        "repetitions long, frequency double"
    )

    def detect(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        ts = pdf[ts_col]
        n = len(vals)
        if n < min_pts:
            return pd.DataFrame(columns=list(pdf[keys].columns) + [
                "data_timestamp", "value", "seven_day_avg", "score",
                "anomaly", "repetitions", "frequency"])
        season, trend, remainder = decompose(vals, period=period)
        is_anom, l1, l2 = iqr_anomalize(remainder, alpha=alpha, max_anoms=max_anoms)
        scores = _score(remainder, l1, l2)
        last_value = vals[-1]
        tail = vals[-avg_tail:]
        prior = vals[max(0, n - 1 - rep_window):n - 1]
        gap = (
            (ts.iloc[-1] - ts.iloc[-2]).total_seconds() / SECONDS_PER_DAY
            if n >= 2 else float("nan")
        )
        row = {k: pdf[k].iloc[0] for k in keys}
        row.update({
            "data_timestamp": ts.iloc[-1],
            "value": float(last_value),
            "seven_day_avg": float(tail.mean()),
            "score": float(scores[-1]),
            "anomaly": "Yes" if bool(is_anom[-1]) else "No",
            "repetitions": int((prior == last_value).sum()),
            "frequency": gap,
        })
        return pd.DataFrame([row])

    # project before the grouped map (applyInPandas ships every column
    # through Arrow) and pin the shuffle width: AQE would coalesce the
    # now-tiny shuffle to ~1 partition by BYTE size, serializing the
    # Python compute — an explicit repartition keeps the stage wide
    slim = fact.select(*keys, ts_col, value_col).repartition(
        fact.sparkSession.sparkContext.defaultParallelism, *keys
    )
    return slim.groupBy(*keys).applyInPandas(detect, schema=out_schema)


def stl_iqr_score(
    fact: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    period: int = 7,
    alpha: float = ALPHA_DEFAULT,
    max_anoms: float = MAX_ANOMS_DEFAULT,
) -> DataFrame:
    """Every observation scored (decomposition + band + score per row).

    The per-row analogue of ``stl_iqr_detect`` — what the reference's
    ``time_decompose %>% anomalize %>% time_recompose`` frame looks like
    before the tail summary (``func.R:96-102``).
    """
    keys = list(keys)
    key_fields = ", ".join(
        f"{k} {fact.schema[k].dataType.simpleString()}" for k in keys
    )
    out_schema = (
        f"{key_fields}, data_timestamp timestamp, observed double, "
        "season double, trend double, remainder double, "
        "remainder_l1 double, remainder_l2 double, "
        "recomposed_l1 double, recomposed_l2 double, "
        "score double, anomaly string"
    )

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        if len(vals) < 2:
            return pd.DataFrame(
                columns=keys + ["data_timestamp", "observed", "season", "trend",
                                "remainder", "remainder_l1", "remainder_l2",
                                "recomposed_l1", "recomposed_l2", "score", "anomaly"])
        season, trend, remainder = decompose(vals, period=period)
        is_anom, l1, l2 = iqr_anomalize(remainder, alpha=alpha, max_anoms=max_anoms)
        scores = _score(remainder, l1, l2)
        out = pd.DataFrame({k: pdf[k].to_numpy() for k in keys})
        out["data_timestamp"] = pdf[ts_col].to_numpy()
        out["observed"] = vals
        out["season"] = season
        out["trend"] = trend
        out["remainder"] = remainder
        out["remainder_l1"] = l1
        out["remainder_l2"] = l2
        # time_recompose (func.R:98): band recomposed around observed
        out["recomposed_l1"] = season + trend + l1
        out["recomposed_l2"] = season + trend + l2
        out["score"] = scores
        out["anomaly"] = np.where(is_anom, "Yes", "No")
        return out

    slim = fact.select(*keys, ts_col, value_col).repartition(
        fact.sparkSession.sparkContext.defaultParallelism, *keys
    )
    return slim.groupBy(*keys).applyInPandas(score_group, schema=out_schema)

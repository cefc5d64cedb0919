"""Robust-statistics detectors: rolling-median/Hampel and CUSUM.

Both are exact-integer constructions on the 1e-4 value grid (see
``operators/rounding.py``): medians and MADs are computed as doubled /
quadrupled longs (2*median and 4*MAD of longs are longs), and CUSUM's
mean-centering is scaled by the series length so every intermediate is
an integer.  Identical integers divide to identical doubles on any
engine and any partitioning — the determinism contract the rest of the
engine follows.

Shuffle shape: every window pass partitions by the series key, so each
detector costs exactly one exchange regardless of how many window
functions it stacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from anomaly_detection_spark.operators.rounding import c_round, quantized

_D38 = "decimal(38,0)"


def rolling_median_hampel(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str = "value",
    window: int = 15,
    n_sigmas: float = 3.0,
) -> DataFrame:
    """Append ``roll_median``, ``roll_mad``, ``hampel_outlier`` over a
    trailing-``window`` frame per series (Hampel 1974; the robust
    cousin of the z-score rule: flag |x - med| > n_sigmas*1.4826*MAD).

    The window list is bounded (``window`` elements), sorted once, and
    all median/MAD arithmetic is JVM array expressions over doubled
    integers — no Python, no FP-boundary coin flips.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(window - 1), 0)
    )
    vq = quantized(F.col(value_col), 4)
    base = df.withColumn("_vq", vq).withColumn(
        "_s", F.array_sort(F.collect_list(vq).over(w))
    )
    n = F.size("_s")
    med2 = F.when(
        n % 2 == 1, 2 * F.element_at("_s", ((n + 1) / 2).cast("int"))
    ).otherwise(
        F.element_at("_s", (n / 2).cast("int"))
        + F.element_at("_s", (n / 2 + 1).cast("int"))
    )
    with_med = base.withColumn("_n", n).withColumn("_med2", med2)
    d = F.array_sort(F.transform("_s", lambda x: F.abs(2 * x - F.col("_med2"))))
    with_d = with_med.withColumn("_d", d)
    nn = F.col("_n")
    mad4 = F.when(
        nn % 2 == 1, 2 * F.element_at("_d", ((nn + 1) / 2).cast("int"))
    ).otherwise(
        F.element_at("_d", (nn / 2).cast("int"))
        + F.element_at("_d", (nn / 2 + 1).cast("int"))
    )
    thresh = float(n_sigmas * 1.4826)
    return (
        with_d.withColumn("_mad4", mad4)
        .withColumn("roll_median", F.col("_med2").cast("double") / 20000)
        .withColumn("roll_mad", F.col("_mad4").cast("double") / 40000)
        .withColumn(
            "hampel_outlier",
            (2 * F.abs(2 * F.col("_vq") - F.col("_med2"))).cast("double")
            > thresh * F.col("_mad4"),
        )
        .drop("_vq", "_s", "_n", "_med2", "_d", "_mad4")
    )


def cusum(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str = "value",
    threshold_sigmas: float = 5.0,
) -> DataFrame:
    """Append ``cusum_pos``, ``cusum_neg``, ``shift_flag`` (Page 1954).

    The recursion C+_i = max(0, C+_{i-1} + d_i) is rewritten into its
    closed window form C+_i = R_i - min(0, min_{j<=i} R_j) over
    mean-centered prefix sums — running sum + running min, no
    iteration.  Centering stays exact by scaling by the series length:
    R_i*n = n*prefix_i - i*sum, integer arithmetic in decimal(38,0),
    divided back to double once.  ``shift_flag`` compares C+ against
    ``threshold_sigmas`` sample standard deviations from the same
    exact integer sums.
    """
    wp = Window.partitionBy(*key_cols)
    wo = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wr = Window.partitionBy(*key_cols).orderBy(*order_cols)
    vq = quantized(F.col(value_col), 4)
    st = (
        df.withColumn("_vq", vq)
        .withColumn("_n", F.count(F.lit(1)).over(wp))
        .withColumn("_sq", F.sum("_vq").over(wp))
        .withColumn("_sq2", F.sum(F.col("_vq") * F.col("_vq")).over(wp))
        .withColumn("_prefix", F.sum("_vq").over(wo))
        .withColumn("_i", F.row_number().over(wr))
    )
    rn = (
        F.col("_n").cast(_D38) * F.col("_prefix").cast(_D38)
        - F.col("_i").cast(_D38) * F.col("_sq").cast(_D38)
    )
    m = (
        st.withColumn("_rn", rn)
        .withColumn("_runmin", F.min("_rn").over(wo))
        .withColumn("_runmax", F.max("_rn").over(wo))
    )
    zero = F.lit(0).cast(_D38)
    denom = F.col("_n") * 10000.0
    cpos = (F.col("_rn") - F.least(F.col("_runmin"), zero)).cast("double") / denom
    cneg = (F.greatest(F.col("_runmax"), zero) - F.col("_rn")).cast("double") / denom
    var_num = (
        F.col("_n").cast(_D38) * F.col("_sq2").cast(_D38)
        - F.col("_sq").cast(_D38) * F.col("_sq").cast(_D38)
    ).cast("double")
    sigma = (
        F.sqrt(var_num / (F.col("_n") * (F.col("_n") - 1)).cast("double")) / 10000.0
    )
    return (
        m.withColumn("cusum_pos", cpos)
        .withColumn("cusum_neg", cneg)
        .withColumn("shift_flag", cpos > threshold_sigmas * sigma)
        .drop("_vq", "_n", "_sq", "_sq2", "_prefix", "_i", "_rn",
              "_runmin", "_runmax")
    )


def robust_z(
    df: DataFrame,
    key_cols: list[str],
    value_col: str = "value",
    threshold: float = 3.5,
) -> DataFrame:
    """Append ``series_median``, ``series_mad``, ``robust_z``,
    ``robust_flag`` — the modified z-score (Iglewicz & Hoaglin 1993:
    0.6745·|x − med| / MAD, flag at 3.5), the outlier rule that a
    single wild spike cannot poison the way it poisons mean/stddev.

    Same exact-integer discipline as :func:`rolling_median_hampel`:
    medians/MADs as doubled/quadrupled longs over the series' sorted
    cents array, so both the flag and the reported stats are
    FP-coin-flip-free and reproducible in any engine.  The per-series
    value list is materialized once (series here are bounded, like the
    reference's trailing-28 model); unbounded series would use the
    two-pass percentile form instead.
    """
    wp = Window.partitionBy(*key_cols)
    vq = quantized(F.col(value_col), 4)
    base = df.withColumn("_vq", vq).withColumn(
        "_s", F.array_sort(F.collect_list(vq).over(wp))
    )
    n = F.size("_s")
    med2 = F.when(
        n % 2 == 1, 2 * F.element_at("_s", ((n + 1) / 2).cast("int"))
    ).otherwise(
        F.element_at("_s", (n / 2).cast("int"))
        + F.element_at("_s", (n / 2 + 1).cast("int"))
    )
    with_med = base.withColumn("_med2", med2)
    d = F.array_sort(F.transform("_s", lambda x: F.abs(2 * x - F.col("_med2"))))
    with_d = with_med.withColumn("_d", d)
    mad4 = F.when(
        n % 2 == 1, 2 * F.element_at("_d", ((n + 1) / 2).cast("int"))
    ).otherwise(
        F.element_at("_d", (n / 2).cast("int"))
        + F.element_at("_d", (n / 2 + 1).cast("int"))
    )
    # z = 0.6745·|x−med|/MAD = 0.6745·2·|2c−med2| / mad4 (exact ints)
    z_raw = (
        0.6745 * 2 * F.abs(2 * F.col("_vq") - F.col("_med2")).cast("double")
        / F.col("_mad4")
    )
    return (
        with_d.withColumn("_mad4", mad4)
        .withColumn("series_median", F.col("_med2").cast("double") / 20000)
        .withColumn("series_mad", F.col("_mad4").cast("double") / 40000)
        .withColumn(
            "robust_z",
            F.when(F.col("_mad4") != 0, c_round(z_raw, 4)).otherwise(0.0),
        )
        .withColumn(
            "robust_flag",
            F.when((F.col("_mad4") != 0) & (z_raw >= threshold), 1).otherwise(0),
        )
        .drop("_vq", "_s", "_med2", "_d", "_mad4")
    )


def holt_smoothing(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str = "value",
) -> DataFrame:
    """Holt double-exponential smoothing per series (level + trend
    state; Holt 1957), with alpha = 1/2 and beta = 1/4 realized as
    EXACT integer recursions on the 1e-4 value grid:

        l_1 = v_1,  b_1 = 0
        l_i = floor((v_i + l_{i-1} + b_{i-1}) / 2)
        b_i = floor((3·b_{i-1} + (l_i - l_{i-1})) / 4)

    A float Holt recursion drifts by ulps after enough steps and can
    diverge between engines; the floor'd integer form is bit-identical
    everywhere (Python ``//`` is floor division; the SQL oracle uses
    ``floor(x / 2.0)`` — exact for these magnitudes, and floor ==
    truncate is NOT assumed since the trend state goes negative).

    Output: key_cols + (rn, level, trend, forecast) where forecast is
    the one-step-ahead ``level + trend``, all as exact grid doubles
    (integer / 10⁴ — no rounding step to disagree on).

    True sequential state per series → ``applyInPandas`` (the same
    engine shape as ``detect/stl.py``): one exchange on the series
    key, Python loop bounded by series length.
    """
    import math

    import pandas as pd

    keys = list(key_cols)
    order = list(order_cols)
    key_fields = ", ".join(
        f"{k} {df.schema[k].dataType.simpleString()}" for k in keys
    )
    out_schema = (
        f"{key_fields}, rn bigint, level double, trend double, forecast double"
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        vals = pdf[value_col].to_numpy()
        # half-away-from-zero to the 1e-4 grid (Spark/DuckDB round(x,0))
        vq = [
            int(math.copysign(math.floor(abs(float(v)) * 10000 + 0.5), v))
            for v in vals
        ]
        levels: list[int] = []
        trends: list[int] = []
        l_prev, b_prev = 0, 0
        for i, v in enumerate(vq):
            if i == 0:
                l_cur, b_cur = v, 0
            else:
                l_cur = (v + l_prev + b_prev) // 2
                b_cur = (3 * b_prev + (l_cur - l_prev)) // 4
            levels.append(l_cur)
            trends.append(b_cur)
            l_prev, b_prev = l_cur, b_cur
        out = pd.DataFrame({k: pdf[k].to_numpy() for k in keys})
        out["rn"] = range(1, len(vq) + 1)
        out["level"] = [x / 10000.0 for x in levels]
        out["trend"] = [x / 10000.0 for x in trends]
        out["forecast"] = [
            (x + y) / 10000.0 for x, y in zip(levels, trends)
        ]
        return out

    # project to the needed columns before the grouped map and pin the
    # shuffle width so AQE's byte-based coalescing can't serialize the
    # Python stage (same rationale as detect/stl.py)
    slim = df.select(*keys, *order, value_col).repartition(
        df.sparkSession.sparkContext.defaultParallelism, *keys
    )
    return slim.groupBy(*keys).applyInPandas(smooth, schema=out_schema)


def holt_winters(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str = "value",
    period: int = 7,
) -> DataFrame:
    """Holt-Winters TRIPLE (additive-seasonal) smoothing per series,
    with alpha = 1/2, beta = 1/4, gamma = 1/2 realized as exact integer
    recursions on the 1e-4 grid (the :func:`holt_smoothing` discipline
    extended with a length-``period`` seasonal ring buffer):

        l_1 = v_1, b_1 = 0, ring = [0] * period
        sref_i = ring[0]                       (season from i - period)
        l_i = floor((v_i - sref_i + l_{i-1} + b_{i-1}) / 2)
        b_i = floor((l_i - l_{i-1} + 3 * b_{i-1}) / 4)
        s_i = floor((v_i - l_i + sref_i) / 2)
        ring = ring[1:] + [s_i]

    Floor division (``//``) everywhere — trend and season go negative,
    and floor == truncate must NOT be assumed.  The oracle carries the
    ring as ``period`` explicit columns in a recursive CTE, shifting
    one slot per step, so both engines run the identical lockstep.

    Output: key_cols + (rn, level, trend, season, forecast) on exact
    grid doubles; ``forecast`` is the one-step-ahead
    ``level + trend + ring[0]`` (the seasonal the NEXT step will see).
    """
    import math

    import pandas as pd

    keys = list(key_cols)
    order = list(order_cols)
    key_fields = ", ".join(
        f"{k} {df.schema[k].dataType.simpleString()}" for k in keys
    )
    out_schema = (
        f"{key_fields}, rn bigint, level double, trend double, "
        "season double, forecast double"
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        vals = pdf[value_col].to_numpy()
        vq = [
            int(math.copysign(math.floor(abs(float(v)) * 10000 + 0.5), v))
            for v in vals
        ]
        levels: list[int] = []
        trends: list[int] = []
        seasons: list[int] = []
        forecasts: list[int] = []
        ring = [0] * period
        l_prev, b_prev = 0, 0
        for i, v in enumerate(vq):
            sref = ring[0]
            if i == 0:
                l_cur, b_cur = v, 0
                s_cur = 0
            else:
                l_cur = (v - sref + l_prev + b_prev) // 2
                b_cur = (l_cur - l_prev + 3 * b_prev) // 4
                s_cur = (v - l_cur + sref) // 2
            ring = ring[1:] + [s_cur]
            levels.append(l_cur)
            trends.append(b_cur)
            seasons.append(s_cur)
            forecasts.append(l_cur + b_cur + ring[0])
            l_prev, b_prev = l_cur, b_cur
        out = pd.DataFrame({k: pdf[k].to_numpy() for k in keys})
        out["rn"] = range(1, len(vq) + 1)
        out["level"] = [x / 10000.0 for x in levels]
        out["trend"] = [x / 10000.0 for x in trends]
        out["season"] = [x / 10000.0 for x in seasons]
        out["forecast"] = [x / 10000.0 for x in forecasts]
        return out

    slim = df.select(*keys, *order, value_col).repartition(
        df.sparkSession.sparkContext.defaultParallelism, *keys
    )
    return slim.groupBy(*keys).applyInPandas(smooth, schema=out_schema)

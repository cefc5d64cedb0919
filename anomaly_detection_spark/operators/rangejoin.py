"""Bucketed interval (range) join — points-in-interval matching.

Not in the reference (its only joins are equi-joins to dims,
SURVEY.md §2.3); this is the idiomatic Spark mapping for the time-range
join a streaming/training-data pipeline needs ("events inside a
session/order/incident window").

Naive Spark `l.join(r, (l.ts >= r.start) & (l.ts < r.end))` has no
equi-conjunct, so Catalyst falls back to BroadcastNestedLoopJoin — an
O(|L|·|R|) disaster once neither side fits in memory. The scale-safe
plan quantizes time into fixed-width buckets:

  - each point row gets its one covering bucket;
  - each interval row explodes to the buckets it overlaps
    (``F.sequence`` → ``explode``, expansion factor
    ceil(interval_len / bucket) + 1);
  - an ordinary hash equi-join on (keys…, bucket) pairs candidates;
  - the exact ``start <= ts < end`` predicate filters them.

A point matches an interval in exactly one bucket (its own), so no
post-join dedup is needed. Shuffle volume is |L| + |R|·expansion, both
linear; pick ``bucket`` near the typical interval length so expansion
stays ~2×. With AQE enabled, skewed buckets are split automatically.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomaly_detection_spark.operators.temporal import epoch_seconds


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    keys: Sequence[str] = (),
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows with ``start <= ts < end``.

    ``keys`` are equi-join columns present on both sides (joined in
    addition to the bucket). Returns all point columns plus all
    interval columns (minus the shared keys). ``how`` is ``inner`` or
    ``left`` (left keeps unmatched points with NULL interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how}")
    keys = list(keys)

    p_bucket = F.floor(epoch_seconds(point_ts) / bucket_seconds).cast("long")
    lo = F.floor(epoch_seconds(start_ts) / bucket_seconds).cast("long")
    hi = F.floor(epoch_seconds(end_ts) / bucket_seconds).cast("long")

    p = points.withColumn("_rj_bucket", p_bucket)
    iv = intervals.withColumn("_rj_bucket", F.explode(F.sequence(lo, hi)))

    on = keys + ["_rj_bucket"]
    exact = (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    if how == "inner":
        out = p.join(iv, on=on, how="inner").where(exact)
    else:
        # left: exact predicate must live in the join condition, not a
        # post-filter, to preserve unmatched point rows. String aliases
        # disambiguate the (common at call sites) self-join lineage.
        iv_cols = [c for c in iv.columns if c not in on]
        pa, iva = p.alias("_rj_p"), iv.alias("_rj_i")
        cond = F.lit(True)
        for k in on:
            cond = cond & (F.col(f"_rj_p.{k}") == F.col(f"_rj_i.{k}"))
        cond = (
            cond
            & (F.col(f"_rj_p.{point_ts}") >= F.col(f"_rj_i.{start_ts}"))
            & (F.col(f"_rj_p.{point_ts}") < F.col(f"_rj_i.{end_ts}"))
        )
        out = pa.join(iva, cond, "left").select(
            *[F.col(f"_rj_p.{c}") for c in p.columns],
            *[F.col(f"_rj_i.{c}") for c in iv_cols],
        )
    return out.drop("_rj_bucket")

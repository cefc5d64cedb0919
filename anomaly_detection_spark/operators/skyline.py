"""2-D skyline (Pareto frontier) — multi-criteria candidate mining:
the points not dominated in BOTH dimensions (p dominates q iff p >= q
on both axes and p > q on at least one).  Used in data pipelines to
pick non-dominated candidates (e.g. quality vs recency, score vs
cost) without collapsing the trade-off into one weighted number.

The naive formulation is the O(n²) NOT EXISTS self-join.  The 2-D
structure admits a sort-based linear plan instead:

1. collapse to (x, max(y)) per distinct x — one keyed shuffle with
   map-side combine; within an x group only the max-y rows can
   survive (same x, larger y dominates);
2. order the GROUP table by x descending and take the running max of
   y over strictly-greater x (``lag`` of the running max): a group is
   on the frontier iff its y exceeds every y at larger x;
3. the group table is |distinct x|-sized — the window runs over the
   rollup, never the fact table.

Per-partition frontier candidates could be pre-pruned before the
shuffle (a local skyline is a superset filter), but the rollup in
step 1 already reduces to distinct keys, which is the same order of
magnitude.

No reference counterpart — pipeline-extension surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Pareto frontier maximizing (``x_col``, ``y_col``), optionally
    per group.  Returns one row per frontier point:
    (group_cols..., x, y, n_points) where n_points counts the fact
    rows sitting exactly on that frontier point.
    """
    groups = list(group_cols)
    per_x = df.groupBy(*groups, x_col).agg(F.max(y_col).alias("_ymax"))
    w = (
        Window.partitionBy(*groups)
        .orderBy(F.desc(x_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # rows are one-per-distinct-x, so "preceding rows" == strictly
    # greater x; NULL running max (the largest x) is never dominated
    frontier = (
        per_x.withColumn("_prev_best", F.max("_ymax").over(w))
        .where(
            F.col("_prev_best").isNull()
            | (F.col("_ymax") > F.col("_prev_best"))
        )
        .drop("_prev_best")
    )
    # count only the fact rows AT the frontier y (same x, lower y is
    # dominated by the frontier point itself)
    at_y = df.groupBy(*groups, x_col, y_col).agg(
        F.count(F.lit(1)).alias("n_points")
    )
    return (
        frontier.join(at_y, [*groups, x_col])
        .where(F.col(y_col) == F.col("_ymax"))
        .select(*groups, x_col, y_col, "n_points")
    )

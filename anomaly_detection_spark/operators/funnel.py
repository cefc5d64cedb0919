"""Sequential event-funnel matching (view -> click -> purchase ...).

Step k's timestamp is the entity's first event satisfying step k's
predicate STRICTLY AFTER step k-1's timestamp (first-touch semantics).

Spark shape: one chained window-min pass per step over the SAME
entity-key partitioning — the planner inserts exactly one exchange for
the whole chain, and the per-entity rollup that follows reuses it
(hash partitioning is already satisfied), so an N-step funnel over any
corpus size is a single shuffle keyed on the entity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_times(
    df: DataFrame,
    steps: list[tuple[str, Column]],
    user_col: str = "user_id",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """One row per entity with a timestamp column per step (named after
    the step), NULL from the first step the entity never completed.

    ``within_seconds`` bounds each step's conversion window: step k
    must occur within that many seconds AFTER step k-1 (the realistic
    funnel — an ad click a month after the view is not a conversion).
    Note the first-touch subtlety this inherits: each step's time is
    the FIRST qualifying event, so a later in-window pair is not
    credited if the first step-k event fell outside the window —
    standard first-touch attribution, stated rather than hidden.
    """
    w = Window.partitionBy(user_col)
    cur = df
    prev_ts: Column | None = None
    names: list[str] = []
    for name, pred in steps:
        if prev_ts is None:
            cond = pred
        else:
            cond = pred & (F.col(ts_col) > prev_ts)
            if within_seconds is not None:
                cond = cond & (
                    F.unix_micros(F.col(ts_col).cast("timestamp"))
                    - F.unix_micros(prev_ts.cast("timestamp"))
                    <= int(within_seconds) * 1_000_000
                )
        cur = cur.withColumn(
            f"_t_{name}", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev_ts = F.col(f"_t_{name}")
        names.append(name)
    return cur.groupBy(user_col).agg(
        *[F.max(f"_t_{n}").alias(n) for n in names]
    )


def funnel_summary(per_user: DataFrame, step_names: list[str]) -> DataFrame:
    """(step, stage, users, conv_rate) — one row per step; conv_rate is
    against the total entity population (step 0)."""
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.count(n).alias(f"_c{i}") for i, n in enumerate(step_names)
    ]
    s = per_user.agg(*aggs)
    rows = s.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("step"),
                        F.lit(n).alias("stage"),
                        F.col(f"_c{i}").alias("users"),
                        F.col("n").alias("n"),
                    )
                    for i, n in enumerate(step_names)
                ]
            )
        ).alias("r")
    ).select("r.*")
    return rows.select(
        "step", "stage", "users",
        F.round(F.col("users").cast("double") / F.col("n"), 6).alias("conv_rate"),
    ).orderBy("step")

"""Incremental aggregate maintenance — the materialized-view pattern.

At 100 TB you do not recompute a per-entity rollup from scratch every
day; you maintain it: aggregate ONLY the new partition (the delta) and
merge it into yesterday's aggregate state with the aggregation's merge
function.  This is exactly Spark's internal partial-aggregation
contract (update/merge) lifted to the job level, so the merged result
is bit-identical to a full recompute for any decomposable aggregate:

    count   : n_base + n_delta
    sum     : sum_base + sum_delta          (exact integer grid here)
    min/max : min(min_base, min_delta) / max(...)
    avg     : merged_sum / merged_count     (derive at read time — never
                                             store a plain avg; averages
                                             of averages are wrong)

The merge itself is a union + re-aggregate over the (tiny) state
tables, not a join: union keeps the plan append-only, handles keys
that exist on only one side without null-coalescing every column, and
re-uses the same merge expressions as an N-way merge (backfill of many
deltas in one pass).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_agg_states(
    states: Sequence[DataFrame],
    keys: Sequence[str],
    merges: dict[str, Column],
) -> DataFrame:
    """Merge N compatible aggregate-state tables (same schema: keys +
    state columns) into one.  ``merges`` maps each state column to its
    merge aggregate over the unioned rows, e.g.
    ``{"n": F.sum("n"), "min_ts": F.min("min_ts")}``.
    """
    if not states:
        raise ValueError("need at least one state table")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in merges.items()]
    )


def incremental_join_delta(
    base_l: DataFrame,
    delta_l: DataFrame,
    base_r: DataFrame,
    delta_r: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Delta of an inner equi-join under appends — the incremental
    VIEW-MAINTENANCE identity for joins:

        (L ∪ dL) ⋈ (R ∪ dR)  =  L⋈R  ∪  dL⋈R  ∪  L⋈dR  ∪  dL⋈dR

    so the NEW join rows are exactly ``dL⋈R ∪ L⋈dR ∪ dL⋈dR``.  At
    100 TB this is the difference between re-joining two full fact
    tables every day and joining yesterday's (bucketed, co-located)
    bases against today's small deltas: each of the three terms has at
    least one delta side, so no base×base work ever re-runs, and the
    delta sides broadcast when small.

    Append-only semantics (no updates/deletes — CDC with deletes goes
    through operators/upsert.py:cdc_apply first).  Returns the join
    DELTA; union it with the stored L⋈R to materialize the new view.
    """
    keys = list(keys)
    return (
        delta_l.join(base_r, keys)
        .unionByName(base_l.join(delta_r, keys))
        .unionByName(delta_l.join(delta_r, keys))
    )

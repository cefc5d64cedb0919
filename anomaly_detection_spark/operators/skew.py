"""Skew-handling and shuffle-avoidance utilities (SURVEY.md §4 /
100 TB design notes).

- **Salted two-phase aggregation** — for aggregations over keys with
  pathological hot values: phase 1 aggregates on (key, salt) spreading
  a hot key over N reducers, phase 2 merges the partials. Classic
  map-side-combine generalization; correct for any algebraic aggregate
  expressed as (partial, merge) pairs.
- **Bucketed table writes** — persist fact tables bucketed by their
  join/grouping key so later equi-joins and aggregations co-locate
  without an Exchange (`test_scale_patterns.py` asserts the
  exchange-free plan).

AQE's runtime skew-join splitting is already on via session config;
these are for the cases AQE can't fix (skewed aggregation keys,
repeated joins on the same key).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with key salting.

    ``partials`` maps output column name → (phase-1 aggregate over the
    raw rows, phase-2 merge over the phase-1 results). Example::

        salted_agg(df, ["k"], {
            "n":   (F.count(F.lit(1)), F.sum("n")),
            "tot": (F.sum("v"),        F.sum("tot")),
        })

    Phase 1 groups by (keys…, salt) — a hot key's rows spread over
    ``n_salts`` reducers; phase 2 groups by keys… over ``n_salts``
    partial rows per key, which is trivially small.

    The salt hashes the full row CONTENT (like ``salted_join``), never
    ``monotonically_increasing_id``: a content hash is stable when a
    task is re-executed after executor loss, so re-fetched rows land in
    the same (key, salt) group as the partials already consumed.
    Fully-duplicate rows share a salt (less spreading in the degenerate
    all-identical-rows case) — the price of retry determinism.
    """
    keys = list(keys)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts))
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, (expr, _merge) in partials.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_expr, merge) in partials.items()]
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by key columns.

    Later equi-joins / groupBys on ``bucket_cols`` between tables with
    the same bucketing read co-located buckets and skip the Exchange —
    the biggest single shuffle win for repeatedly-joined 100 TB facts.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: spread each hot key of ``skewed``
    across ``n_salts`` reducers by salting, replicate ``small``
    n_salts× so every salted partition finds its match.

    The salt is a deterministic hash of the skewed row (stable across
    retries — required for task re-execution correctness). Shuffle
    volume: |skewed| + n_salts·|small|; use when AQE's runtime skew
    splitting can't help (e.g. the join feeds a co-partitioned window
    and the Exchange must stay).
    ``how``: 'inner' or 'left' (left preserves unmatched skewed rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how}")
    keys = list(keys)
    l = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*skewed.columns), F.lit(n_salts)).cast("int")
    )
    r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return l.join(r, on=keys + ["_salt"], how=how).drop("_salt")

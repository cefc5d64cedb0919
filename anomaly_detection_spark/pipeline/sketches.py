"""Frequent-items (heavy-hitters) detection via a two-pass
Misra-Gries sketch with exact verification.

Pass 1 — sketch: each partition folds its items through a bounded
Misra-Gries summary (``capacity`` counters, mergeable-summaries
variant: batch value-counts merge in, then the (capacity+1)-th largest
weight is subtracted from every counter — Agarwal et al., "Mergeable
Summaries", PODS'12).  Guarantee: an item with true frequency
> n/(capacity+1) survives with a positive lower bound; with
``capacity >= 2/phi``, every phi-heavy item is recalled.

Pass 2 — verify: the (vocabulary-shaped, tiny) candidate set is
broadcast back against the item stream for EXACT counts, and the final
filter ``count >= phi * n`` makes the output exact and deterministic
regardless of which extra candidates the sketch happened to keep —
which is what lets a sketch-backed algorithm carry a full SQL oracle.

Scale: pass 1 is map-only with O(capacity) memory per task (the
classic reason to sketch at 100 TB — no shuffle of the raw stream);
pass 2 is a broadcast semi-join plus a map-side-combining count over
candidate rows only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_partials(
    items: DataFrame, item_col: str = "item", capacity: int = 400
) -> DataFrame:
    """Per-partition Misra-Gries summaries: (item, lb) with at most
    ``capacity`` rows per input partition; ``lb`` is the MG lower
    bound on the partition-local frequency."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            # vectorized per-batch counting, then one dict merge
            for item, c in pdf[item_col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > capacity:
                # subtract the (capacity+1)-th largest from everyone
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    k: v - cut for k, v in counters.items() if v > cut
                }
        yield pd.DataFrame(
            {item_col: list(counters), "lb": list(counters.values())}
        )

    return items.mapInPandas(fold, f"{item_col} string, lb long")


def heavy_hitters_exact(
    items: DataFrame,
    phi: float,
    item_col: str = "item",
    capacity: int | None = None,
) -> DataFrame:
    """All items with frequency >= phi * n, with EXACT counts and
    shares: (item, cnt, share).  Candidates come from the MG sketch
    (default capacity ceil(2/phi) — recall-guaranteed); counts come
    from the exact verify pass."""
    if capacity is None:
        capacity = max(1, int(2.0 / phi + 0.999999))
    candidates = (
        misra_gries_partials(items, item_col, capacity)
        .groupBy(item_col)
        .agg(F.sum("lb").alias("_lb"))
        .select(item_col)
    )
    total = items.agg(F.count(F.lit(1)).alias("_n"))
    exact = (
        items.join(F.broadcast(candidates), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("cnt").cast("double") >= F.lit(phi) * F.col("_n"))
        .select(
            item_col, "cnt",
            F.round(F.col("cnt").cast("double") / F.col("_n"), 6).alias("share"),
        )
    )

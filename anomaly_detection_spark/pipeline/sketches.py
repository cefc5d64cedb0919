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


def count_min_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms:",
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch build (Cormode & Muthukrishnan 2005): ``depth``
    independent hash rows of ``width`` counters; every key increments
    one counter per row, and a point query reads the MINIMUM of its
    ``depth`` counters — an overestimate by at most eps*N with high
    probability, never an underestimate.

    Hashes are salted portable-md5 buckets (identical arithmetic in
    any engine with md5 — the whole sketch is deterministic
    cross-engine, so the ESTIMATES themselves are oracle-checkable,
    not just their error band).

    Scale shape: the input is exploded x``depth`` into slim
    (row, bucket) pairs and rolled up with map-side combine — one
    shuffle of at most ``depth * width`` result rows; counter memory
    is O(depth*width) regardless of key cardinality, which is the
    whole point of sketching a 100 TB stream.

    Pass ``weight_col`` to build from a PRE-AGGREGATED (key, count)
    table instead of raw occurrences — counters add, so the sketch is
    identical, but the explode runs over |vocab| rows instead of the
    full stream (the right build path whenever a word-count rollup
    already exists in the pipeline).

    Returns (d, bucket, cnt) — the sketch matrix in long form.
    """
    from anomaly_detection_spark.pipeline.decontaminate import (
        portable_hash_bucket,
    )

    w = (
        F.col(weight_col).cast("long") if weight_col is not None
        else F.lit(1).cast("long")
    )
    rows = df.select(
        w.alias("_w"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    portable_hash_bucket(
                        F.col(key_col), width, salt=f"{salt}{d}:"
                    ).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("cell"),
    )
    return (
        rows.groupBy(F.col("cell.d").alias("d"),
                     F.col("cell.bucket").alias("bucket"))
        .agg(F.sum("_w").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms:",
) -> DataFrame:
    """Point-query ``probes[key_col]`` against a ``count_min_build``
    sketch: estimate = min over the ``depth`` counters the key hashes
    to.  The sketch matrix (``depth*width`` rows) broadcasts; probing
    is a broadcast equi-join + min rollup — no corpus-sized work.

    Returns probes + ``cms_est``.
    """
    from anomaly_detection_spark.pipeline.decontaminate import (
        portable_hash_bucket,
    )

    cells = probes.select(
        key_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    portable_hash_bucket(
                        F.col(key_col), width, salt=f"{salt}{d}:"
                    ).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("cell"),
    ).select(key_col, "cell.d", "cell.bucket")
    return (
        cells.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("cms_est"))
    )

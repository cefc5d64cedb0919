"""Bloom-filter runtime join pruning — the 100 TB fact x dim pattern.

When the dim side of a join is too large to broadcast as ROWS but its
key set compresses into a few hundred KB of BITS, the scalable plan is:

  1. fold the dim keys into a Bloom bitmap with a distributed
     ``bit_or`` aggregation (only ``n_bits/64`` longs ever reach the
     driver — never the keys themselves);
  2. semi-filter the fact table against the bitmap BEFORE its shuffle,
     so rows that cannot join never enter the exchange;
  3. run the exact join on the survivors — Bloom false positives are
     eliminated here, so the result is bit-identical to the plain join.

This is the hand-rolled equivalent of Spark's runtime row-level filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), exposed as an
operator so the pruning applies to plans the optimizer won't infer
(e.g. a dim defined by a subquery the fact scan can't see through, or
a fact read repeated across jobs that can reuse one serialized bitmap).

Everything is JVM-side column expressions: ``xxhash64`` positions, a
broadcast 1-row bitmap relation (the array literal exists ONCE in the
plan, not once per probe), ``element_at`` + bitwise AND tests.

Reference scope note: the reference joins tiny dims only
(anomaly_proj_query.sql:217-220) — broadcast handles those; this
operator is the scale path beyond the reference.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^b for b in 0..63 as signed-long bit masks (2^63 wraps negative)
_POW2 = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]

_BITMAP = "_bloom_words"


def build_bloom_bitmap(
    dim: DataFrame,
    key_col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    seed: int = 0,
) -> list[int]:
    """Distributed Bloom build: each dim key sets ``n_hashes`` bits;
    bits fold into words with a ``bit_or`` partial aggregation (map-side
    combine), so the shuffle carries at most ``n_bits/64`` rows and the
    driver receives only the bitmap.

    Returns the bitmap as ``n_bits // 64`` longs (dense, index 0 first).
    """
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    n_words = n_bits // 64
    pos = F.explode(
        F.array(*[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(seed + i)), F.lit(n_bits))
            for i in range(n_hashes)
        ])
    ).alias("pos")
    pow2 = F.lit(_POW2)
    words = (
        dim.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.element_at(pow2, (F.col("pos") % 64).cast("int") + 1).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    dense = [0] * n_words
    for r in words:
        dense[r["word_idx"]] = r["word"]
    return dense


def bloom_prune(
    fact: DataFrame,
    key_col: str,
    bitmap: Sequence[int],
    n_hashes: int = 5,
    seed: int = 0,
) -> DataFrame:
    """Filter ``fact`` to rows whose key passes the Bloom test
    (all ``n_hashes`` bits set). May keep false positives; never drops
    a true match. NULL keys are dropped (they cannot equi-join).

    The bitmap rides in a broadcast single-row relation so the array
    literal appears once in the plan regardless of ``n_hashes``.
    """
    n_bits = len(bitmap) * 64
    spark = fact.sparkSession
    bm = spark.createDataFrame([(list(bitmap),)], f"{_BITMAP} array<long>")
    probe = fact.join(F.broadcast(bm))
    pow2 = F.lit(_POW2)
    tests = []
    for i in range(n_hashes):
        pos = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed + i)), F.lit(n_bits))
        word = F.element_at(F.col(_BITMAP), (pos / 64).cast("int") + 1)
        mask = F.element_at(pow2, (pos % 64).cast("int") + 1)
        tests.append(word.bitwiseAND(mask) != 0)
    keep = tests[0]
    for t in tests[1:]:
        keep = keep & t
    return probe.where(F.col(key_col).isNotNull() & keep).drop(_BITMAP)


def bloom_filtered_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    seed: int = 0,
) -> DataFrame:
    """Inner equi-join with Bloom pre-pruning of the fact side.

    Result is exactly ``fact JOIN dim`` — the join removes Bloom false
    positives — but the fact rows that reach the join's exchange are
    only those whose key *might* exist in ``dim``: with a selective dim,
    shuffle volume drops by the dim's selectivity (minus the FP rate,
    ~``(1 - e^(-kn/m))^k``).

    The two dim passes (bitmap build + join) read a dataset that at
    100 TB scale is orders of magnitude smaller than the fact side the
    pruning saves; cache ``dim`` if its lineage is expensive.
    """
    bitmap = build_bloom_bitmap(dim, dim_key, n_bits, n_hashes, seed)
    pruned = bloom_prune(fact, fact_key, bitmap, n_hashes, seed)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], "inner")

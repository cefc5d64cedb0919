"""Z-order (Morton-curve) data layout for multi-dimensional skipping.

At 100 TB, scan cost is dominated by which files/row-groups a filter
can SKIP via parquet min/max statistics.  Sorting by one column makes
its stats tight but leaves every other column's span full-width;
interleaving the bits of several columns' rank buckets (the Z-order
curve) makes EVERY participating column's per-file span narrow, so
selective filters on any subset of those columns prune most files.

Construction (all JVM expressions, one range exchange total):

1. per column, quantile boundaries from ``approxQuantile`` (a driver
   artifact like a PQ codebook: ~2^bits doubles, baked as a literal) map
   the value to a rank bucket in [0, 2^bits) — rank-based, so skewed
   distributions still fill the grid evenly;
2. bucket bits are interleaved into the Morton code with
   ``shiftleft``/bitwise-or folds;
3. ``repartitionByRange`` + ``sortWithinPartitions`` on the code
   clusters the curve into files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(col: str, boundaries: list[float], bits: int) -> Column:
    """Rank bucket in [0, 2^bits) from precomputed quantile boundaries
    (len == 2^bits - 1) via a literal-array binary search: the bucket is
    the count of boundaries <= value — a single JVM ``filter``+``size``
    over a small literal array."""
    blit = F.array(*[F.lit(float(b)) for b in boundaries])
    v = F.col(col).cast("double")
    return F.size(F.filter(blit, lambda b: b <= v)).cast("long")


def _interleave(buckets: list[Column], bits: int) -> Column:
    z = F.lit(0).cast("long")
    m = len(buckets)
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * m + j))
    return z


def zorder_code(
    df: DataFrame, cols: list[str], bits: int = 8,
    boundaries: dict[str, list[float]] | None = None,
) -> DataFrame:
    """Append ``_zorder``: the Morton code over rank buckets of
    ``cols``.  ``boundaries`` (per-column ascending quantile cut
    points, 2^bits - 1 each) can be passed to reuse a precomputed
    artifact; otherwise one ``approxQuantile`` pass computes them."""
    n_buckets = 1 << bits
    if boundaries is None:
        probs = [k / n_buckets for k in range(1, n_buckets)]
        boundaries = {
            c: df.stat.approxQuantile(c, probs, 0.001) for c in cols
        }
    bucket_cols = [_bucket_expr(c, boundaries[c], bits) for c in cols]
    return df.withColumn("_zorder", _interleave(bucket_cols, bits))


def zorder_write(
    df: DataFrame, cols: list[str], path: str,
    n_files: int = 32, bits: int = 8,
) -> None:
    """Write ``df`` parquet clustered along the Z-order curve of
    ``cols``: range-partition on the code (one exchange), sort within
    partitions, drop the helper column."""
    coded = zorder_code(df, cols, bits)
    (
        coded.repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite")
        .parquet(path)
    )

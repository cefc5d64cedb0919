"""Distributed global ranking — rank family without a single-task window.

A global ``Window.orderBy(...)`` (no partitionBy) funnels the whole table
through ONE task: correct at small scale, a hard wall at 100 TB.  This
module computes the same rank-family columns with a two-pass scheme:

1. ``repartitionByRange`` on the sort keys — every partition holds a
   contiguous, disjoint key range, and all rows sharing a key value land
   in the SAME partition (RangePartitioner assigns by key value), so
   rank/dense_rank tie groups never straddle partitions.
2. Per-partition local ranks via an ordinary partitioned window, plus a
   tiny per-partition stats table (row count, distinct-key count) that is
   cumulated on the driver (P rows, P = shuffle parallelism) and mapped
   back as a broadcast literal — each local rank is then shifted by its
   partition's global offset.

percent_rank / cume_dist / ntile derive from the global row number and
the global total, matching ANSI semantics:

- ``percent_rank = (rank - 1) / (n - 1)``
- ``cume_dist   = max(row_number) within the tie group / n``
- ``ntile(k)``: first ``n % k`` tiles get ``n // k + 1`` rows.

Caveat: order-key columns must be non-null (NULL ordering would need an
explicit convention); callers should ``coalesce`` first if needed.

Reference parity: reproduces the rank-family semantics of window clauses
like ``anomaly_proj_query.sql``'s ``ROW_NUMBER() OVER (ORDER BY ...)``
shapes at distributed scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rank_family(
    df: DataFrame,
    order_cols: list[str],
    ntile_n: int = 4,
    num_partitions: int | None = None,
    unpersist_after_offsets: bool = False,
) -> DataFrame:
    """Append ``global_rn, rnk, drnk, pct_rank, cume, tile`` computed
    over the global ordering ``order_cols`` — no SinglePartition
    exchange anywhere in the plan.

    ``pct_rank``/``cume`` are exact doubles (round in the caller if a
    fixed grid is wanted); ``tile`` uses ``ntile_n`` buckets.

    ``unpersist_after_offsets=True`` releases the ranged cache as soon
    as the per-partition offsets are collected, so repeated invocations
    (bench members, session-long callers) don't accumulate cached
    datasets in executor storage.  Correctness is unaffected: the
    offsets job and the output job share the SAME ``ranged`` DataFrame
    object, so the output re-reads the already-materialized shuffle
    files of the range exchange (identical partition ids) rather than
    resampling.  Default ``False`` keeps the executed plan of existing
    callers byte-identical; flipping the default is a planned
    mass-reverify change.
    """
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    sort_exprs = [F.col(c) for c in order_cols]

    ranged = (
        df.repartitionByRange(p, *sort_exprs)
        .withColumn("_part", F.spark_partition_id())
        .persist()
    )
    stats = sorted(
        ranged.groupBy("_part")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.count_distinct(*sort_exprs).alias("_dcnt"),
        )
        .collect(),
        key=lambda r: r["_part"],
    )
    n_total = sum(r["_cnt"] for r in stats)
    if n_total == 0:
        empty = ranged.drop("_part")
        ranged.unpersist()
        return (
            empty.withColumn("global_rn", F.lit(None).cast("long"))
            .withColumn("rnk", F.lit(None).cast("long"))
            .withColumn("drnk", F.lit(None).cast("long"))
            .withColumn("pct_rank", F.lit(None).cast("double"))
            .withColumn("cume", F.lit(None).cast("double"))
            .withColumn("tile", F.lit(None).cast("int"))
        )

    if unpersist_after_offsets:
        # Offsets are in hand; the output pass below re-reads the range
        # exchange's shuffle files (same DataFrame object -> same RDD ->
        # same partitioning), so the cache is no longer needed.
        ranged.unpersist()

    # driver-side cumulative offsets -> tiny literal maps (P entries)
    row_off, dense_off, row_acc, dense_acc = {}, {}, 0, 0
    for r in stats:
        row_off[r["_part"]] = row_acc
        dense_off[r["_part"]] = dense_acc
        row_acc += r["_cnt"]
        dense_acc += r["_dcnt"]
    row_map = F.create_map(
        *[F.lit(x) for pid in row_off for x in (pid, row_off[pid])]
    )
    dense_map = F.create_map(
        *[F.lit(x) for pid in dense_off for x in (pid, dense_off[pid])]
    )

    wloc = Window.partitionBy("_part").orderBy(*sort_exprs)
    wtie = Window.partitionBy("_part", *order_cols)
    out = (
        ranged.withColumn("_roff", row_map[F.col("_part")])
        .withColumn("_doff", dense_map[F.col("_part")])
        .withColumn("global_rn", F.row_number().over(wloc) + F.col("_roff"))
        .withColumn("rnk", F.rank().over(wloc) + F.col("_roff"))
        .withColumn("drnk", F.dense_rank().over(wloc) + F.col("_doff"))
    )
    out = out.withColumn("_cume_num", F.max("global_rn").over(wtie))

    n = F.lit(n_total).cast("double")
    pct = F.when(
        F.lit(n_total) > 1,
        (F.col("rnk") - 1).cast("double") / (n - 1),
    ).otherwise(F.lit(0.0))
    cume = F.col("_cume_num").cast("double") / n

    q, r = divmod(n_total, ntile_n)
    rn = F.col("global_rn")
    if q == 0:
        tile = rn.cast("int")  # fewer rows than tiles: tile == row number
    else:
        big_rows = (q + 1) * r  # rows covered by the (n % k) larger tiles
        tile = (
            F.when(rn <= big_rows, ((rn - 1) / (q + 1)).cast("int") + 1)
            .otherwise(F.lit(r) + ((rn - 1 - big_rows) / q).cast("int") + 1)
        )

    return (
        out.withColumn("pct_rank", pct)
        .withColumn("cume", cume)
        .withColumn("tile", tile.cast("int"))
        .drop("_part", "_roff", "_doff", "_cume_num")
    )

"""Distributed global ranking — rank family without a single-task window.

A global ``Window.orderBy(...)`` (no partitionBy) funnels the whole table
through ONE task: correct at small scale, a hard wall at 100 TB.  This
module computes the same rank-family columns with a two-pass scheme
expressed as ONE Spark plan:

1. ``repartitionByRange`` on the sort keys — every partition holds a
   contiguous, disjoint key range, and all rows sharing a key value land
   in the SAME partition (RangePartitioner assigns by key value), so
   rank/dense_rank tie groups never straddle partitions.
2. A tiny per-partition stats branch (row count, distinct-key count —
   P rows, P = shuffle parallelism) is cumulated into global offsets by
   a P x P broadcast CROSS of the stats table against itself (sum of
   counts over partitions with a smaller id — deliberately not a window
   over the stats rows, which would introduce the very SinglePartition
   exchange this module exists to avoid), then broadcast-joined back on
   the partition id; each local rank is shifted by its partition's
   offset.

Both the stats branch and the output branch hang off the SAME
``repartitionByRange`` subtree inside a single physical plan, so
Catalyst's exchange-reuse rule executes the range shuffle ONCE and both
branches observe identical partition boundaries.  This is load-bearing,
not an optimization: ``RangePartitioner`` picks boundaries by
RESERVOIR-SAMPLING its input, so two separately-compiled executions of
the "same" repartitionByRange can disagree once a partition holds more
rows than the sample size (~100 per output partition).  The pre-r8
implementation collected the stats in a separate driver action against
a cached copy; releasing that cache before the output action made the
output job re-sample new boundaries and silently mis-shift every rank
(caught by the round-8 mass reverify at sf0.01: ``ntile(8)`` emitted 9
buckets).  The single-plan form has no cache to leak and no
driver-side action at all; a plan-shape test asserts the
``ReusedExchange`` node.

percent_rank / cume_dist / ntile derive from the global row number and
the global total, matching ANSI semantics:

- ``percent_rank = (rank - 1) / (n - 1)``
- ``cume_dist   = max(row_number) within the tie group / n``
- ``ntile(k)``: first ``n % k`` tiles get ``n // k + 1`` rows.

Hard config requirement: correctness depends on Catalyst executing the
range exchange ONCE for both branches — ``spark.sql.exchange.reuse``
(default true; AQE's stage reuse is gated by the same flag) must not be
disabled, or each branch re-samples its own boundaries and every rank
silently mis-shifts.  ``rank_family`` checks the conf at call time and
raises rather than return corrupt ranks on a non-default cluster.

NULL order keys: there is no silent convention — the plan embeds an
``assert_true`` on every order column, so a NULL key fails the job
loudly at shuffle-write time instead of mis-ranking.  Callers with
nullable keys must ``coalesce`` to an explicit sentinel first.

Content-fingerprint guard (round 10): exchange reuse compares
CANONICALIZED subtrees, and column pruning is applied per branch —
when the input carries a payload column that the stats branch does not
need (any column outside ``partition_cols + order_cols``), Catalyst
used to prune it below the stats/peers copy of the range exchange,
the pruned and full-width subtrees no longer canonicalize equal, and
AQE materialized the range shuffle TWICE with independently sampled
boundaries (observed: two ``ShuffleQueryStage``s for
``kendall_w_event_types``, whose grid carries ``user_id`` as payload;
deterministic locally because ``RangePartitioner`` seeds by partition
index, silently corrupt at scale where upstream shuffle-fetch order
varies between executions).  The fix makes every branch off the
shared subtree reference the FULL column width: the stats aggregate
sums a per-row ``xxhash64`` over all input columns, the peers branch
carries that sum through, and the output branch recomputes the same
sum as a per-(partition, group) window — identical pruning in all
three consumers restores canonical equality and ReuseExchange fires.
The fingerprints then do double duty: an in-plan ``assert_true``
compares the stats-branch, peers-branch, and output-branch digests,
so if reuse is ever lost again the job fails loudly instead of
shipping mis-shifted ranks.  Cost note: the digest hashes EVERY input
column (twice per row: stats aggregate + output window) — that is the
point, full-width reference is what restores reuse — so callers
should project to the columns they actually need before ranking, as
every registered caller already does; measured overhead on the bench
members is below run-to-run noise.

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
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Append ``global_rn, rnk, drnk, pct_rank, cume, tile`` computed
    over the global ordering ``order_cols`` — no SinglePartition
    exchange, no cache, no driver-side action anywhere in the plan.

    ``pct_rank``/``cume`` are exact doubles (round in the caller if a
    fixed grid is wanted); ``tile`` uses ``ntile_n`` buckets.  The
    rank columns are ``long`` (a global rank outgrows int32 well
    below the 100 TB design point).

    ``partition_cols`` (round 9): rank independently WITHIN each group
    — the scale path for ``rank() OVER (PARTITION BY g ORDER BY ...)``
    when a single group outgrows one task (a plain grouped window puts
    each group in ONE partition; here the range exchange spreads the
    combined ``(group, order)`` key space over all partitions, tie
    groups stay co-located by key equality, and the offsets cumulate
    per group).  With few small groups the plain window is cheaper;
    this path exists for FEW-LARGE-GROUPS shapes (e.g. per-rater
    rankings over all users).  The stats table grows to at most
    P + |groups| rows (each group occupies a contiguous part range),
    and the cumulation cross joins on the group key, so the broadcast
    stays metadata-sized for dictionary-sized group counts.  NULL
    group keys form their own group (every group-key join in the plan
    is null-safe), matching ``PARTITION BY`` window semantics — only
    NULL ORDER keys fail loudly.  Default ``None`` compiles the exact
    pre-r9 single-ordering plan.
    """
    spark = df.sparkSession
    # Fail fast on the one config this plan's soundness rests on: with
    # exchange reuse disabled, the stats branch and the output branch
    # each compile their own range shuffle with independently
    # reservoir-sampled boundaries — the exact silent-corruption class
    # the single-plan rewrite eliminated.  (AQE's shuffle-stage reuse
    # is gated by the same flag, so one check covers both planners.)
    if spark.conf.get("spark.sql.exchange.reuse", "true").lower() != "true":
        raise RuntimeError(
            "rank_family requires spark.sql.exchange.reuse=true: its "
            "stats and output branches must observe ONE execution of "
            "the range exchange, or rank offsets are computed against "
            "different partition boundaries and every rank mis-shifts."
        )
    p = num_partitions or spark.sparkContext.defaultParallelism
    # NULL order keys have no defined placement here — rather than a
    # silent convention, embed an in-plan assertion that fails the job
    # at shuffle-write time (first evaluation of the sort key).  The
    # when(assert_true(..).isNull(), col) wrapper preserves the key's
    # value and type for non-null rows at the cost of one predicate per
    # key per row, evaluated once thanks to exchange reuse.
    sort_exprs = [
        F.when(
            F.assert_true(
                F.col(c).isNotNull(),
                F.lit(
                    f"rank_family: NULL order key in column '{c}' — "
                    "coalesce to a sentinel before ranking"
                ),
            ).isNull(),
            F.col(c),
        )
        for c in order_cols
    ]

    pcols = list(partition_cols or [])
    # Per-row content fingerprint over EVERY input column — its job is
    # to force identical column pruning in all three consumers of the
    # range exchange (stats aggregate, peers copy, output join), which
    # is what makes the canonicalized subtrees equal and ReuseExchange
    # fire; see the module docstring.  MapType is not hashable by
    # xxhash64 without a legacy flag, so map columns contribute their
    # keys/values arrays instead (same content, same column reference).
    from pyspark.sql.types import MapType

    _fp_refs: list = []
    for field in df.schema.fields:
        if isinstance(field.dataType, MapType):
            _fp_refs.append(F.map_keys(F.col(field.name)))
            _fp_refs.append(F.map_values(F.col(field.name)))
        else:
            _fp_refs.append(F.col(field.name))
    # decimal(38,0), not long: sums of full-range xxhash64 longs
    # overflow int64 quickly and ANSI mode turns that into a job
    # failure; a 38-digit accumulator absorbs ~1e19 rows/partition.
    fp_row = F.xxhash64(*_fp_refs).cast("decimal(38,0)")

    ranged = (
        df.repartitionByRange(p, *[F.col(g) for g in pcols], *sort_exprs)
        .withColumn("_part", F.spark_partition_id())
    )

    # Per-partition stats -> global offsets, entirely inside the plan.
    # Cumulation is a P x P broadcast cross of the P-row stats table
    # (P = shuffle parallelism, so at most a few thousand rows on any
    # cluster) rather than a global window — the whole plan stays free
    # of SinglePartition exchanges, which lets plan-shape tests assert
    # their absence as a blanket scale discipline.  In grouped mode the
    # stats table keys on (part, group) — at most P + |groups| rows,
    # since range partitioning gives each group a contiguous part run —
    # and the cross becomes a broadcast equi-join on the group key.
    stats = ranged.groupBy("_part", *pcols).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.count_distinct(*sort_exprs).alias("_dcnt"),
        F.sum(fp_row).alias("_fp"),
    )
    peers = stats.select(
        *[F.col(g).alias(f"_g_{g}") for g in pcols],
        F.col("_part").alias("_p2"),
        F.col("_cnt").alias("_c2"),
        F.col("_dcnt").alias("_d2"),
        F.col("_fp").alias("_fp2"),
    )
    if pcols:
        joined = stats.join(
            F.broadcast(peers),
            [F.col(g).eqNullSafe(F.col(f"_g_{g}")) for g in pcols],
        )
    else:
        joined = stats.crossJoin(F.broadcast(peers))
    offsets = (
        joined
        .groupBy("_part", *pcols)
        .agg(
            F.sum(
                F.when(F.col("_p2") < F.col("_part"), F.col("_c2"))
                .otherwise(0)
            ).cast("long").alias("_roff"),
            F.sum(
                F.when(F.col("_p2") < F.col("_part"), F.col("_d2"))
                .otherwise(0)
            ).cast("long").alias("_doff"),
            F.sum("_c2").cast("long").alias("_n"),
            # Stats-side digest (constant within the group) and the
            # peers-side digest of the SELF row (_p2 == _part matches
            # exactly the stats row itself in both join modes).  Both
            # must be consumed downstream or Catalyst prunes them and
            # with them the full-width scan that makes reuse possible.
            F.min("_fp").alias("_fpa"),
            F.sum(
                F.when(F.col("_p2") == F.col("_part"), F.col("_fp2"))
            ).alias("_fpb"),
        )
    )

    wloc = Window.partitionBy("_part", *pcols).orderBy(*sort_exprs)
    wtie = Window.partitionBy("_part", *pcols, *order_cols)
    if pcols:
        # NULL group keys are a legal group (groupBy above collects
        # them; a window PARTITION BY ranks them) — join the offsets
        # back null-safely or those rows silently vanish from the
        # output.  Rename the offsets side, join on explicit eqNullSafe
        # conditions, then drop the duplicated key columns.
        off_side = offsets.select(
            F.col("_part").alias("_opart"),
            *[F.col(g).alias(f"_og_{g}") for g in pcols],
            "_roff", "_doff", "_n", "_fpa", "_fpb",
        )
        cond = F.col("_part") == F.col("_opart")
        for g in pcols:
            cond = cond & F.col(g).eqNullSafe(F.col(f"_og_{g}"))
        base = ranged.join(F.broadcast(off_side), cond).drop(
            "_opart", *[f"_og_{g}" for g in pcols]
        )
    else:
        base = ranged.join(F.broadcast(offsets), ["_part"])

    # Output-branch digest of the same (partition, group) content,
    # computed as a window over the ranged rows themselves.  If the
    # output branch ever reads a DIFFERENT materialization of the
    # range exchange than the stats branch (reuse lost), some
    # partition's content digest diverges from the broadcast one and
    # the assert below fails the job instead of mis-shifting ranks.
    wpart = Window.partitionBy("_part", *pcols)
    base = base.withColumn("_fpw", F.sum(fp_row).over(wpart))
    _fp_guard = F.assert_true(
        F.col("_fpa").eqNullSafe(F.col("_fpw"))
        & F.col("_fpa").eqNullSafe(F.col("_fpb")),
        F.lit(
            "rank_family: stats and output branches observed different "
            "range partition boundaries (exchange reuse failed) — rank "
            "offsets would be corrupt"
        ),
    )

    def _guarded(expr):
        # assert_true returns NULL on success, so the when-branch
        # always fires; on digest mismatch the job dies loudly.  The
        # guard rides on the three base rank columns — every other
        # output (pct/cume/tile/_cume_num) derives from them, so any
        # caller that consumes ANY rank output keeps the fingerprint
        # columns alive against pruning.
        return F.when(_fp_guard.isNull(), expr)

    out = (
        base
        .withColumn(
            "global_rn",
            _guarded(F.row_number().over(wloc) + F.col("_roff"))
            .cast("long"),
        )
        .withColumn(
            "rnk",
            _guarded(F.rank().over(wloc) + F.col("_roff")).cast("long"),
        )
        .withColumn(
            "drnk",
            _guarded(F.dense_rank().over(wloc) + F.col("_doff"))
            .cast("long"),
        )
    )
    out = out.withColumn("_cume_num", F.max("global_rn").over(wtie))

    n_dbl = F.col("_n").cast("double")
    pct = F.when(
        F.col("_n") > 1,
        (F.col("rnk") - 1).cast("double") / (n_dbl - 1),
    ).otherwise(F.lit(0.0))
    cume = F.col("_cume_num").cast("double") / n_dbl

    # ntile from the in-plan total: q = n div k, r = n % k; the first
    # r tiles take q+1 rows.  Integer `div`, not double division —
    # double floor goes wrong past 2^53.
    out = (
        out.withColumn("_q", F.expr(f"_n div {int(ntile_n)}"))
        .withColumn("_r", F.expr(f"_n % {int(ntile_n)}"))
        .withColumn("_big", (F.col("_q") + 1) * F.col("_r"))
    )
    rn = F.col("global_rn")
    tile = (
        # fewer rows than tiles: tile == row number
        F.when(F.col("_q") == 0, rn)
        .when(
            rn <= F.col("_big"),
            F.expr("(global_rn - 1) div (_q + 1)") + 1,
        )
        .otherwise(
            F.col("_r") + F.expr("(global_rn - 1 - _big) div _q") + 1
        )
    )

    return (
        out.withColumn("pct_rank", pct)
        .withColumn("cume", cume)
        .withColumn("tile", tile.cast("int"))
        .drop("_part", "_roff", "_doff", "_n", "_cume_num", "_q", "_r",
              "_big", "_fpa", "_fpb", "_fpw")
    )

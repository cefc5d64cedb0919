#!/usr/bin/env python
"""Round-11 optimization probe: bench-protocol member timing + variants.

The r10 round's two driver-bench regressions were exactly the gap
between warm same-query floors and the driver's protocol (fresh JVM,
generic warm-up, min-of-2 .count() with clearCache between runs).  This
probe reproduces the DRIVER's protocol per member:

  - a CHILD process per measurement (fresh JVM)
  - bench.py's generic `_warm_up` (tpch_q1 + tiny UDF/explode/
    applyInPandas bootstrap — never the measured query)
  - N timed `.count()` runs with `clearCache()` after each (default 2,
    the bench's min-of-2), reporting every run plus the min

Variants: a member may be measured under an alternative *layout*
implemented locally in this script (same results, different physical
plan) so candidate layouts can be A/B'd cold without editing the tree
between cycles.  Variant outputs are asserted row-identical to the
registry implementation at child start (sf0.001) unless --no-check.

Usage:
  python scripts/opt_probe_r11.py [--reps N] [--tag T] member[:variant] ...
  python scripts/opt_probe_r11.py --plan-dir plans/r11 --plan-only member ...
"""

from __future__ import annotations

import argparse
import io
import json
import os
import subprocess
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


# --------------------------------------------------------------------------
# Variant layouts under study (results identical; plans differ).
# Each entry: (member, variant) -> fn(spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------

def _sparse_cosine(layout: str):
    """sparse_cosine_pairs with the exploded-gram layout as a knob:
    fixed  = repartition(defaultParallelism, "g")   (the r10 shape)
    aqe    = repartition("g")                        (AQE owns the width)
    none   = no explicit gram exchange               (the r9 shape)
    """

    def q(spark, sf_dir):
        from pyspark.sql import functions as F
        from anomaly_detection_spark.sources.tables import (
            load_table, spread_single_file,
        )

        docs = spread_single_file(
            load_table(spark, "documents", sf_dir).select("doc_id", "text")
        )
        t = docs.select(
            "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
        )
        grams = t.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0), F.greatest(F.size("t") - 3, F.lit(0))
                    ),
                    lambda i: F.concat_ws(" ", F.slice(F.col("t"), i + 1, 3)),
                )
            ).alias("g"),
        )
        if layout == "fixed":
            grams = grams.repartition(
                spark.sparkContext.defaultParallelism, "g"
            )
        elif layout == "aqe":
            grams = grams.repartition("g")
        elif layout != "none":
            raise ValueError(layout)
        tf = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        norms = tf.groupBy("doc_id").agg(
            F.sum(F.col("c") * F.col("c")).alias("norm2")
        )
        df_tab = tf.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
        posting = tf.join(df_tab.where(F.col("df") <= 50), "g").select(
            "doc_id", "g", "c"
        )
        a = posting.select(
            F.col("doc_id").alias("id_a"), "g", F.col("c").alias("ca")
        )
        b = posting.select(
            F.col("doc_id").alias("id_b"), "g", F.col("c").alias("cb")
        )
        num = (
            a.join(b, "g")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
        )
        na = norms.select(F.col("doc_id").alias("id_a"),
                          F.col("norm2").alias("n2a"))
        nb = norms.select(F.col("doc_id").alias("id_b"),
                          F.col("norm2").alias("n2b"))
        cos = (
            F.col("dot").cast("double")
            / (F.sqrt(F.col("n2a").cast("double"))
               * F.sqrt(F.col("n2b").cast("double")))
        )
        return (
            num.join(na, "id_a").join(nb, "id_b")
            .where(cos >= 0.5)
            .select(
                "id_a", "id_b", "dot",
                (F.floor(cos * 1000000 + F.lit(0.5)) / 1000000).alias("cos"),
            )
        )

    return q


def _ndcg_restructured(spread: bool):
    """ndcg_dup_retrieval with (a) the probe leg tokenizing AFTER the
    5-row probes join instead of the whole corpus, (b) the fam leg
    reading a digest-only projection, and (c) optionally the candidate
    (BNLJ) leg spread before tokenize + 5x jaccard (stage-profiled at
    2.8 s on 4 scan partitions)."""

    def q(spark, sf_dir):
        import math
        from pyspark.sql import Window, functions as F
        from anomaly_detection_spark.sources.tables import (
            load_table, spread_single_file,
        )

        base = load_table(spark, "documents", sf_dir).select("doc_id", "text")
        planted = base.where(F.col("doc_id") % 100 < 4)
        corpus = (
            base
            .unionByName(planted.select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"))
            .unionByName(planted.select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.upper("text").alias("text")))
            .unionByName(planted.select(
                (F.col("doc_id") + 3000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" extraneous")).alias("text")))
        )
        normalized = F.md5(
            F.trim(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")))
        )
        ws_expr = F.array_distinct(
            F.filter(F.split(F.trim(F.col("text")), r"\s+"),
                     lambda w: F.length(w) > 0)
        )
        fam = (
            corpus.select("doc_id", normalized.alias("digest"))
            .groupBy("digest")
            .agg(F.min("doc_id").alias("probe_id"),
                 F.count(F.lit(1)).alias("n_fam"))
            .where(F.col("n_fam") >= 2)
        )
        probes = fam.orderBy("probe_id").limit(5)
        pt = probes.join(
            corpus.select(F.col("doc_id").alias("probe_id"), "text"),
            "probe_id",
        ).select("probe_id", "digest", "n_fam", ws_expr.alias("pws"))
        csrc = spread_single_file(corpus) if spread else corpus
        cdocs = csrc.select(
            "doc_id", normalized.alias("cdigest"), ws_expr.alias("ws")
        )
        inter = F.size(F.array_intersect(F.col("pws"), F.col("ws"))).cast("long")
        union = F.size(
            F.array_distinct(F.concat(F.col("pws"), F.col("ws")))
        ).cast("long")
        scored = (
            F.broadcast(pt.select("probe_id", "digest", "pws", "n_fam"))
            .join(cdocs, F.col("doc_id") != F.col("probe_id"))
            .select(
                "probe_id", "doc_id", "n_fam",
                (inter * 1000000).alias("_num"),
                union.alias("_den"),
                F.when(F.col("cdigest") == F.col("digest"), 1).otherwise(0)
                .alias("rel"),
            )
            .select(
                "probe_id", "doc_id", "n_fam", "rel",
                F.when(F.col("_den") == 0, F.lit(0).cast("long"))
                .otherwise(F.expr("_num div _den")).alias("jac_ppm"),
            )
        )
        wr = Window.partitionBy("probe_id").orderBy(
            F.col("jac_ppm").desc(), F.col("doc_id")
        )
        ranked = scored.withColumn("rk", F.row_number().over(wr)).where(
            F.col("rk") <= 10
        )
        gains = [
            (i, int(round(round(1.0 / math.log2(i + 1), 6) * 1000000)))
            for i in range(1, 11)
        ]
        gains_df = spark.createDataFrame(gains, "rk int, g long")
        dcg = (
            ranked.join(F.broadcast(gains_df), "rk")
            .groupBy("probe_id", "n_fam")
            .agg(
                F.sum(F.when(F.col("rel") == 1, F.col("g")).otherwise(0))
                .cast("long").alias("dcg_fp"),
                F.sum("rel").cast("long").alias("hits_at_10"),
            )
        )
        idcg = F.lit(0).cast("long")
        cum = 0
        for i, g in gains:
            cum += g
            idcg = F.when(
                F.least(F.col("n_fam") - 1, F.lit(10)) == i, cum
            ).otherwise(idcg)
        return dcg.select(
            "probe_id",
            (F.col("n_fam") - 1).cast("long").alias("n_relevant"),
            "hits_at_10", "dcg_fp",
            idcg.alias("idcg_fp"),
        ).select(
            "*",
            F.expr("CAST(dcg_fp * 1000000 div idcg_fp AS BIGINT)")
            .alias("ndcg_ppm"),
        )

    return q


VARIANTS = {
    ("sparse_cosine_pairs", "fixed"): _sparse_cosine("fixed"),
    ("sparse_cosine_pairs", "aqe"): _sparse_cosine("aqe"),
    ("sparse_cosine_pairs", "none"): _sparse_cosine("none"),
    ("ndcg_dup_retrieval", "restruct"): _ndcg_restructured(False),
    ("ndcg_dup_retrieval", "restruct_spread"): _ndcg_restructured(True),
}


def child(name: str, variant: str | None, tag: str, reps: int,
          plan_dir: str | None, check: bool) -> None:
    from anomaly_detection_spark import queries as reg
    from anomaly_detection_spark.session import get_spark
    import bench

    spark = get_spark("opt-probe-r11", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    fn = (VARIANTS[(name, variant)] if variant else reg.QUERIES[name])

    if variant and check:
        # variant must be row-identical to the registry implementation
        base = reg.QUERIES[name](spark, "/root/testdata/sf0.001")
        cand = fn(spark, "/root/testdata/sf0.001")
        assert sorted(map(tuple, base.collect())) == \
            sorted(map(tuple, cand.collect())), "variant output differs"
        spark.catalog.clearCache()

    if plan_dir:
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        os.makedirs(os.path.join(REPO, plan_dir), exist_ok=True)
        suffix = f"_{variant}" if variant else ""
        with open(os.path.join(
                REPO, plan_dir, f"{name}{suffix}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        spark.catalog.clearCache()

    if reps <= 0:
        print(json.dumps({"member": name, "variant": variant, "tag": tag,
                          "plan_only": True}), flush=True)
        return

    # the DRIVER protocol: generic warm-up, then min-of-N timed counts
    bench.SF_DIR = SF_DIR
    bench._warm_up(spark)
    spark.catalog.clearCache()
    times = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(
            f"opt-probe-r11 {name}:{variant or 'registry'} rep {i}")
        t0 = time.monotonic()
        fn(spark, SF_DIR).count()
        times.append(round(time.monotonic() - t0, 3))
        spark.catalog.clearCache()
    print(json.dumps({
        "member": name, "variant": variant, "tag": tag, "sf_dir": SF_DIR,
        "times": times, "min": min(times),
    }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r11")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--plan-only", action="store_true")
    ap.add_argument("--no-check", action="store_true")
    ap.add_argument("--child", default=None, help=argparse.SUPPRESS)
    ap.add_argument("members", nargs="*")
    args = ap.parse_args()

    if args.child:
        name, _, variant = args.child.partition(":")
        child(name, variant or None, args.tag,
              0 if args.plan_only else args.reps,
              args.plan_dir, not args.no_check)
        return

    for m in args.members:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--child", m, "--tag", args.tag, "--reps", str(args.reps)]
        if args.plan_dir:
            cmd += ["--plan-dir", args.plan_dir]
        if args.plan_only:
            cmd += ["--plan-only"]
        if args.no_check:
            cmd += ["--no-check"]
        subprocess.run(cmd, cwd=REPO, check=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Scale probe: replicate the fixture tables K× with shifted key
spaces (growing key cardinality, fixed rows-per-key — the 100 TB
shape) and measure the three hot engines: the rules pipeline, the STL
detector, and MinHash near-dedup. Prints one JSON line per scale.

Document replication suffixes every TOKEN with the copy index, so each
copy's shingle space is disjoint: replicas are NOT near-dups of each
other and true-duplicate density stays constant as K grows — the
honest linear-scale model (naive text replication would make every
replica group a K-clique and grow candidates quadratically).

Usage: python scripts/scale_probe.py [K ...]   (default: 1 5 20 100)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from anomaly_detection_spark.config import DetectorConfig
from anomaly_detection_spark.detect.rules import rule_flags
from anomaly_detection_spark.detect.stl import stl_iqr_detect
from anomaly_detection_spark.session import get_spark
from anomaly_detection_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated(spark, k: int):
    ev = load_table(spark, "events", SF_DIR)
    copies = spark.range(k).withColumnRenamed("id", "_copy")
    return (
        ev.crossJoin(F.broadcast(copies))
        .withColumn("user_id", F.col("user_id") + F.col("_copy") * 1_000_000)
        .drop("_copy")
        .repartition(spark.sparkContext.defaultParallelism)
    )


def replicated_docs(spark, k: int):
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    copies = spark.range(k).withColumnRenamed("id", "_copy")
    return (
        docs.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") + F.col("_copy") * 10_000_000).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.trim("text"), r"\s+"),
                    lambda t: F.concat(t, F.lit("_"), F.col("_copy")),
                ),
                " ",
            ).alias("text"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 5, 20, 100]
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for k in ks:
        df = replicated(spark, k).persist()
        n_rows = df.count()  # also warms the replicate
        t0 = time.monotonic()
        n_flags = rule_flags(
            df, ["user_id"], "ts", "value",
            DetectorConfig(eval_ts="2024-02-01"), emit="latest",
        ).count()
        t_rules = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        n_stl = stl_iqr_detect(df, ["user_id"], "ts", "value").count()
        t_stl = round(time.monotonic() - t0, 2)

        # Holt smoothing: sequential per-series state via applyInPandas
        # — wall time should track ROWS (python loop per series),
        # another probe of the Arrow-batched engine shape
        from anomaly_detection_spark.detect.robust import holt_smoothing
        t0 = time.monotonic()
        n_holt = holt_smoothing(df, ["user_id"], ["ts", "event_id"]).count()
        t_holt = round(time.monotonic() - t0, 2)
        df.unpersist()

        from anomaly_detection_spark.pipeline.dedup import minhash_exact_near_duplicates
        docs = replicated_docs(spark, k).persist()
        n_docs = docs.count()
        t0 = time.monotonic()
        n_pairs = minhash_exact_near_duplicates(
            docs, "text", "doc_id", jaccard_threshold=0.5
        ).count()
        t_minhash = round(time.monotonic() - t0, 2)

        from anomaly_detection_spark.pipeline.decontaminate import (
            eval_ngram_set, ngram_contamination,
        )
        # eval slice stays FIXED-SIZE as K grows (benchmarks don't scale
        # with the corpus) — the probe measures the broadcast-join path
        eval_set = docs.where(F.col("doc_id") % 10_000_000 % 20 == 0).where(
            F.col("doc_id") < 10_000_000
        )
        t0 = time.monotonic()
        n_contam = ngram_contamination(
            docs, eval_ngram_set(eval_set, "text", 3), "text", "doc_id", n=3
        ).where(F.col("contaminated")).count()
        t_decontam = round(time.monotonic() - t0, 2)

        # curation chain: PII scrub -> quality features + classifier ->
        # exact dedup -> hash split.  Map-only except the digest
        # aggregation and one split projection: the linear-throughput
        # backbone of a corpus job (near-dedup measured separately above)
        from anomaly_detection_spark.pipeline.dedup import exact_dedup
        from anomaly_detection_spark.pipeline.decontaminate import hash_split
        from anomaly_detection_spark.pipeline.redact import redact_pii
        from anomaly_detection_spark.pipeline.text import (
            quality_classifier, repetition_stats, text_stats,
        )
        t0 = time.monotonic()
        cur = redact_pii(docs, "text", "text")
        cur = quality_classifier(repetition_stats(text_stats(cur), ngram_n=2))
        cur = cur.where(
            (F.col("n_tokens") >= 5) & (F.col("quality_score") >= 0.1)
        )
        cur = hash_split(exact_dedup(cur, "text", "doc_id"), "doc_id")
        n_curated = cur.count()
        t_curate = round(time.monotonic() - t0, 2)

        # edit-distance near-dup: candidate volume must track prefix-dup
        # density (the token-suffix replication keeps copies' prefixes
        # distinct, so pairs stay ~linear in K), never n².
        from anomaly_detection_spark.pipeline.editdist import (
            edit_distance_near_duplicates,
        )
        t0 = time.monotonic()
        n_ed_pairs = edit_distance_near_duplicates(docs).count()
        t_editdist = round(time.monotonic() - t0, 2)

        # SimHash Hamming dedup: replicas' token spaces are disjoint so
        # fingerprints are quasi-random across copies — candidate volume
        # must track in-copy duplicate density, not n²
        from anomaly_detection_spark.pipeline.dedup import (
            simhash_hamming_pairs,
        )
        t0 = time.monotonic()
        n_ham = simhash_hamming_pairs(docs, radius=3, bits=48).count()
        t_hamming = round(time.monotonic() - t0, 2)

        # novelty curve: gram-keyed window min — disjoint replica grams
        # keep per-gram partitions bounded, so the pass stays linear
        from anomaly_detection_spark.queries import q_novelty_curve  # noqa: F401
        from pyspark.sql.window import Window
        toks = docs.select(
            "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
        )
        nsz = F.size("toks")
        grams = toks.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(nsz - 3, F.lit(0)) + 1),
                    lambda i: F.array_join(F.slice("toks", i, 3), " "),
                )
            ).alias("gram"),
        ).distinct()
        t0 = time.monotonic()
        wg = Window.partitionBy("gram")
        n_novel_docs = (
            grams.withColumn("first_doc", F.min("doc_id").over(wg))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .count()
        )
        t_novelty = round(time.monotonic() - t0, 2)

        # BM25: one doc-keyed shuffle regardless of K; the query terms
        # exist only in copy 0 (token suffixes), so tf rows stay fixed
        # while the corpus grows — the probe measures the corpus-sized
        # tokenize+aggregate backbone
        from anomaly_detection_spark.pipeline.retrieval import bm25_topk
        t0 = time.monotonic()
        n_bm25 = bm25_topk(
            docs, ["hash_0", "merge_0", "window_0"], k=10
        ).count()
        t_bm25 = round(time.monotonic() - t0, 2)

        # duplicated spans: replica token-suffixing makes copies' char
        # spans distinct, so span groups track in-copy duplicate
        # density — the rollup must stay linear in K
        from anomaly_detection_spark.pipeline.dedup import duplicated_spans
        t0 = time.monotonic()
        n_spans = duplicated_spans(docs, span_chars=40, stride=10).count()
        t_spans = round(time.monotonic() - t0, 2)
        docs.unpersist()
        print(json.dumps({
            "k": k, "rows": n_rows, "series": n_flags,
            "rules_sec": t_rules, "stl_sec": t_stl,
            "stl_series_per_sec": round(n_stl / t_stl, 1),
            "docs": n_docs, "dup_pairs": n_pairs,
            "minhash_sec": t_minhash,
            "contaminated": n_contam, "decontam_sec": t_decontam,
            "curated": n_curated, "curate_sec": t_curate,
            "curate_docs_per_sec": round(n_docs / t_curate, 1),
            "editdist_pairs": n_ed_pairs, "editdist_sec": t_editdist,
            "holt_sec": t_holt, "holt_rows": n_holt,
            "hamming_pairs": n_ham, "hamming_sec": t_hamming,
            "novelty_docs": n_novel_docs, "novelty_sec": t_novelty,
            "bm25_hits": n_bm25, "bm25_sec": t_bm25,
            "dup_spans": n_spans, "dup_span_sec": t_spans,
        }), flush=True)


if __name__ == "__main__":
    main()

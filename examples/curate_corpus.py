#!/usr/bin/env python
"""End-to-end training-corpus curation — the LLM-data-pipeline
operators composed the way a pretraining data job would chain them:

1. PII scrubbing (map-only regex redaction)
2. exact dedup (content-digest groups)
3. near-dedup (MinHash + LSH candidates, greedy drop)
4. quality filtering (length/stopword stats + Gopher repetition
   metrics + unigram-LM bits-per-token + classifier score)
5. benchmark decontamination (word-3-gram overlap vs a held-out
   eval set)
6. deterministic train/val/test split (portable md5 hash)
7. release data card (per-source/lang profile of the final corpus)
8. language-mixture draw (largest-remainder quotas, md5 order)
9. epoch shuffle-and-shard of the train split (deterministic global
   permutation, one window per shard)

Every stage is the scale-shaped variant: digest-only shuffles,
bucketed LSH candidates (not n²), map-only quality metrics, a
broadcast eval-gram join, and a shuffle-free hash split.

    python examples/curate_corpus.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from anomaly_detection_spark.pipeline.decontaminate import (
    eval_ngram_set, hash_split, ngram_contamination,
)
from anomaly_detection_spark.pipeline.dedup import drop_near_duplicates, exact_dedup
from anomaly_detection_spark.pipeline.redact import redact_pii
from anomaly_detection_spark.pipeline.text import (
    quality_classifier, repetition_stats, text_stats, unigram_logprob,
)
from anomaly_detection_spark.session import get_spark
from anomaly_detection_spark.sources.tables import load_table


def curate(spark, sf_dir: str):
    docs = load_table(spark, "documents", sf_dir)
    n0 = docs.count()

    # 1: scrub PII in place (map-only; fuses into the scan projection)
    docs = redact_pii(docs, "text", "text")

    # 2-3: exact then near dedup
    docs = exact_dedup(docs, "text", "doc_id")
    n1 = docs.count()
    docs = drop_near_duplicates(docs, "text", "doc_id", jaccard_threshold=0.8)
    n2 = docs.count()

    # 4: quality gates — all map-only except the unigram vocab fit
    docs = quality_classifier(repetition_stats(text_stats(docs), ngram_n=2))
    lm = unigram_logprob(docs, "text", "doc_id").select(
        "doc_id", "bits_per_token"
    )
    docs = docs.join(lm, "doc_id")
    docs = docs.where(
        (F.col("n_tokens") >= 5)
        & (F.col("dup_token_frac") <= 0.99)
        & (F.col("top_ngram_frac") <= 0.9)
        & (F.col("bits_per_token") <= 12.0)
        & (F.col("quality_score") >= 0.2)
    )
    n3 = docs.count()

    # 5: decontaminate against the held-out eval slice
    eval_set = load_table(spark, "documents", sf_dir).where(
        F.col("doc_id") % 20 == 0
    )
    report = ngram_contamination(
        docs, eval_ngram_set(eval_set, "text", 3), "text", "doc_id",
        n=3, contaminated_threshold=0.8,
    )
    clean_ids = report.where(~F.col("contaminated")).select("doc_id")
    docs = docs.join(clean_ids, "doc_id", "left_semi")
    n4 = docs.count()

    # 6: reproducible split
    docs = hash_split(docs, "doc_id")
    mix = {
        r["split"]: r["n"]
        for r in docs.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    # 7: release data card for the surviving corpus
    card = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    data_card = [tuple(r) for r in card.orderBy("source", "lang").collect()]

    # 8: draw the training mixture (40/20/15/15/10 across langs)
    from anomaly_detection_spark.pipeline.mixture import weighted_mixture_sample

    train = docs.where(F.col("split") == "train")
    n_train = train.count()
    drawn = weighted_mixture_sample(
        train,
        parts={"en": 400, "zh": 200, "de": 150, "fr": 150, "es": 100},
        total_n=min(200, n_train), denom=1000,
    )
    mix_card = {
        r["domain"]: r["n"]
        for r in drawn.groupBy("domain").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    # 9: epoch shuffle-and-shard: uniform md5 shard + independent md5
    # intra-shard order; repartition+sortWithinPartitions writes it
    from pyspark.sql.window import Window

    def md5_int(salt):
        return F.conv(F.substring(
            F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))
                  .cast("binary")), 1, 15), 16, 10).cast("bigint")

    sharded = train.join(drawn.select("doc_id"), "doc_id", "left_semi").select(
        "doc_id",
        F.pmod(md5_int("shard:"), F.lit(4)).cast("int").alias("shard_id"),
        md5_int("order:").alias("_h"),
    )
    w = Window.partitionBy("shard_id").orderBy("_h", "doc_id")
    sharded = sharded.withColumn("pos", F.row_number().over(w)).drop("_h")
    shard_sizes = {
        r["shard_id"]: r["n"]
        for r in sharded.groupBy("shard_id").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    return {
        "input": n0, "after_exact_dedup": n1, "after_near_dedup": n2,
        "after_quality": n3, "after_decontamination": n4, "splits": mix,
        "data_card": data_card, "mixture": mix_card,
        "shard_sizes": shard_sizes,
    }


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("curate-corpus", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    funnel = curate(spark, sf_dir)
    for k, v in funnel.items():
        print(f"{k}: {v}")

"""Unit tests for the decontamination / deterministic-split operators
(pipeline/decontaminate.py) and the portable SimHash construction —
semantic properties beyond the registry's oracle-differential coverage.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from anomaly_detection_spark.pipeline.decontaminate import (
    eval_ngram_set,
    hash_split,
    ngram_contamination,
    portable_hash_bucket,
)
from anomaly_detection_spark.pipeline.dedup import simhash_portable
from anomaly_detection_spark.sources.tables import load_table


def test_ngram_contamination_counts_known_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "a b c d e"),        # grams: abc bcd cde → 2 overlap
            (2, "x y z w v"),        # no overlap
            (3, "a b c a b c a"),    # distinct grams: abc bca cab → 1 overlap
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame([(99, "a b c d q b c d e")], ["doc_id", "text"])
    grams = eval_ngram_set(eval_df, "text", n=3)
    out = {
        r["doc_id"]: r
        for r in ngram_contamination(
            train, grams, "text", "doc_id", n=3, contaminated_threshold=0.5
        ).collect()
    }
    # eval grams: {a b c, b c d, c d q, d q b, q b c, b c d, c d e}
    assert out[1]["n_grams"] == 3 and out[1]["n_overlap"] == 3  # abc bcd cde
    assert out[1]["contaminated"]
    assert out[2]["n_overlap"] == 0 and not out[2]["contaminated"]
    assert out[3]["n_overlap"] == 1  # only 'a b c'


def test_ngram_contamination_reports_zero_overlap_docs(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    eval_set = docs.where(F.col("doc_id") % 20 == 0)
    train = docs.where(F.col("doc_id") % 20 != 0)
    out = ngram_contamination(
        train, eval_ngram_set(eval_set, "text"), "text", "doc_id"
    )
    assert out.count() == train.count()  # every train doc gets a row


def test_portable_hash_bucket_matches_python_md5(spark):
    df = spark.range(50).select(
        F.col("id"), portable_hash_bucket(F.col("id"), 100, "split:").alias("b")
    )
    for r in df.collect():
        expect = int(
            hashlib.md5(f"split:{r['id']}".encode()).hexdigest()[:15], 16
        ) % 100
        assert r["b"] == expect


def test_hash_split_partition_properties(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    out = hash_split(docs, "doc_id")
    n = docs.count()
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == n  # total partition, no drops
    # deterministic: same assignment on recompute and under repartitioning
    again = hash_split(docs.repartition(7), "doc_id")
    assert (
        out.select("doc_id", "split")
        .exceptAll(again.select("doc_id", "split"))
        .count() == 0
    )
    # roughly proportional (md5 uniformity; wide tolerance for small n)
    assert counts.get("train", 0) > counts.get("val", 0)
    assert counts.get("train", 0) > counts.get("test", 0)


def test_hash_split_append_safety(spark, sf_dir):
    """New rows never change existing assignments (content-hash, not
    position or random)."""
    docs = load_table(spark, "documents", sf_dir)
    half = docs.where(F.col("doc_id") % 2 == 0)
    full_assign = hash_split(docs, "doc_id").select("doc_id", "split")
    half_assign = hash_split(half, "doc_id").select("doc_id", "split")
    joined = half_assign.alias("h").join(
        full_assign.alias("f"), "doc_id"
    ).where(F.col("h.split") != F.col("f.split"))
    assert joined.count() == 0


def _py_simhash(text: str, bits: int = 16, n: int = 2) -> int:
    toks = text.strip().split()
    k = max(len(toks) - n + 1, 1)
    grams = [" ".join(toks[i:i + n]) for i in range(k)]
    n_hex = (bits + 3) // 4
    vals = [int(hashlib.md5(g.encode()).hexdigest()[:n_hex], 16) for g in grams]
    fp = 0
    for b in range(bits):
        ones = sum(1 for v in vals if (v >> b) & 1)
        if 2 * ones >= len(vals):
            fp += 1 << b
    return fp


def test_simhash_portable_matches_python_reference(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "single"),
        (3, "a a a a a a"),
        (4, "x y x y x y z"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["sh"]
        for r in df.select(
            "doc_id", simhash_portable(F.col("text"), bits=16).alias("sh")
        ).collect()
    }
    for doc_id, text in texts:
        assert out[doc_id] == _py_simhash(text), text


def test_simhash_portable_near_dup_locality(spark):
    """One-word edit flips few bits; unrelated text flips many."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    far = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["doc_id", "text"]
    )
    fp = {
        r["doc_id"]: r["sh"]
        for r in df.select(
            "doc_id", simhash_portable(F.col("text"), bits=16).alias("sh")
        ).collect()
    }
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(fp[1], fp[2]) < ham(fp[1], fp[3])


def test_repetition_stats_known_values(spark):
    from anomaly_detection_spark.pipeline.text import repetition_stats
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # toks 6, distinct 2; bigrams: ab ba ab ba ab → 'a b'×3 of 5
            (2, "u v w x y z"),      # all distinct; every bigram unique
            (3, "q q q q"),          # fully repeated
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_stats(df, "text", 2).collect()}
    assert out[1]["dup_token_frac"] == round(1 - 2 / 6, 4)
    assert out[1]["top_ngram_frac"] == 0.6          # 3 of 5 bigrams
    assert out[2]["dup_token_frac"] == 0.0
    assert out[2]["top_ngram_frac"] == 0.2          # 1 of 5
    assert out[3]["dup_token_frac"] == 0.75
    assert out[3]["top_ngram_frac"] == 1.0


def test_unigram_logprob_orders_docs_by_rarity(spark):
    from anomaly_detection_spark.pipeline.text import unigram_logprob
    import math
    # corpus: 'common' appears 8x, 'rare' 1x, 'alt' 1x
    df = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "common common common rare"),
            (3, "common alt"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in unigram_logprob(df, "text", "doc_id").collect()}
    assert out[1]["n_tokens"] == 4
    # doc1 is all-common -> lowest bits; doc3 has the rarest mix -> highest
    assert out[1]["bits_per_token"] < out[2]["bits_per_token"] < out[3]["bits_per_token"]
    # exact check for doc1: every token p = 8/10
    expect = round(-math.log2(8 / 10), 4)
    assert abs(out[1]["bits_per_token"] - expect) < 5e-4


def test_unigram_logprob_external_vocab(spark):
    """Scoring against a held-out model ignores the scored df's own counts."""
    from anomaly_detection_spark.pipeline.text import unigram_logprob
    import math
    from pyspark.sql import functions as F
    vocab = spark.createDataFrame(
        [("w", 1, 4), ("x", 3, 4)], ["w", "c", "t"]
    )
    df = spark.createDataFrame([(1, "w w w w")], ["doc_id", "text"])
    out = unigram_logprob(df, "text", "doc_id", vocab=vocab).collect()[0]
    assert out["bits_per_token"] == round(-math.log2(1 / 4), 4)

#!/usr/bin/env python
"""Measure the PPJoin bitset-vs-prefix-stack crossover (ADVICE r5).

The adaptive gate in ``queries.py:q_ppjoin_jaccard_pairs`` picks the
broadcast nested-loop BITSET verify while ``n_sets^2 * ceil(vocab/64)``
word-ANDs stay under ``PPJOIN_BITSET_BUDGET``; past it, the Xiao
prefix/length/positional stack runs.  This probe times BOTH paths on
natural Heaps-law corpora (Zipf head + growing rare tail — selective
prefixes, the regime real corpora live in) at gate-work values spanning
the budget, printing one row per (n_docs, vocab) point so the budget
can be set at the empirical crossover instead of a guess.

Run:  python scripts/ppjoin_crossover_probe.py
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anomaly_detection_spark.session import get_spark  # noqa: E402
from anomaly_detection_spark import queries as reg  # noqa: E402


def heaps_corpus(n_docs: int, vocab_common: int, seed: int = 42):
    rng = random.Random(seed)
    common = [f"w{i:05d}" for i in range(vocab_common)]
    weights = [1.0 / (i + 1) for i in range(vocab_common)]
    docs = []
    for i in range(n_docs):
        words = rng.choices(common, weights=weights, k=25)
        words += [f"r{(i * 3 + j) % (vocab_common // 2 + n_docs):06d}"
                  for j in range(5)]
        rng.shuffle(words)
        docs.append((i, " ".join(words), "en", 0, "syn"))
        if i % 9 == 0:
            docs.append((10 ** 6 + i, " ".join(words[:-2]), "en", 0, "syn"))
    return docs


def main() -> None:
    spark = get_spark("ppjoin-probe", cpus=int(os.environ.get("CPUS", "8")),
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    points = [
        # (n_docs, zipf-head vocab)
        (1000, 500),
        (3000, 1000),
        (6000, 2000),
        (10000, 3000),
        (16000, 4000),
    ]
    print(f"{'docs':>6} {'vocab':>7} {'n_sets':>7} {'W':>4} "
          f"{'gate_work':>12} {'bitset_s':>9} {'xiao_s':>8} winner")
    for n_docs, vocab_common in points:
        d = tempfile.mkdtemp(prefix="ppjoin_probe_")
        try:
            docs = heaps_corpus(n_docs, vocab_common)
            import pyarrow as pa
            import pyarrow.parquet as pq
            t = spark.createDataFrame(
                docs, "doc_id long, text string, lang string, "
                      "n_chars long, source string")
            pq.write_table(pa.Table.from_pandas(t.toPandas()),
                           os.path.join(d, "documents.parquet"))

            # true gate stats (distinct sets, true vocab incl. rare tail)
            from pyspark.sql import functions as F
            toks = t.select(
                "doc_id",
                F.array_sort(F.array_distinct(
                    F.split(F.trim("text"), r"\s+"))).alias("toks"))
            sets = toks.select(
                F.md5(F.concat_ws(" ", "toks")).alias("g"), "toks"
            ).dropDuplicates(["g"])
            n_sets = sets.count()
            vocab = sets.select(F.explode("toks")).distinct().count()
            W = (vocab + 63) // 64
            work = n_sets * n_sets * W

            times = {}
            for label, budget in (("bitset", 10 ** 18), ("xiao", 0)):
                reg.PPJOIN_BITSET_BUDGET = budget
                best = float("inf")
                for _ in range(2):
                    t0 = time.monotonic()
                    reg.QUERIES["ppjoin_jaccard_pairs"](spark, d).count()
                    best = min(best, time.monotonic() - t0)
                    spark.catalog.clearCache()
                times[label] = best
            reg.PPJOIN_BITSET_BUDGET = 4_000_000_000
            winner = "bitset" if times["bitset"] <= times["xiao"] else "xiao"
            print(f"{n_docs:>6} {vocab:>7} {n_sets:>7} {W:>4} "
                  f"{work:>12} {times['bitset']:>9.2f} "
                  f"{times['xiao']:>8.2f} {winner}", flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()

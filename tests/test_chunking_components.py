"""Chunking edge cases + connected-components vs union-find oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomaly_detection_spark.pipeline.chunking import chunk_documents
from anomaly_detection_spark.pipeline.components import connected_components
from anomaly_detection_spark.pipeline.dedup import minhash_near_duplicates
from anomaly_detection_spark.sources.tables import load_table


def test_chunking_covers_every_token(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    chunks = chunk_documents(docs, chunk_tokens=20, stride_tokens=15)
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("chunk_start").alias("last_start"),
        F.first("n_tokens").alias("n_tokens"),
    )
    bad = per_doc.where(
        # chunk starts advance by stride until they pass the last token
        (F.col("last_start") + 15 < F.col("n_tokens"))
        | (F.col("last_start") >= F.col("n_tokens"))
        | (F.col("n_chunks") != (F.col("last_start") / 15 + 1))
    ).count()
    assert bad == 0


def test_chunking_single_short_doc(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    rows = chunk_documents(docs, chunk_tokens=10, stride_tokens=5).collect()
    assert len(rows) == 1
    assert rows[0].chunk_text == "a b c"
    assert rows[0].n_tokens == 3 and rows[0].chunk_id == 0


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member id of each component
    members: dict[int, list] = {}
    for n in parent:
        members.setdefault(find(n), []).append(n)
    return {n: min(ms) for ms in members.values() for n in ms}


def test_components_chain_cycle_isolated_pair(spark):
    # chain 1-2-3-4, cycle 10-11-12-10, pair 20-21
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(e).collect()}
    assert got == _union_find(edges)


def test_components_match_union_find_on_minhash_pairs(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    pairs = minhash_near_duplicates(docs, "text", "doc_id")
    edges = [(r.id_a, r.id_b) for r in pairs.collect()]
    got = {
        r.node: r.component
        for r in connected_components(pairs, src="id_a", dst="id_b").collect()
    }
    assert got == _union_find(edges)


def test_dedup_keep_best_planted_families(spark):
    from anomaly_detection_spark.pipeline.components import dedup_keep_best

    # family A = {1,2,3} (chain), family B = {10,11}; 20 is isolated
    docs = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 70), (10, 40), (11, 40), (20, 99)],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    removed = {
        r.doc_id: (r.component, r.kept_doc_id, r.kept_n_chars)
        for r in dedup_keep_best(docs, pairs).collect()
    }
    # A keeps 2 (highest n_chars); B ties at 40 -> keeps lower id 10;
    # isolated 20 never emitted
    assert removed == {
        1: (1, 2, 90),
        3: (1, 2, 90),
        11: (10, 10, 40),
    }

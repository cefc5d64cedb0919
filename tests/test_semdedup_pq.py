"""Semantic tests for cluster-scoped semantic dedup and PQ/ADC ANN
(the oracle differential pins cross-engine agreement; these pin the
algorithms' guarantees on planted data)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.pipeline.similarity import (
    pq_codebooks_from_rows, pq_encode, pq_topk, semantic_dedup,
)
from anomaly_detection_spark.sources.tables import load_table


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_removes_planted_copies(spark):
    base = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (3, [0.9, 0.1, 0.0, 0.0]),   # near 0, same cluster as 0
    ]
    copies = [(vid + 100, emb) for vid, emb in base]
    corpus = _vecs(spark, base + copies)
    centroids = corpus.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    # 0.999: only exact copies qualify (cos(v0, v3) = 0.994 stays kept)
    out = semantic_dedup(corpus, centroids, cosine_threshold=0.999)
    removed = {r["vec_id"]: r["kept_id"] for r in out.collect()}
    # every copy is removed, kept by its original; nothing else removed
    assert removed == {vid + 100: vid for vid, _ in base}


def test_semantic_dedup_is_cluster_scoped(spark):
    # two identical vectors, but centroids chosen so they CANNOT land in
    # the same cluster (each is itself a centroid): cluster scoping means
    # the cross-cluster duplicate is intentionally invisible
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        # 10 is a near-copy of 0, but nearest centroid is still 0's
        (10, [0.999, 0.001]),
    ]
    corpus = _vecs(spark, rows)
    centroids = corpus.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    out = semantic_dedup(corpus, centroids, cosine_threshold=0.99)
    removed = {r["vec_id"]: r["kept_id"] for r in out.collect()}
    assert removed == {10: 0}


def test_pq_encode_shape_and_range(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    books = pq_codebooks_from_rows(emb, n_codes=16, n_subspaces=8)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8
    enc = pq_encode(emb, books).select("vec_id", "pq_code").collect()
    for r in enc:
        assert len(r["pq_code"]) == 8
        assert all(0 <= c < 16 for c in r["pq_code"])


def test_pq_training_rows_encode_to_themselves(spark, sf_dir):
    # a codebook training row's subspace slice IS codeword c, so its
    # encode must pick code c in every subspace (distance 0, tie->low c
    # can only fire if two training rows share a slice — they don't)
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    books = pq_codebooks_from_rows(emb, n_codes=16, n_subspaces=8)
    enc = (
        pq_encode(emb.where(F.col("vec_id") < 16), books)
        .select("vec_id", "pq_code")
        .collect()
    )
    for r in enc:
        assert list(r["pq_code"]) == [r["vec_id"]] * 8, r


def test_pq_adc_self_distance_zero_rank1(spark, sf_dir):
    # queries drawn from the corpus: ADC(q, q) sums q's own LUT entries
    # at q's own codes = exact encode distances >= 0; the query's copy of
    # itself must outrank everything whose codes differ more
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    books = pq_codebooks_from_rows(emb, n_codes=16, n_subspaces=8)
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq_topk(emb, q, books, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert len(rows) == 5
        # training rows 0..2 encode to themselves -> ADC self-distance 0
        assert rows[0]["vec_id"] == qid and rows[0]["adc_dist"] == 0.0


def test_pq_topk_single_exchange(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    books = pq_codebooks_from_rows(emb, n_codes=16, n_subspaces=8)
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = (
        pq_topk(emb, q, books, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # corpus encode is map-only; the only exchange is the top-k window
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_semantic_dedup_no_cartesian(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    plan = (
        semantic_dedup(emb, centroids)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the pair step must be a cluster-keyed equi join, never a cartesian
    # (the broadcast centroid scoring is the only nested-loop, and it is
    # a BROADCAST NLJ over K rows, not a fact-fact cartesian)
    assert "CartesianProduct" not in plan, plan


def test_index_persistence_roundtrip(spark, sf_dir, tmp_path):
    """Build-once/reuse: topk over a LOADED index must equal topk over
    the freshly built one bit-for-bit, across IVF and PQ; versions are
    append-only and the catalog records params."""
    import pyspark.sql.functions as F

    from anomaly_detection_spark.pipeline.index_io import (
        index_catalog, load_ivf_centroids, load_pq_codebooks,
        save_ivf_centroids, save_pq_codebooks,
    )
    from anomaly_detection_spark.pipeline.similarity import (
        ivf_index, ivf_topk, pq_codebooks_from_rows, pq_topk,
    )

    path = str(tmp_path / "indexes")
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    # IVF: persist centroids, reload, expect identical results
    indexed, centroids = ivf_index(emb, n_clusters=8)
    v1 = save_ivf_centroids(spark, path, centroids, {"n_clusters": 8})
    loaded = load_ivf_centroids(spark, path)
    assert loaded == [[float(x) for x in c] for c in centroids]
    fresh = ivf_topk(emb, q, k=5, n_clusters=8, centroids=centroids)
    reused = ivf_topk(emb, q, k=5, n_clusters=8, centroids=loaded)
    assert sorted(map(tuple, fresh.collect())) == \
        sorted(map(tuple, reused.collect()))

    # PQ: same contract
    books = pq_codebooks_from_rows(emb, n_codes=16, n_subspaces=8)
    save_pq_codebooks(spark, path, books, {"n_subspaces": 8})
    books2 = load_pq_codebooks(spark, path)
    assert books2 == books
    f = pq_topk(emb, q, books, k=3)
    r = pq_topk(emb, q, books2, k=3)
    assert sorted(map(tuple, f.collect())) == sorted(map(tuple, r.collect()))

    # versioning appends; catalog sees both kinds
    v2 = save_ivf_centroids(spark, path, centroids, {"n_clusters": 8})
    assert v2 == v1 + 1
    cat = {(r.kind, r.v) for r in index_catalog(spark, path).collect()}
    assert ("ivf_centroids", 1) in cat and ("ivf_centroids", 2) in cat
    assert ("pq_codebooks", 1) in cat

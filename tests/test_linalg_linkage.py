"""Unit tests for the distributed linear-algebra operators
(pipeline/linalg.py) and the round-3 graph/linkage queries.

The oracle-differential suite (test_oracle_parity.py) already covers
engine parity for the oracle-paired queries; these tests pin the
*numerical semantics* — Gram/PCA against single-machine numpy, the
PageRank mass invariant, and blocking completeness for record linkage.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark import queries as reg
from anomaly_detection_spark.pipeline.linalg import (
    FP_SCALE, gram_matrix_fp, pca_project,
)
from anomaly_detection_spark.sources.tables import load_table


def _vectors(spark, sf_dir):
    rows = (
        load_table(spark, "embeddings", sf_dir)
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    ids = [r["vec_id"] for r in rows]
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


def test_gram_matrix_matches_numpy(spark, sf_dir):
    _, mat = _vectors(spark, sf_dir)
    snapped = np.floor(mat * FP_SCALE + 0.5).astype(np.int64)
    expected = snapped.T @ snapped
    emb = load_table(spark, "embeddings", sf_dir)
    got = gram_matrix_fp(emb, "embedding", 64).collect()
    assert len(got) == 64 * 65 // 2
    for row in got:
        assert row["gram_fp"] == expected[row["i"], row["j"]], (
            row["i"], row["j"])


def test_gram_partitioning_invariance(spark, sf_dir):
    """Partition layout must not change a single exact-integer entry."""
    emb = load_table(spark, "embeddings", sf_dir)
    a = {(r["i"], r["j"]): r["gram_fp"]
         for r in gram_matrix_fp(emb, "embedding", 64).collect()}
    b = {(r["i"], r["j"]): r["gram_fp"]
         for r in gram_matrix_fp(
             emb.repartition(7), "embedding", 64).collect()}
    assert a == b


def test_pca_matches_single_machine(spark, sf_dir):
    ids, mat = _vectors(spark, sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    got = {r["vec_id"]: (r["pc1"], r["pc2"])
           for r in pca_project(emb, "embedding", "vec_id", 64, k=2)
           .collect()}

    # single-machine reference on the same fixed-point grid
    snapped = np.floor(mat * FP_SCALE + 0.5) / FP_SCALE
    mean = snapped.mean(axis=0)
    n = snapped.shape[0]
    cov = (snapped.T @ snapped) / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    comps = vecs[:, np.argsort(vals)[::-1][:2]]
    for c in range(2):
        pivot = np.argmax(np.abs(comps[:, c]))
        if comps[pivot, c] < 0:
            comps[:, c] = -comps[:, c]
    proj = (mat - mean) @ comps
    for vid, row in zip(ids, proj):
        assert got[vid][0] == pytest.approx(row[0], abs=2e-3)
        assert got[vid][1] == pytest.approx(row[1], abs=2e-3)


def test_pagerank_mass_conserved(spark, sf_dir):
    ranks = reg.QUERIES["pagerank_dup_graph"](spark, sf_dir).collect()
    if not ranks:  # no near-dup edges at this SF — nothing to check
        return
    total = sum(r["rank_fp"] for r in ranks)
    # 1e12 units minus bounded floor leak (≤ ~1 unit per node per term)
    assert 0.95e12 < total <= 1.000001e12
    assert all(r["rank_fp"] > 0 for r in ranks)


def test_record_linkage_blocking_complete(spark, sf_dir):
    """Token-blocking must find every distinct-name pair with lev<=4
    that shares a token (brute-force check on the name dictionary)."""
    part = load_table(spark, "part", sf_dir)
    names = sorted(
        r["p_name"]
        for r in part.select("p_name").distinct().collect()
    )
    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    expected = set()
    for i, a in enumerate(names):
        ta = set(a.split())
        for b in names[i + 1:]:
            if ta & set(b.split()) and lev(a, b) <= 4:
                expected.add((a, b))

    got = {
        (r["name_a"], r["name_b"])
        for r in reg.QUERIES["record_linkage_parts"](spark, sf_dir)
        .collect()
    }
    assert got == expected


def test_rolling_slope_matches_polyfit(spark, sf_dir):
    out = reg.QUERIES["rolling_slope_events"](spark, sf_dir)
    one = out.orderBy("user_id", "event_id").limit(0)  # schema check only
    assert one.columns == ["user_id", "event_id", "slope_num_fp", "slope"]

    ev = load_table(spark, "events", sf_dir)
    uid = ev.groupBy("user_id").count().where(F.col("count") >= 7) \
        .orderBy("user_id").first()["user_id"]
    rows = (
        ev.where(F.col("user_id") == uid)
        .orderBy("ts", "event_id")
        .select("event_id", "value")
        .collect()
    )
    got = {
        r["event_id"]: r["slope"]
        for r in out.where(F.col("user_id") == uid).collect()
    }
    q = [round(r["value"] * 10000) / 10000 for r in rows]
    for end in range(6, len(rows)):
        window = q[end - 6:end + 1]
        slope = np.polyfit(np.arange(7), window, 1)[0]
        assert got[rows[end]["event_id"]] == pytest.approx(slope, abs=1e-5)

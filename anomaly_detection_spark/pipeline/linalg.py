"""Distributed dense linear algebra over embedding columns.

The scale pattern here is *mergeable partial sums*: each Arrow batch
contributes a dim x dim integer Gram block computed with one numpy
matmul, partitions emit upper-triangle triplets, and one
map-side-combined groupBy produces the global matrix.  Driver traffic
is O(dim^2) regardless of row count — the same shape a 1000-executor
cluster needs (no collect of vectors, no per-row Python).

All arithmetic is integer fixed-point: vectors are snapped to the
10^-6 grid with floor(x*1e6 + 0.5) (identical in numpy, Spark SQL and
DuckDB), so Gram entries are exact BIGINTs and cross-engine results
are bit-identical — no float summation order anywhere.

Reference parity: the reference engine has no linear-algebra surface
(it is an R + BigQuery SQL anomaly pipeline, anomaly_proj_query.sql);
this module is part of the LLM-data-pipeline extension the port brief
calls for (embedding analytics feeding SemDeDup/IVF in similarity.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FP_SCALE = 1_000_000


def _snap(arr: np.ndarray) -> np.ndarray:
    """floor(x*1e6 + 0.5) — the shared cross-engine grid snap.

    The embedding column is array<float>; promote to float64 FIRST
    (exact) so the scale multiply runs in double precision exactly as
    SQL engines compute CAST(x AS DOUBLE) * 1e6 — scaling in float32
    would land some values on the other side of the floor boundary.
    """
    return np.floor(arr.astype(np.float64) * FP_SCALE + 0.5).astype(np.int64)


def gram_matrix_fp(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Upper-triangle X^T X in integer fixed-point.

    Returns (i, j, gram_fp) with 0 <= i <= j < dim; gram_fp is the
    exact BIGINT sum of snapped products.  One mapInPandas pass (each
    partition folds all its batches into a single int64 matrix before
    emitting dim*(dim+1)/2 triplets) + one aggregation.
    """
    iu = np.triu_indices(dim)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            m = _snap(np.stack(pdf[vec_col].to_numpy()))
            acc += m.T @ m
            seen = True
        if seen:
            yield pd.DataFrame(
                {"i": iu[0].astype("int32"), "j": iu[1].astype("int32"),
                 "s": acc[iu]}
            )

    parts = df.select(vec_col).mapInPandas(part, "i int, j int, s long")
    return parts.groupBy("i", "j").agg(F.sum("s").alias("gram_fp"))


def column_sums_fp(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Per-dimension sums (i, sum_fp) on the same fixed-point grid."""

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros(dim, dtype=np.int64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            acc += _snap(np.stack(pdf[vec_col].to_numpy())).sum(axis=0)
            n += len(pdf)
        if n:
            out = pd.DataFrame({"i": np.arange(dim, dtype="int32"),
                                "sum_fp": acc})
            out["n"] = np.int64(n)
            yield out

    parts = df.select(vec_col).mapInPandas(part, "i int, sum_fp long, n long")
    return parts.groupBy("i").agg(
        F.sum("sum_fp").alias("sum_fp"), F.sum("n").alias("n")
    )


def pca_project(
    df: DataFrame, vec_col: str, id_col: str, dim: int, k: int = 2
) -> DataFrame:
    """Project vectors onto the top-k principal components.

    Covariance is assembled from the distributed Gram matrix and column
    sums (both exact-integer, collected as O(dim^2) scalars — bounded
    artifacts, not data); the dim x dim eigendecomposition runs on the
    driver (numpy, deterministic for a fixed input matrix); projection
    is a JVM-side dot product against component literals via
    F.aggregate over arrays_zip — no Python in the per-row path.

    Eigenvector sign is pinned (largest-|component| entry positive) so
    output does not depend on LAPACK sign conventions.
    """
    g = gram_matrix_fp(df, vec_col, dim).collect()
    s = column_sums_fp(df, vec_col, dim).collect()
    n = int(s[0]["n"]) if s else 0
    if n < 2:
        raise ValueError("pca_project needs at least 2 vectors")
    mean = np.zeros(dim)
    for row in s:
        mean[row["i"]] = row["sum_fp"] / FP_SCALE / n
    gram = np.zeros((dim, dim))
    for row in g:
        v = row["gram_fp"] / (FP_SCALE * FP_SCALE)
        gram[row["i"], row["j"]] = v
        gram[row["j"], row["i"]] = v
    cov = gram / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order]  # dim x k
    for c in range(comps.shape[1]):
        pivot = np.argmax(np.abs(comps[:, c]))
        if comps[pivot, c] < 0:
            comps[:, c] = -comps[:, c]

    out = df.select(id_col, vec_col)
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.lit(mean.tolist()).cast("array<double>"),
        lambda x, m: x - m,
    )
    cols = [F.col(id_col)]
    for c in range(comps.shape[1]):
        comp_lit = F.lit(comps[:, c].tolist()).cast("array<double>")
        dot = F.aggregate(
            F.zip_with(centered, comp_lit, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        cols.append(F.round(dot, 4).alias(f"pc{c + 1}"))
    return out.select(*cols)

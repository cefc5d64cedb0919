"""ANN index persistence — build once, reuse across jobs.

At 100 TB the quantizer/codebook/plane artifacts are NOT rebuilt per
query job: the KMeans fit (IVF), codebook training (PQ), and plane
seeds (LSH) happen in an infrequent index-build job; every search job
then loads the small artifacts and runs map-only assignment/probing
against them.  This module gives those artifacts a durable, versioned
parquet layout:

    <path>/kind=ivf_centroids/v=3/part-*.parquet   (cell_id, vector)
    <path>/kind=pq_codebooks/v=1/...               (subspace, code, word)
    <path>/_meta/...                               (one row per artifact
                                                    version: kind, v,
                                                    params json)

Versions are append-only (new build → v+1) so a long-running search
job keeps reading the version it pinned at start — the same reasoning
as the streaming rollup's versioned state.  Artifacts are tiny
(k·dim floats, m·256·sub ints), so the read cost is a broadcast-sized
scan; the value is REPRODUCIBILITY: topk(loaded index) must equal
topk(freshly built index) bit-for-bit, which the round-trip test pins.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _versions(spark: SparkSession, base: str) -> list[int]:
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(base)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return []
    out = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if name.startswith("v="):
            out.append(int(name[2:]))
    return sorted(out)


def save_ivf_centroids(
    spark: SparkSession,
    path: str,
    centroids: list[list[float]],
    params: dict | None = None,
) -> int:
    """Persist IVF centroids as a new version; returns the version."""
    base = f"{path}/kind=ivf_centroids"
    v = (_versions(spark, base) or [0])[-1] + 1
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    spark.createDataFrame(rows, "cell_id int, vector array<double>") \
        .coalesce(1).write.parquet(f"{base}/v={v}")
    meta = [("ivf_centroids", v, json.dumps(params or {}, sort_keys=True))]
    spark.createDataFrame(meta, "kind string, v int, params string") \
        .coalesce(1).write.mode("append").parquet(f"{path}/_meta")
    return v


def load_ivf_centroids(
    spark: SparkSession, path: str, version: int | None = None
) -> list[list[float]]:
    """Load a centroid version (default: newest), cell order restored."""
    base = f"{path}/kind=ivf_centroids"
    vs = _versions(spark, base)
    if not vs:
        raise FileNotFoundError(f"no ivf_centroids versions under {path}")
    v = version if version is not None else vs[-1]
    rows = spark.read.parquet(f"{base}/v={v}").orderBy("cell_id").collect()
    return [list(r["vector"]) for r in rows]


def save_pq_codebooks(
    spark: SparkSession,
    path: str,
    codebooks: list[list[list[int]]],
    params: dict | None = None,
) -> int:
    """Persist PQ codebooks (subspace s, code c → integer-grid word)."""
    base = f"{path}/kind=pq_codebooks"
    v = (_versions(spark, base) or [0])[-1] + 1
    rows = [
        (s, c, [int(x) for x in word])
        for s, book in enumerate(codebooks)
        for c, word in enumerate(book)
    ]
    spark.createDataFrame(
        rows, "subspace int, code int, word array<bigint>"
    ).coalesce(1).write.parquet(f"{base}/v={v}")
    meta = [("pq_codebooks", v, json.dumps(params or {}, sort_keys=True))]
    spark.createDataFrame(meta, "kind string, v int, params string") \
        .coalesce(1).write.mode("append").parquet(f"{path}/_meta")
    return v


def load_pq_codebooks(
    spark: SparkSession, path: str, version: int | None = None
) -> list[list[list[int]]]:
    base = f"{path}/kind=pq_codebooks"
    vs = _versions(spark, base)
    if not vs:
        raise FileNotFoundError(f"no pq_codebooks versions under {path}")
    v = version if version is not None else vs[-1]
    rows = spark.read.parquet(f"{base}/v={v}") \
        .orderBy("subspace", "code").collect()
    books: dict[int, list] = {}
    for r in rows:
        books.setdefault(r["subspace"], []).append(list(r["word"]))
    return [books[s] for s in sorted(books)]


def index_catalog(spark: SparkSession, path: str) -> DataFrame:
    """The _meta table: every artifact version with its params json."""
    return spark.read.parquet(f"{path}/_meta").orderBy("kind", "v")

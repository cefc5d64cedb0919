"""Similarity search over embedding columns (array<float>).

- **Brute-force cosine top-k** — exact baseline: normalize, dot
  product via ``F.zip_with`` + ``F.aggregate`` (JVM-side), window
  top-k. O(n·q) — fine for moderate corpora / the correctness oracle.
- **LSH-bucketed ANN** — random-hyperplane signs (sign-LSH) built
  from a seeded deterministic projection; candidates = same-bucket
  pairs, then exact cosine on candidates only. The scale path: the
  shuffle key is the bucket signature, so compute is proportional to
  bucket density, not n².
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    # cast elements to double BEFORE multiplying: float32 products in
    # double are exact, so the result matches engines (e.g. DuckDB)
    # that compute over DOUBLE[] arrays
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_similarity(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, vec_id, cosine, rank).

    ``queries`` is expected to be small (a probe set) → broadcast; the
    big ``vectors`` side streams map-side, and the only shuffle is the
    per-query top-k window over n_queries × k candidate rows.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = vectors.crossJoin(F.broadcast(q)).select(
        query_id_col, id_col,
        F.round(cosine_similarity(F.col(vec_col), F.col("_qvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)  # deterministic tiebreak
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def sign_lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    seed: int = 42,
    out_col: str = "bucket",
) -> DataFrame:
    """Append a sign-LSH bucket id (long) — vectors with the same
    bucket are ANN candidates. Deterministic (seeded planes baked into
    the plan as literals)."""
    planes = random_hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        sign_bit = F.when(_dot(F.col(vec_col), lit_plane) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        bucket = bucket.bitwiseOR(sign_bit.cast("long"))
    return df.withColumn(out_col, bucket)


def lsh_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket, exact cosine
    re-rank on candidates. Recall < 1 by construction; raise recall
    with fewer planes or multi-probe (future work)."""
    v = sign_lsh_buckets(vectors, vec_col, dim, n_planes, seed)
    q = sign_lsh_buckets(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec")),
        "_qvec", dim, n_planes, seed,
    )
    cand = v.join(F.broadcast(q), "bucket").select(
        query_id_col, id_col,
        F.round(cosine_similarity(F.col(vec_col), F.col("_qvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)

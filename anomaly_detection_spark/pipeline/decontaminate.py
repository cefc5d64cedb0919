"""Benchmark decontamination and deterministic corpus splits.

Two training-data-pipeline primitives the reference's analytics stack
implies but never ships (reference scope: anomaly_proj_query.sql /
func.R are detection-only; these extend the engine to corpus curation):

- **N-gram decontamination** — flag training documents whose word
  n-grams overlap a held-out evaluation set (the standard "benchmark
  contamination" check: GPT-3 appendix C, PaLM §7, FineWeb). The eval
  gram set is small relative to the corpus, so the design is a
  broadcast inner join against exploded train grams: the 100 TB train
  side is never shuffled — matches stream map-side, and only the
  (doc_id, matched-gram) pairs (volume tracks contamination density,
  not corpus size) reach the per-doc aggregation, which combines
  map-side partially.

- **Deterministic hash split** — train/val/test assignment by content
  hash, not random(): reproducible across runs, engines, and
  re-partitioning, and append-safe (new docs never reshuffle old
  assignments). Uses md5 hex-digit arithmetic that any engine can
  replicate exactly (DuckDB: ``CAST('0x' || substr(md5(x),1,15) AS
  BIGINT)``), unlike xxhash64 which is Spark-specific. Map-only: no
  shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomaly_detection_spark.pipeline.dedup import shingles


def eval_ngram_set(eval_df: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-grams of the evaluation corpus: one `gram` column.

    At scale this is the small side (benchmarks are MBs, not TBs) —
    callers broadcast it into the contamination join.
    """
    return (
        eval_df.select(
            F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("gram")
        )
        .distinct()
    )


def ngram_contamination(
    train: DataFrame,
    eval_grams: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    contaminated_threshold: float = 0.2,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-document contamination report against an eval-set gram list.

    Returns (id, n_grams, n_overlap, overlap_ratio, contaminated) for
    EVERY train document (zero-overlap docs included).

    Plan shape: train grams explode map-side, inner-join the
    (broadcast) eval gram set, partial-aggregate per doc, then one
    broadcast-able left join re-attaches zero-overlap docs. The big
    side is shuffled once, on ``id_col``, only for rows that matched.
    """
    grams = train.select(
        F.col(id_col),
        F.array_distinct(shingles(F.col(text_col), n)).alias("_grams"),
    ).select(
        F.col(id_col),
        F.size("_grams").alias("n_grams"),
        F.explode("_grams").alias("gram"),
    )
    eg = eval_grams.select("gram")
    if broadcast_eval:
        eg = F.broadcast(eg)
    overlap = (
        grams.join(eg, "gram")
        .groupBy(id_col, "n_grams")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    base = train.select(
        F.col(id_col),
        F.size(F.array_distinct(shingles(F.col(text_col), n))).alias("n_grams"),
    )
    out = base.join(overlap, [id_col, "n_grams"], "left").select(
        F.col(id_col),
        F.col("n_grams"),
        F.coalesce(F.col("n_overlap"), F.lit(0).cast("long")).alias("n_overlap"),
        F.round(
            F.coalesce(F.col("n_overlap"), F.lit(0).cast("long"))
            / F.col("n_grams").cast("double"),
            4,
        ).alias("overlap_ratio"),
    )
    return out.withColumn(
        "contaminated", F.col("overlap_ratio") >= F.lit(contaminated_threshold)
    )


def portable_hash_bucket(col: Column, n_buckets: int = 100, salt: str = "") -> Column:
    """Uniform bucket in [0, n_buckets) from md5 — identical in any
    engine with md5 + hex parsing (DuckDB:
    ``CAST('0x' || substr(md5(salt || x), 1, 15) AS BIGINT) % n``).

    Uses the first 15 hex chars (60 bits < 2^63, no sign issues); md5's
    avalanche makes the low-60-bit residue uniform.
    """
    hexed = F.md5(F.concat(F.lit(salt), col.cast("string")).cast("binary"))
    return F.conv(F.substring(hexed, 1, 15), 16, 10).cast("long") % n_buckets


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, int] | None = None,
    salt: str = "split:",
) -> DataFrame:
    """Append `bucket` (0-99) and `split` columns by deterministic
    content hash of ``key_col``. ``weights`` maps split name → percent;
    ranges are assigned in insertion order and must total 100.

    Deterministic, partitioning-independent, append-safe — the
    properties random() splits lack on a cluster.
    """
    if weights is None:
        weights = {"train": 80, "val": 10, "test": 10}
    if sum(weights.values()) != 100:
        raise ValueError(f"split weights must total 100, got {weights}")
    bucket = portable_hash_bucket(F.col(key_col), 100, salt)
    out = df.withColumn("bucket", bucket)
    split = None
    lo = 0
    for name, pct in weights.items():
        cond = (F.col("bucket") >= lo) & (F.col("bucket") < lo + pct)
        split = F.when(cond, F.lit(name)) if split is None else split.when(cond, F.lit(name))
        lo += pct
    return out.withColumn("split", split)

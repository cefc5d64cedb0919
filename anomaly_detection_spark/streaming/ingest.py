"""Streaming corpus ingestion: curate each microbatch against the
ALREADY-ACCEPTED corpus before appending it — the continuous form of
the daily-ingest flow (`pipeline.dedup.dedup_against_reference`).

``foreachBatch`` is the right tool: each trigger's slice is cleaned
with the same batch operators the offline pipeline uses (exact
self-dedup, then exact + near dedup against the corpus parquet), so
streaming and batch curation CANNOT diverge — they are the same code.
State lives in the corpus itself (content digests + signatures derived
on read); at production scale the reference signatures would be a
maintained side table rather than re-derived per trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def make_curated_ingest(
    corpus_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
):
    """Build a ``foreachBatch`` callback that appends only the rows of
    each microbatch that survive dedup against ``corpus_path``.

    Idempotency note: foreachBatch can re-deliver a batch after a
    failure; because a re-delivered row is by then an EXACT duplicate
    of its accepted copy, the digest anti-join drops it — the sink is
    effectively idempotent without a transaction log.
    """
    from anomaly_detection_spark.pipeline.dedup import (
        dedup_against_reference, exact_dedup,
    )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = exact_dedup(batch_df, text_col, id_col)
        try:
            ref = spark.read.parquet(corpus_path)
            has_ref = len(ref.take(1)) > 0
        except Exception:
            has_ref = False
        if has_ref:
            batch = dedup_against_reference(
                batch, ref, text_col, id_col,
                jaccard_threshold=jaccard_threshold,
            )
        batch.write.mode("append").parquet(corpus_path)

    return on_batch

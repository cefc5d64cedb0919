"""Document chunking — fixed-size overlapping token windows.

North-star training-data operator (not in the reference): LLM
pipelines split long documents into model-window-sized chunks with
overlap so no span is lost at a boundary. This is the set-returning
(UDTF-shaped) member of the text family: one doc row → ceil(n/stride)
chunk rows.

Spark-first: tokenize with ``F.split`` (JVM regex, no Python),
generate chunk starts with ``F.sequence`` + ``explode`` (executor-side
row generation, same pattern as the gap-fill spine), slice the token
array per start. Entirely whole-stage-codegen'd — no UDF, no shuffle;
output partitioning follows the input scan.

At 100 TB: output row count is input tokens / stride — the expansion
is bounded and streaming-friendly; chunk rows inherit the scan's
partitioning so a downstream embed/dedup stage repartitions once on
its own key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 100,
    stride_tokens: int = 80,
) -> DataFrame:
    """Split each document into whitespace-token chunks of
    ``chunk_tokens`` starting every ``stride_tokens`` (overlap =
    chunk − stride). Chunks are emitted while start < n_tokens, so the
    final chunk may be short; empty docs emit one empty chunk.

    Output: (id, chunk_id, chunk_start, n_tokens, chunk_text).
    """
    if stride_tokens <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride_tokens must be positive")
    toks = F.split(F.col(text_col), r"\s+")
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride_tokens)
    )
    return (
        docs.select(
            F.col(id_col),
            toks.alias("_toks"),
            n.cast("long").alias("n_tokens"),
            F.explode(starts).alias("_start"),
        )
        .select(
            id_col,
            (F.col("_start") / stride_tokens).cast("long").alias("chunk_id"),
            F.col("_start").cast("long").alias("chunk_start"),
            "n_tokens",
            F.concat_ws(
                " ", F.slice("_toks", F.col("_start") + 1, chunk_tokens)
            ).alias("chunk_text"),
        )
    )

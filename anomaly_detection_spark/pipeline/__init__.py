"""LLM-data-pipeline operators (north-star extensions, not in the
reference): deduplication, similarity search, text analysis,
multimodal column plumbing. SURVEY.md §7.5."""

from anomaly_detection_spark.pipeline.dedup import (
    exact_dedup, exact_dedup_groups, minhash_near_duplicates,
)
from anomaly_detection_spark.pipeline.text import text_stats

__all__ = [
    "exact_dedup", "exact_dedup_groups", "minhash_near_duplicates",
    "text_stats",
]

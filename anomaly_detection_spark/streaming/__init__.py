from anomaly_detection_spark.streaming.rules_stream import (
    windowed_series_stats,
    stateful_run_length,
    stateful_stl_scores,
    stateful_trailing_flags,
    staleness_monitor,
)

__all__ = [
    "windowed_series_stats", "stateful_run_length", "stateful_stl_scores",
    "stateful_trailing_flags", "staleness_monitor",
]

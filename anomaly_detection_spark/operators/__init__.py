from anomaly_detection_spark.operators.windows import (
    series_window,
    series_window_desc,
    partition_window,
)
from anomaly_detection_spark.operators.topn import (
    top_n_per_group,
    trailing_n_per_group,
    latest_per_group,
)
from anomaly_detection_spark.operators.runlength import run_length
from anomaly_detection_spark.operators.keys import concat_key, split_key
from anomaly_detection_spark.operators.completeness import complete_groups

__all__ = [
    "series_window", "series_window_desc", "partition_window",
    "top_n_per_group", "trailing_n_per_group", "latest_per_group",
    "run_length", "concat_key", "split_key", "complete_groups",
]

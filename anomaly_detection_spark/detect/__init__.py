from anomaly_detection_spark.detect.rules import rule_flags
from anomaly_detection_spark.detect.stl import stl_iqr_detect

__all__ = ["rule_flags", "stl_iqr_detect"]

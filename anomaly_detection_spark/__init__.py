"""anomaly_detection_spark — a PySpark-native analytics engine.

Re-expresses the query & data-processing capabilities of the reference
repo ``joel-liebert/Anomaly-Detection`` (a BigQuery-SQL + R anomaly
monitor over ticker time series) as an idiomatic Spark engine:

- ``detect.rules``   — the rule-based flags engine (port of the
  reference's ``anomaly_proj_query.sql``): z-score spike, consecutive
  value repetition, staleness — pure DataFrame/window ops, 100% JVM.
- ``detect.stl``     — the decomposition engine (port of the
  reference's ``func.R`` STL + IQR ``anomalize`` pipeline) via
  ``applyInPandas`` — per-key parallel instead of the reference's
  serial loop.
- ``operators``      — the composable operator library (SURVEY.md §2):
  windows, top-N-per-group, run-length (gaps & islands), staleness,
  key concat/split, dim enrichment.
- ``pipeline``       — LLM-data-pipeline extensions: dedup (exact,
  MinHash-LSH, SimHash), similarity search, text analysis, multimodal
  column plumbing.
- ``streaming``      — Structured Streaming variants (watermarks,
  stateful repetition/staleness).

Everything is DataFrame-first: logical plans go through Catalyst, dims
are broadcast, per-key state is bounded (trailing-N rows), so the same
code runs on local[32] and a 1000-executor cluster.
"""

from anomaly_detection_spark.config import DetectorConfig
from anomaly_detection_spark.session import get_spark

__all__ = ["DetectorConfig", "get_spark"]
__version__ = "0.1.0"

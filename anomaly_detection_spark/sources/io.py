"""Generic file source/sink facade (SURVEY.md §2.1 S1-S5 widened).

The reference reads exactly one source kind — BigQuery tables via
``dbGetQuery`` (``func.R:34-62``) — and sinks to an in-memory
data.frame (``model.R:30-32``). A complete engine needs the common
lake formats too; everything here is the built-in Spark DataSource V2
path, so predicate pushdown (parquet), partition pruning, and
schema-on-read come from Catalyst, not from code in this module.

Conventions:
- Explicit ``StructType`` schemas for text formats (csv/json infer at
  2× scan cost and guess types — never in production paths).
- Timestamps serialized with microsecond precision so text round-trips
  are lossless (the engine's NTZ convention, sources/tables.py).
- Writers default to snappy parquet partitioned by caller-chosen
  columns; at 100 TB layout choice (partition columns + target file
  size) dominates scan cost, so both are first-class arguments.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# lossless text round-trip for NTZ timestamps (µs precision)
_TS_NTZ_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

_TEXT_DEFAULTS = {
    "csv": {
        "header": "true",
        "timestampNTZFormat": _TS_NTZ_FMT,
        "nullValue": "\\N",  # distinguish NULL from empty string
    },
    "json": {"timestampNTZFormat": _TS_NTZ_FMT},
    # XML is built into Spark 4 (the former spark-xml): schema-on-read
    # like csv/json, one element per row under rowTag
    "xml": {"rowTag": "row", "timestampNTZFormat": _TS_NTZ_FMT},
}


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Batch-read ``path`` in ``fmt`` (parquet/csv/json/orc/text/xml).

    Text formats require ``schema`` (explicit schema-on-read); parquet
    and orc carry their own.
    """
    if fmt in _TEXT_DEFAULTS and schema is None:
        raise ValueError(f"{fmt} source requires an explicit schema")
    reader = spark.read.format(fmt)
    for k, v in _TEXT_DEFAULTS.get(fmt, {}).items():
        reader = reader.option(k, v)
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    **options: str,
) -> None:
    """Write ``df`` to ``path``. ``partition_by`` produces the
    hive-style directory layout that enables partition pruning on
    read — the on-disk analogue of the reference's date predicate."""
    writer = df.write.format(fmt).mode(mode)
    for k, v in _TEXT_DEFAULTS.get(fmt, {}).items():
        writer = writer.option(k, v)
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def stream_source(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | str,
    **options: str,
) -> DataFrame:
    """File-drop streaming source: new files under ``path`` become
    micro-batches. Schema is mandatory (Structured Streaming requires
    it). ``maxFilesPerTrigger`` is the back-pressure knob at scale."""
    reader = spark.readStream.format(fmt).schema(schema)
    for k, v in _TEXT_DEFAULTS.get(fmt, {}).items():
        reader = reader.option(k, v)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)

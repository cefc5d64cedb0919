"""Small-files compaction — rewrite a parquet dataset at a target
file size.

Not a reference operator; it's the housekeeping a 100 TB lake needs:
streaming sinks and fine-grained partitioned writes accumulate
thousands of KB-sized files, and scan cost becomes dominated by file
open/footer overhead instead of bytes. Compaction rewrites the data at
a target in-file size so scans read few, large, row-grouped files.

Mechanics: list the dataset's current bytes (driver-side filesystem
metadata only — never the data), compute the output file count, and
rewrite with ``repartition(n)`` (full shuffle → evenly sized files;
``coalesce`` would skip the shuffle but inherits input skew). Output
goes to a NEW directory: object stores have no atomic in-place
rewrite, so production flips a table pointer / swaps directories after
validation — same discipline here.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def dataset_bytes(path: str) -> int:
    """Total bytes of data files under ``path`` (local FS walk; on a
    real lake this is a FileSystem.listFiles call — still metadata-only)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Rewrite ``src_path`` into ``dst_path`` aiming at
    ``target_file_bytes`` per output file. Returns the output file
    count. Caller swaps directories/table pointers after validating."""
    n_files = max(1, math.ceil(dataset_bytes(src_path) / target_file_bytes))
    df: DataFrame = spark.read.format(fmt).load(src_path)
    df.repartition(n_files).write.format(fmt).mode("errorifexists").save(dst_path)
    return n_files

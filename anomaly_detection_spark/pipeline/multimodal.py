"""Multimodal column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The Spark-side machinery — schema, partition-preserving
``mapInPandas`` over Arrow batches, bounded batch memory — is real and
tested; the actual codec step is STUBBED (the container ships no
image/audio libraries): ``decode_stub`` raises ``NotImplementedError``
unless ``fake=True``, in which case it produces a deterministic fake
feature vector so downstream plumbing (similarity, dedup on features)
can be exercised end to end.

At 100 TB: binary payloads stay columnar in parquet; mapInPandas
streams Arrow batches so peak executor memory is one batch of blobs
(bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it
small, e.g. 64, for multi-MB blobs); no shuffle is introduced.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, duration_ms long, codec string"
)


def attach_binary_payload(df: DataFrame, src_col: str,
                          payload_col: str = "payload") -> DataFrame:
    """Demonstration source: treat a string column's bytes as an opaque
    binary payload plus a metadata struct (what a real image/audio
    table would carry)."""
    return df.withColumn(payload_col, F.encode(F.col(src_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(F.col(payload_col)).cast("long").alias("duration_ms"),
            F.lit("raw").alias("codec"),
        ),
    )


def decode_stub(blob: bytes, fake: bool = False) -> np.ndarray:
    """Codec boundary. Real decode needs PIL/ffmpeg — not in this
    container. ``fake=True`` derives a deterministic 8-dim feature
    vector from the blob's sha256 (stable across runs/machines)."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present "
            "in this environment; pass fake=True for the deterministic stub"
        )
    digest = hashlib.sha256(blob).digest()
    return np.frombuffer(digest[:32], dtype=np.uint8).reshape(8, 4).mean(axis=1) / 255.0


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    out_col: str = "features",
    fake: bool = True,
    batch_size_hint: int = 256,
) -> DataFrame:
    """``mapInPandas`` feature extraction over binary payloads.

    Output: (id, features array<double>, n_bytes). Partition-preserving
    (no shuffle); per-batch memory = batch of blobs + 8 doubles/row.
    """
    schema = f"{id_col} long, {out_col} array<double>, n_bytes long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(b, fake=fake).tolist() for b in pdf[payload_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                out_col: feats,
                "n_bytes": [len(b) for b in pdf[payload_col]],
            })

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)

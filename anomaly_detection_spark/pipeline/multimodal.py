"""Multimodal column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The Spark-side machinery — schema, partition-preserving
``mapInPandas`` over Arrow batches, bounded batch memory — is real and
tested. The codec step is REAL for every format whose spec fits in
plain numpy + the stdlib (BMP, PPM/PGM, PNG, baseline JPEG, GIF,
RIFF WAV incl. G.711 u-law/A-law — see ``pipeline.codecs``, no
external libraries) and STUBBED only
for formats that genuinely need ffmpeg-class stacks (MP3, H.264):
there ``decode_stub`` raises
``NotImplementedError`` unless ``fake=True``, in which case it
produces a deterministic fake feature vector so downstream plumbing
(similarity, dedup on features) can be exercised end to end.

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

from . import codecs


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
    """Codec boundary: 8-dim feature vector per payload.

    BMP/PPM/PGM and RIFF-PCM WAV payloads are decoded for REAL
    (``pipeline.codecs``) and featurized from actual content —
    images: per-channel means/stds, log-area, mean horizontal
    gradient; audio: mean/RMS/peak, zero-crossing rate, rate, log
    length, channels, mean first difference — every value scaled to
    roughly [0, 1] and deterministic.  Compressed formats need codec
    libraries this container lacks: ``fake=True`` derives the vector
    from the blob's sha256 instead (stable across runs/machines)."""
    blob = bytes(blob)
    # a magic-byte hit on a payload that then fails to parse (e.g. a
    # text document that happens to start with "P6 ") is NOT an error —
    # it falls through to the stub policy like any other opaque blob
    try:
        kind = codecs.sniff_media_type(blob)
        if kind == "audio/wav":
            pcm, rate = codecs.decode_wav(blob)
            x = pcm.astype(np.float64) / 32768.0
            mono = x.mean(axis=1)
            zc = float(np.mean(np.abs(np.diff(np.sign(mono))) > 0)) if len(mono) > 1 else 0.0
            d1 = float(np.mean(np.abs(np.diff(mono)))) if len(mono) > 1 else 0.0
            return np.array([
                float(mono.mean()), float(np.sqrt((mono ** 2).mean())),
                float(np.abs(mono).max(initial=0.0)), zc,
                rate / 48000.0, np.log1p(len(mono)) / 20.0,
                pcm.shape[1] / 8.0, d1,
            ])
        if kind is not None:
            img = codecs.sniff_and_decode_image(blob)
            x = img.astype(np.float64) / 255.0
            dx = float(np.mean(np.abs(np.diff(x, axis=1)))) if x.shape[1] > 1 else 0.0
            return np.array([
                *(float(m) for m in x.mean(axis=(0, 1))),
                *(float(s) for s in x.std(axis=(0, 1))),
                np.log1p(x.shape[0] * x.shape[1]) / 20.0, dx,
            ])
    except ValueError:
        pass
    if not fake:
        raise NotImplementedError(
            "only BMP/PPM/PGM/PNG/baseline-JPEG/WAV decode without "
            "external codec libraries; pass fake=True for the "
            "deterministic stub on other formats (MP3/H.264 need "
            "ffmpeg-class codec stacks)"
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


def decode_image_stub(blob: bytes, fake: bool = False, size: int = 16) -> np.ndarray:
    """Codec boundary for images.  BMP / PPM / PGM / PNG / baseline
    JPEG payloads are decoded for REAL by the dependency-free
    ``pipeline.codecs`` module (magic-byte sniffed, so a mixed column
    just works; PNG via stdlib zlib + the full unfilter stack, JPEG
    via a pure-numpy Huffman + IDCT baseline decoder).  For genuinely
    library-bound payloads (progressive JPEG, HEIC, video frames),
    ``fake=True`` expands the blob's sha256 into a deterministic
    (size, size, 3) uint8 raster (stable across runs/machines), so the
    REAL resize math downstream has real pixels to chew on."""
    try:
        real = codecs.sniff_and_decode_image(bytes(blob))
        if real is not None:
            return real
    except ValueError:
        real = None  # sniffed magic but unparseable: treat as opaque
    if not fake:
        raise NotImplementedError(
            "only BMP/PPM/PGM/PNG/baseline-JPEG decode without "
            "external codec libraries; pass fake=True for the "
            "deterministic stub on other formats"
        )
    need = size * size * 3
    out = bytearray()
    counter = 0
    seed = hashlib.sha256(blob).digest()
    while len(out) < need:
        out += hashlib.sha256(seed + counter.to_bytes(4, "big")).digest()
        counter += 1
    return np.frombuffer(bytes(out[:need]), dtype=np.uint8).reshape(size, size, 3)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize — pure numpy, REAL math (only the codec
    is stubbed).  Index map: src = floor(dst * in/out)."""
    in_h, in_w = img.shape[:2]
    rows = (np.arange(out_h) * in_h // out_h).clip(0, in_h - 1)
    cols = (np.arange(out_w) * in_w // out_w).clip(0, in_w - 1)
    return img[rows][:, cols]


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """``mapInPandas`` image resize: decode (stub) → nearest-neighbor
    resize (real numpy) → emit the resized raster as bytes + new dims
    + a pixel digest (the cross-run determinism witness).

    Partition-preserving, no shuffle; batch memory = one Arrow batch of
    rasters (bound it with arrow.maxRecordsPerBatch for real images).
    """
    schema = (
        f"{id_col} long, width int, height int, "
        "resized binary, pixel_digest string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                resize_nearest(decode_image_stub(b, fake=fake), out_w, out_h)
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "width": out_w,
                "height": out_h,
                "resized": [r.tobytes() for r in resized],
                "pixel_digest": [
                    hashlib.sha256(r.tobytes()).hexdigest() for r in resized
                ],
            })

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    k: int = 4,
    frame_ms: int = 40,
    payload_col: str = "payload",
    meta_col: str = "media_meta",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Uniform video frame sampling via ``mapInPandas`` (1 input row →
    up to ``k`` frame rows — a flatMap, still shuffle-free).

    Schedule (pure integer math, so any engine can replicate it):
    ``n_frames = max(1, duration_ms // frame_ms)`` total frames; sample
    ``s = min(k, n_frames)`` of them at
    ``frame_idx_j = j * (n_frames - 1) // (s - 1)`` (j = 0..s-1; just
    frame 0 when s == 1), ``ts_ms = frame_idx * frame_ms``.  Each
    frame's feature vector comes from the stubbed decode of
    (blob, frame_idx) — deterministic, real Arrow plumbing.
    """
    schema = (
        f"{id_col} long, n_frames int, frame_idx int, ts_ms long, "
        "features array<double>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                id_col: [], "n_frames": [], "frame_idx": [], "ts_ms": [],
                "features": [],
            }
            for rid, blob, meta in zip(
                pdf[id_col], pdf[payload_col], pdf[meta_col]
            ):
                duration = int(meta["duration_ms"])
                n_frames = max(1, duration // frame_ms)
                s = min(k, n_frames)
                idxs = (
                    [j * (n_frames - 1) // (s - 1) for j in range(s)]
                    if s > 1 else [0]
                )
                for idx in idxs:
                    frame_blob = bytes(blob) + idx.to_bytes(4, "big")
                    out[id_col].append(rid)
                    out["n_frames"].append(n_frames)
                    out["frame_idx"].append(idx)
                    out["ts_ms"].append(idx * frame_ms)
                    out["features"].append(
                        decode_stub(frame_blob, fake=fake).tolist()
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col, meta_col).mapInPandas(
        run, schema=schema
    )

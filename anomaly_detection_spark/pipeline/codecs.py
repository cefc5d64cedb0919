"""Dependency-free media codecs (pure numpy) for the multimodal path.

The container ships no image/audio libraries, so the formats whose
specs are simple enough to implement exactly are decoded for REAL:

- **BMP** (Windows DIB, the format every tool can write): uncompressed
  24-bit BGR and 32-bit BGRA, bottom-up or top-down (negative height),
  4-byte row padding — ``decode_bmp`` / ``encode_bmp``.
- **PPM/PGM** (netpbm P6/P5 binary): maxval <= 255, whitespace and
  ``#`` comments in the header — ``decode_ppm`` / ``encode_ppm``.
- **WAV** (RIFF PCM): 8-bit unsigned / 16-bit signed PCM, any channel
  count, chunk walking (skips LIST/fact/etc.) — ``decode_wav`` /
  ``encode_wav``.

``sniff_and_decode`` dispatches on magic bytes; compressed formats
(JPEG/PNG/MP3/H.264) stay behind the stub boundary in
``pipeline/multimodal.py`` — those genuinely need codec libraries.

Everything here is per-row driver/executor-local math invoked from
Arrow-batched ``mapInPandas`` kernels; nothing touches the Spark plan,
so the 100 TB posture of the multimodal pipeline (columnar binary
payloads, partition-preserving batch streaming, no shuffle) is
unchanged.

Reference parity note: the reference system has no media path at all —
this module backs the north-star multimodal extension the build brief
asks for, not a reference operator.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# BMP (Windows DIB)
# ---------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB raster as an uncompressed 24-bit
    bottom-up BMP (BITMAPINFOHEADER, BGR byte order, rows padded to 4
    bytes) — the stock layout every viewer accepts."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    h, w = img.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    pixel_bytes = stride * h
    # BGR, bottom-up, padded
    bgr = img[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 14 + 40
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    return header + info + rows.tobytes()


def decode_bmp(blob: bytes) -> np.ndarray:
    """Decode an uncompressed 24- or 32-bit BMP to (H, W, 3) uint8 RGB.

    Handles bottom-up (positive height) and top-down (negative height)
    rasters and the 4-byte row stride; rejects compressed (BI_RLE/
    BI_BITFIELDS with masks) and palette images explicitly rather than
    misreading them.
    """
    if blob[:2] != b"BM" or len(blob) < 54:
        raise ValueError("not a BMP stream")
    data_offset = struct.unpack_from("<I", blob, 10)[0]
    hdr_size = struct.unpack_from("<I", blob, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMPs not supported")
    w, h_signed = struct.unpack_from("<ii", blob, 18)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if planes != 1 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: planes={planes} bpp={bpp}")
    # BI_RGB == 0; BI_BITFIELDS (3) on 32bpp with the default BGRA
    # masks is emitted by some writers and is layout-identical
    if compression not in (0, 3):
        raise ValueError(f"compressed BMP (type {compression}) not supported")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise ValueError("degenerate BMP dimensions")
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    end = data_offset + stride * h
    if end > len(blob):
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(blob, dtype=np.uint8,
                         count=stride * h, offset=data_offset)
    rows = rows.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    rgb = rows[:, :, 2::-1]  # BGR(A) -> RGB, alpha dropped
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


# ---------------------------------------------------------------------------
# netpbm (PPM P6 / PGM P5, binary, maxval <= 255)
# ---------------------------------------------------------------------------

def _pnm_header(blob: bytes, magic: bytes, n_fields: int):
    """Parse a netpbm header: magic, then ``n_fields`` ASCII integers
    separated by whitespace, with ``#`` comments running to EOL.
    Returns (fields, offset_of_raster)."""
    if blob[:2] != magic:
        raise ValueError(f"not a {magic.decode()} stream")
    pos, fields = 2, []
    while len(fields) < n_fields:
        if pos >= len(blob):
            raise ValueError("truncated netpbm header")
        c = blob[pos:pos + 1]
        if c == b"#":
            nl = blob.find(b"\n", pos)
            pos = len(blob) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(blob) and not blob[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(blob[start:pos]))
    return fields, pos + 1  # single whitespace byte after the last field


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 RGB as binary PPM (P6, maxval 255)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_ppm expects (H, W, 3) uint8")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img).tobytes()


def decode_ppm(blob: bytes) -> np.ndarray:
    """Decode binary PPM (P6) to (H, W, 3) uint8 RGB."""
    (w, h, maxval), off = _pnm_header(blob, b"P6", 3)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    need = w * h * 3
    if len(blob) - off < need:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(blob, np.uint8, need, off).reshape(h, w, 3).copy()


def encode_pgm(img: np.ndarray) -> bytes:
    """Encode (H, W) uint8 grayscale as binary PGM (P5, maxval 255)."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_pgm expects (H, W) uint8")
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img).tobytes()


def decode_pgm(blob: bytes) -> np.ndarray:
    """Decode binary PGM (P5) to (H, W) uint8 grayscale."""
    (w, h, maxval), off = _pnm_header(blob, b"P5", 3)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    need = w * h
    if len(blob) - off < need:
        raise ValueError("truncated PGM raster")
    return np.frombuffer(blob, np.uint8, need, off).reshape(h, w).copy()


# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode (n,) or (n, channels) int16 PCM as a canonical RIFF WAV."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = np.ascontiguousarray(samples).tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF PCM WAV to ((n, channels) int16, sample_rate).

    Walks chunks (so LIST/fact/cue chunks are skipped, and chunk
    padding-to-even is honored); accepts 16-bit signed and 8-bit
    unsigned PCM (8-bit is rescaled to int16, the lossless direction).
    """
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos:pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        payload = blob[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, 0)
        elif cid == b"data":
            data = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, ch, rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"non-PCM WAV (format {audio_format}) not supported")
    if bits == 16:
        arr = np.frombuffer(data, dtype="<i2")
    elif bits == 8:
        arr = ((np.frombuffer(data, np.uint8).astype(np.int16) - 128) << 8)
    else:
        raise ValueError(f"{bits}-bit PCM not supported")
    n = len(arr) // ch
    return arr[: n * ch].reshape(n, ch).copy(), rate


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def sniff_media_type(blob: bytes) -> str | None:
    """Identify a decodable payload by magic bytes; None if unknown."""
    if blob[:2] == b"BM":
        return "image/bmp"
    if blob[:2] == b"P6":
        return "image/x-portable-pixmap"
    if blob[:2] == b"P5":
        return "image/x-portable-graymap"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "audio/wav"
    return None


def sniff_and_decode_image(blob: bytes) -> np.ndarray | None:
    """Decode BMP/PPM/PGM payloads to an (H, W, 3) uint8 RGB raster;
    None when the magic is not a format this module handles (the
    caller then falls back to its stub policy)."""
    kind = sniff_media_type(blob)
    if kind == "image/bmp":
        return decode_bmp(blob)
    if kind == "image/x-portable-pixmap":
        return decode_ppm(blob)
    if kind == "image/x-portable-graymap":
        g = decode_pgm(blob)
        return np.repeat(g[:, :, None], 3, axis=2)
    return None

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
- **PNG** (non-interlaced, 8-bit gray/RGB/gray+alpha/RGBA): the
  compression is stdlib ``zlib`` (PNG's DEFLATE is exactly zlib), so
  the only real codec work is the per-scanline unfilter (None/Sub/Up/
  Average/Paeth) — ``decode_png`` / ``encode_png``, with chunk CRC
  verification.

``sniff_and_decode`` dispatches on magic bytes; the remaining
compressed formats (JPEG/MP3/H.264) stay behind the stub boundary in
``pipeline/multimodal.py`` — those genuinely need codec libraries
(DCT/entropy coders), unlike PNG whose DEFLATE ships in the stdlib.

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
# PNG (non-interlaced, bit depth 8; color types 0/2/4/6)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channel count (3 = palette, rejected explicitly)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunks(blob: bytes):
    """Yield (type, data) chunks, verifying each CRC-32 (over type+data,
    per the spec) — a corrupt stream fails loudly, never decodes wrong."""
    import zlib

    pos = len(_PNG_SIG)
    while pos + 8 <= len(blob):
        (size,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + size]
        if len(data) < size or pos + 12 + size > len(blob):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + size)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos += 12 + size
        if ctype == b"IEND":
            return
    raise ValueError("PNG stream ended without IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filtering: ``raw`` is h rows of (1 filter byte
    + stride pixel bytes).  Up/Average/None vectorize across the row;
    Sub/Paeth carry a left-neighbor dependency, so they walk the row in
    ``bpp``-wide numpy slices (one python iteration per PIXEL COLUMN,
    vectorized over channels) — exact uint8 modular arithmetic
    throughout, as the spec requires."""
    raw = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].copy()
        prev = out[y - 1] if y else zero_row
        if ftype == 0:
            out[y] = line
        elif ftype == 1:  # Sub
            for x in range(0, stride, bpp):
                if x:
                    line[x:x + bpp] += line[x - bpp:x]
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = line + prev
        elif ftype == 3:  # Average: left is sequential, up is not
            for x in range(0, stride, bpp):
                left = line[x - bpp:x].astype(np.uint16) if x else 0
                avg = (left + prev[x:x + bpp].astype(np.uint16)) >> 1
                line[x:x + bpp] += avg.astype(np.uint8)
            out[y] = line
        elif ftype == 4:  # Paeth
            for x in range(0, stride, bpp):
                a = line[x - bpp:x] if x else zero_row[:bpp]
                b = prev[x:x + bpp]
                c = prev[x - bpp:x] if x else zero_row[:bpp]
                pred = np.fromiter(
                    (_paeth(int(ai), int(bi), int(ci))
                     for ai, bi, ci in zip(a, b, c)),
                    dtype=np.uint8, count=bpp,
                )
                line[x:x + bpp] += pred
            out[y] = line
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def decode_png(blob: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG to (H, W, channels) uint8
    (channels per color type: gray 1, RGB 3, gray+alpha 2, RGBA 4).

    Rejects interlaced (Adam7), palette, and 16-bit images explicitly —
    the formats that would need resampling policy decisions — rather
    than misreading them.
    """
    import zlib

    if blob[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    ihdr, idat = None, []
    for ctype, data in _png_chunks(blob):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"{depth}-bit PNG not supported")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"palette/unknown PNG color type {color}")
    if comp != 0 or filt != 0:
        raise ValueError("non-standard PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    if w <= 0 or h <= 0:
        raise ValueError("degenerate PNG dimensions")
    nch = _PNG_CHANNELS[color]
    stride = w * nch
    raw = np.frombuffer(
        zlib.decompress(b"".join(idat)), dtype=np.uint8
    )
    if raw.size != h * (1 + stride):
        raise ValueError("PNG pixel data size mismatch")
    px = _png_unfilter(raw, h, stride, nch)
    return px.reshape(h, w, nch).copy()


def encode_png(img: np.ndarray) -> bytes:
    """Encode (H, W) or (H, W, {1,2,3,4}) uint8 as a minimal PNG
    (bit depth 8, filter 0 on every scanline, one IDAT)."""
    import zlib

    if img.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 2, 3, 4):
        raise ValueError("encode_png expects (H, W, {1,2,3,4})")
    h, w, nch = img.shape
    if h == 0 or w == 0:
        # mirror decode_png's degenerate-dimensions rejection so the
        # encode->decode round-trip contract holds for every accepted
        # input
        raise ValueError("degenerate PNG dimensions")
    color = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    rows = np.zeros((h, 1 + w * nch), dtype=np.uint8)
    rows[:, 1:] = np.ascontiguousarray(img).reshape(h, w * nch)
    idat = zlib.compress(rows.tobytes(), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def sniff_media_type(blob: bytes) -> str | None:
    """Identify a decodable payload by magic bytes; None if unknown."""
    if blob[:2] == b"BM":
        return "image/bmp"
    if blob[: len(_PNG_SIG)] == _PNG_SIG:
        return "image/png"
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
    if kind == "image/png":
        px = decode_png(blob)
        nch = px.shape[2]
        if nch == 1:
            return np.repeat(px, 3, axis=2)
        if nch == 2:  # gray+alpha: gray replicated, alpha dropped
            return np.repeat(px[:, :, :1], 3, axis=2)
        return np.ascontiguousarray(px[:, :, :3])  # RGB(A), alpha dropped
    if kind == "image/x-portable-pixmap":
        return decode_ppm(blob)
    if kind == "image/x-portable-graymap":
        g = decode_pgm(blob)
        return np.repeat(g[:, :, None], 3, axis=2)
    return None

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

- **JPEG** (baseline DCT, ITU-T T.81): SOF0/SOF1 Huffman sequential,
  8-bit grayscale and YCbCr with arbitrary even sampling ratios
  (4:4:4 / 4:2:0 / 4:2:2), restart intervals; the encoder emits
  baseline JFIF with quality-scaled Annex K tables — ``decode_jpeg``
  / ``encode_jpeg``.  Progressive / arithmetic / 12-bit are rejected
  loudly.
- **GIF** (87a/89a): spec-exact variable-width LZW both directions,
  local/global color tables, 4-pass interlace, first frame —
  ``decode_gif`` / ``encode_gif`` (palette-lossless).
- **G.711** (u-law / A-law telephony companding): vectorized
  CCITT segment tables both directions, WAV format codes 6/7 wired
  into ``decode_wav`` — ``ulaw_encode/decode``, ``alaw_encode/
  decode``, ``encode_wav_g711``.

``sniff_and_decode`` dispatches on magic bytes; the remaining
compressed formats (MP3/H.264) stay behind the stub boundary in
``pipeline/multimodal.py`` — those genuinely need codec libraries
(psychoacoustic/motion-compensation stacks), unlike PNG whose DEFLATE
ships in the stdlib and JPEG whose DCT+Huffman fit in plain numpy.

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
    if audio_format not in (1, 6, 7):
        raise ValueError(f"non-PCM WAV (format {audio_format}) not supported")
    if audio_format in (6, 7):  # G.711 A-law / u-law companded bytes
        if bits != 8:
            raise ValueError(f"{bits}-bit G.711 WAV is malformed")
        codes = np.frombuffer(data, np.uint8)
        arr = alaw_decode(codes) if audio_format == 6 else ulaw_decode(codes)
    elif bits == 16:
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
# GIF (87a/89a): LZW-compressed palette images — fully lossless, so the
# spec-complete decode/encode pair round-trips exactly.  The decoder
# walks extensions, honors local color tables and Adam-style 4-pass
# interlacing, and returns the FIRST frame as (H, W, 3) RGB; the
# encoder emits a single-frame GIF89a from an index raster + palette
# with spec-exact variable-width LZW (LSB-first packing, clear/EOI
# codes, 12-bit cap with mid-stream clear).
# ---------------------------------------------------------------------------

def _gif_lzw_decode(data: bytes, min_code: int, expect: int) -> list[int]:
    clear, end = 1 << min_code, (1 << min_code) + 1
    out: list[int] = []
    table: dict[int, tuple[int, ...]] = {}
    csize = min_code + 1
    next_code = end + 1
    prev: tuple[int, ...] | None = None
    bitpos, total = 0, len(data) * 8
    while bitpos + csize <= total:
        byte_i, shift = bitpos >> 3, bitpos & 7
        chunk = int.from_bytes(data[byte_i: byte_i + 3], "little")
        code = (chunk >> shift) & ((1 << csize) - 1)
        bitpos += csize
        if code == clear:
            table, csize, next_code, prev = {}, min_code + 1, end + 1, None
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("corrupt GIF LZW stream (bad first code)")
            entry = (code,)
        else:
            if code < clear:
                entry = (code,)
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + (prev[0],)  # the KwKwK case
            else:
                raise ValueError("corrupt GIF LZW stream (code gap)")
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << csize) and csize < 12:
                csize += 1
        out.extend(entry)
        prev = entry
        if len(out) >= expect:
            break
    if len(out) < expect:
        raise ValueError("truncated GIF pixel data")
    return out[:expect]


def _gif_lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    clear, end = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, csize: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += csize
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    csize = min_code + 1
    next_code = end + 1
    emit(clear, csize)
    it = iter(int(i) for i in indices)
    cur = next(it)
    for k in it:
        if (cur, k) in table:
            cur = table[(cur, k)]
            continue
        emit(cur, csize)
        table[(cur, k)] = next_code
        next_code += 1
        if next_code - 1 == (1 << csize) and csize < 12:
            csize += 1
        cur = k
        if next_code == 4096:  # dictionary full: reset mid-stream
            emit(clear, csize)
            table, csize, next_code = {}, min_code + 1, end + 1
    emit(cur, csize)
    emit(end, csize)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step) passes


def decode_gif(blob: bytes) -> np.ndarray:
    """Decode the first frame of a GIF87a/89a to (H, W, 3) uint8 RGB
    (palette applied; interlaced frames de-interlaced; transparency
    intentionally flattened — this is a raster path, not a compositor)."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    packed = blob[10]
    pos, gct = 13, None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(blob, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(blob):
        b0 = blob[pos]
        if b0 == 0x21:  # extension: label + size-prefixed sub-blocks
            pos += 2
            while pos < len(blob) and blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            iw, ih = struct.unpack_from("<HH", blob, pos + 5)
            ipacked = blob[pos + 9]
            pos += 10
            if iw == 0 or ih == 0:
                raise ValueError("degenerate GIF dimensions")
            lct = None
            if ipacked & 0x80:
                n = 2 << (ipacked & 7)
                lct = np.frombuffer(blob, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            min_code = blob[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                raise ValueError("invalid GIF LZW minimum code size")
            data = bytearray()
            while pos < len(blob) and blob[pos] != 0:
                sz = blob[pos]
                data += blob[pos + 1: pos + 1 + sz]
                pos += 1 + sz
            if pos >= len(blob):
                raise ValueError("truncated GIF data sub-blocks")
            table = lct if lct is not None else gct
            if table is None:
                raise ValueError("GIF frame has no color table")
            idx = np.array(
                _gif_lzw_decode(bytes(data), min_code, iw * ih), np.int64
            )
            if (idx >= len(table)).any():
                raise ValueError("GIF index outside color table")
            img = table[idx].reshape(ih, iw, 3)
            if ipacked & 0x40:  # interlaced: rows stored in 4 passes
                rows = []
                for start, step in _GIF_INTERLACE:
                    rows.extend(range(start, ih, step))
                deinter = np.empty_like(img)
                deinter[np.array(rows)] = img
                img = deinter
            return np.ascontiguousarray(img)
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"corrupt GIF block 0x{b0:02x}")
    raise ValueError("GIF stream has no image data")


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode an (H, W) uint8 index raster + (N, 3) uint8 palette as a
    single-frame GIF89a (global color table, non-interlaced) — exactly
    losslessly, GIF being palette-exact."""
    if indices.dtype != np.uint8 or indices.ndim != 2:
        raise ValueError("encode_gif expects (H, W) uint8 indices")
    h, w = indices.shape
    if h == 0 or w == 0:
        raise ValueError("degenerate GIF dimensions")
    palette = np.asarray(palette, dtype=np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) < 2:
        raise ValueError("encode_gif expects an (N>=2, 3) uint8 palette")
    if int(indices.max()) >= len(palette):
        raise ValueError("GIF index outside palette")
    bits = max(2, int(len(palette) - 1).bit_length())
    if bits > 8:
        raise ValueError("GIF palettes cap at 256 entries")
    gct = np.zeros((1 << bits, 3), np.uint8)
    gct[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])
    out += gct.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([bits])
    lzw = _gif_lzw_encode(indices.reshape(-1), bits)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i: i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# G.711 companding (u-law / A-law) — the telephony byte codecs, straight
# from the CCITT segment tables.  Both directions are vectorized numpy;
# the codebook idempotence law encode(decode(byte)) == byte holds for
# all 256 code values in both laws (tested exhaustively).
# ---------------------------------------------------------------------------

def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """u-law bytes -> int16 PCM (G.711 expansion)."""
    u = (~np.asarray(codes, dtype=np.uint8)).astype(np.int32)
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def ulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 PCM -> u-law bytes (G.711 compression, segment search)."""
    x = np.asarray(pcm, dtype=np.int32) >> 2  # to 14-bit magnitude space
    mask = np.where(x < 0, 0x7F, 0xFF)
    x = np.where(x < 0, -x, x)
    x = np.minimum(x, 8159) + 0x21
    seg_end = np.array(
        [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF], np.int32
    )
    seg = np.searchsorted(seg_end, x)
    uval = (seg << 4) | ((x >> (seg + 1)) & 0x0F)
    return (uval ^ mask).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """A-law bytes -> int16 PCM (G.711 expansion)."""
    a = (np.asarray(codes, dtype=np.uint8) ^ 0x55).astype(np.int32)
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8,
                 np.where(seg == 1, t + 0x108, (t + 0x108) << (np.maximum(seg, 1) - 1)))
    return np.where(a & 0x80, t, -t).astype(np.int16)


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 PCM -> A-law bytes (G.711 compression, segment search)."""
    x = np.asarray(pcm, dtype=np.int32) >> 3  # to 13-bit space
    mask = np.where(x >= 0, 0xD5, 0x55)
    x = np.where(x >= 0, x, -x - 1)
    seg_end = np.array(
        [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], np.int32
    )
    seg = np.searchsorted(seg_end, x)
    shift = np.where(seg < 2, 1, np.maximum(seg, 1))
    aval = np.where(
        seg >= 8, 0x7F, (seg << 4) | ((x >> shift) & 0x0F)
    )
    return (aval ^ mask).astype(np.uint8)


def encode_wav_g711(
    samples: np.ndarray, sample_rate: int = 8000, law: str = "ulaw"
) -> bytes:
    """Encode (n, channels) int16 PCM as a RIFF WAV with G.711 u-law
    (format 7) or A-law (format 6) companded 8-bit payload."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16 or samples.ndim != 2:
        raise ValueError("encode_wav_g711 expects (n[, channels]) int16")
    if law == "ulaw":
        fmt_code, payload = 7, ulaw_encode(samples.reshape(-1))
    elif law == "alaw":
        fmt_code, payload = 6, alaw_encode(samples.reshape(-1))
    else:
        raise ValueError("law must be 'ulaw' or 'alaw'")
    ch = samples.shape[1]
    data = payload.tobytes()
    fmt = struct.pack(
        "<HHIIHH", fmt_code, ch, sample_rate, sample_rate * ch, ch, 8
    )
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ---------------------------------------------------------------------------
# JPEG (baseline DCT, ITU-T T.81): SOF0/SOF1 sequential Huffman, 8-bit,
# grayscale or YCbCr with any sampling factors whose ratios divide
# evenly (4:4:4, 4:2:0, 4:2:2, ...), restart intervals.  Rejected
# loudly: progressive (SOF2), arithmetic coding, 12-bit, lossless,
# hierarchical.  The encoder emits baseline JFIF with the standard
# Annex K quantization + Huffman tables (quality-scaled the libjpeg
# way) or caller-supplied quantization tables.
#
# Exactness law used by the driver row: for an image whose every
# ALIGNED 8x8 tile is constant, all AC coefficients are exactly zero
# and DC = 8*(v-128), so whenever the DC quantization step q satisfies
# q/2 < 8 the reconstruction error per pixel is < 0.5 and the uint8
# round-trip is EXACT despite JPEG being lossy in general.  (Edge
# padding replicates pixels from the same tile, so the law holds for
# non-multiple-of-8 dimensions too.)
# ---------------------------------------------------------------------------

# zigzag scan position k -> natural (row-major) coefficient index
_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K quantization tables (natural order)
_JPEG_STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

_JPEG_STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K Huffman tables: (BITS[1..16], HUFFVAL)
_JPEG_STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_JPEG_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _jpeg_dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix A (A @ A.T == I):
    forward S = A @ s @ A.T, inverse s = A.T @ S @ A."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    a = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    a[0] *= 1.0 / np.sqrt(2.0)
    return a


_JPEG_DCT_A = _jpeg_dct_matrix()


def _jpeg_huff_decode_table(bits, values) -> dict:
    """Canonical Huffman (length, code) -> symbol map per T.81 C.2."""
    if sum(bits) != len(values):
        raise ValueError("corrupt JPEG Huffman table")
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = values[k]
            k += 1
            code += 1
        if code > (1 << ln):
            raise ValueError("non-canonical JPEG Huffman table")
        code <<= 1
    return table


def _jpeg_huff_encode_table(bits, values) -> dict:
    """symbol -> (code, length) from the same canonical construction."""
    enc, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            enc[values[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return enc


class _JpegBitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data, self.pos, self.acc, self.nbits = data, 0, 0, 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _jpeg_receive_extend(reader: _JpegBitReader, t: int) -> int:
    if t == 0:
        return 0
    v = reader.read_bits(t)
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _jpeg_decode_huff(reader: _JpegBitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_decode_block(reader, dc_tbl, ac_tbl, pred: int):
    """One 8x8 block: returns (natural-order int coefficients, new DC
    predictor)."""
    coef = np.zeros(64, dtype=np.int64)
    t = _jpeg_decode_huff(reader, dc_tbl)
    if t > 11:
        raise ValueError("baseline JPEG DC category > 11")
    pred += _jpeg_receive_extend(reader, t)
    coef[0] = pred
    k = 1
    while k < 64:
        rs = _jpeg_decode_huff(reader, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG coefficient index overrun")
        coef[_JPEG_ZIGZAG[k]] = _jpeg_receive_extend(reader, s)
        k += 1
    return coef, pred


def _jpeg_entropy_segments(blob: bytes, start: int):
    """Split the scan's entropy data into restart segments with the
    0xFF00 stuffing removed.  Returns (segments, pos_after_scan)."""
    segs, cur, i, n = [], bytearray(), start, len(blob)
    while i < n:
        b = blob[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = blob[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif m == 0xFF:  # fill byte
            i += 1
        else:  # real marker (EOI / next SOS / ...)
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/SOF1) 8-bit JPEG to (H, W, 1) grayscale
    or (H, W, 3) RGB uint8.  Progressive / arithmetic / 12-bit streams
    are rejected with a clear error rather than misread."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode map
    comps = None  # list of dicts: id, h, v, tq, td, ta
    height = width = 0
    restart_interval = 0
    i, n = 2, len(blob)
    while i < n:
        if blob[i] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        while i < n and blob[i] == 0xFF:
            i += 1
        if i >= n:
            break
        marker = blob[i]
        i += 1
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        if i + 2 > n:
            raise ValueError("truncated JPEG segment header")
        seglen = struct.unpack_from(">H", blob, i)[0]
        seg = blob[i + 2: i + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit JPEG quant tables not supported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_JPEG_ZIGZAG] = np.frombuffer(
                    seg[j + 1: j + 65], dtype=np.uint8
                )
                qtables[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1: j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17: j + 17 + nv])
                huff[(tc, th)] = _jpeg_huff_decode_table(bits, vals)
                j += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline sequential
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG not supported")
            height, width = struct.unpack_from(">HH", seg, 1)
            if height == 0 or width == 0:
                raise ValueError("degenerate JPEG dimensions")
            nc = seg[5]
            if nc not in (1, 3):
                raise ValueError(f"{nc}-component JPEG not supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c: 9 + 3 * c]
                comps.append({
                    "id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq,
                })
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG (SOF0/SOF1) is supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if comps is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if ns != len(comps):
                raise ValueError("non-interleaved JPEG scans not supported")
            by_id = {c["id"]: c for c in comps}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c: 3 + 2 * c]
                by_id[cid]["td"], by_id[cid]["ta"] = tt >> 4, tt & 0x0F
            segs, i = _jpeg_entropy_segments(blob, i + seglen)
            return _jpeg_decode_scan(
                comps, qtables, huff, segs, height, width, restart_interval
            )
        # APPn / COM / others: skip
        i += seglen
    raise ValueError("JPEG stream has no scan data")


def _jpeg_decode_scan(comps, qtables, huff, segs, height, width, ri):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("unsupported JPEG sampling factors")
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    a_t = _JPEG_DCT_A.T
    planes = []
    for c in comps:
        if c["tq"] not in qtables:
            raise ValueError("JPEG references an undefined quant table")
        if (0, c.get("td", -1)) not in huff or (1, c.get("ta", -1)) not in huff:
            raise ValueError("JPEG references an undefined Huffman table")
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    preds = [0] * len(comps)
    seg_idx = 0
    reader = _JpegBitReader(segs[0])
    for mcu in range(mcux * mcuy):
        if ri and mcu and mcu % ri == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing JPEG restart segment")
            reader = _JpegBitReader(segs[seg_idx])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, c in enumerate(comps):
            q = qtables[c["tq"]]
            dc_t, ac_t = huff[(0, c["td"])], huff[(1, c["ta"])]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef, preds[ci] = _jpeg_decode_block(
                        reader, dc_t, ac_t, preds[ci]
                    )
                    s = a_t @ (coef.reshape(8, 8) * q) @ _JPEG_DCT_A
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0: y0 + 8, x0: x0 + 8] = s + 128.0
    # crop + upsample each component to full resolution (nearest)
    out = np.empty((height, width, len(comps)), dtype=np.float64)
    ys = np.arange(height)
    xs = np.arange(width)
    for ci, c in enumerate(comps):
        out[:, :, ci] = planes[ci][
            (ys * c["v"] // vmax)[:, None], (xs * c["h"] // hmax)[None, :]
        ]
    if len(comps) == 3:  # JFIF YCbCr -> RGB (BT.601)
        y, cb, cr = out[:, :, 0], out[:, :, 1] - 128.0, out[:, :, 2] - 128.0
        rgb = np.stack([
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ], axis=2)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _jpeg_quality_tables(quality: int):
    """libjpeg-style quality scaling of the Annex K tables."""
    if not 1 <= quality <= 100:
        raise ValueError("JPEG quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    luma = np.clip((_JPEG_STD_LUMA_Q * scale + 50) // 100, 1, 255)
    chroma = np.clip((_JPEG_STD_CHROMA_Q * scale + 50) // 100, 1, 255)
    return luma.astype(np.int64), chroma.astype(np.int64)


class _JpegBitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out, self.acc, self.nbits = bytearray(), 0, 0

    def write(self, code: int, length: int):
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self):
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _jpeg_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _jpeg_encode_block(bw, coef_zz, pred, dc_enc, ac_enc):
    """Huffman-encode one quantized block (zigzag order)."""
    diff = int(coef_zz[0]) - pred
    t = _jpeg_category(diff)
    code, ln = dc_enc[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _jpeg_category(v)
        code, ln = ac_enc[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_enc[0x00]  # EOB
        bw.write(code, ln)
    return int(coef_zz[0])


def _jpeg_pad_to_blocks(plane: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    """Edge-replicate so both dims are multiples of (bh, bw_)."""
    h, w = plane.shape
    ph, pw = (-h) % bh, (-w) % bw_
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample_420: bool = False,
    restart_interval: int = 0,
    quant_tables: tuple[np.ndarray, np.ndarray] | None = None,
) -> bytes:
    """Encode (H, W) / (H, W, 1) grayscale or (H, W, 3) RGB uint8 as a
    baseline JFIF JPEG (SOF0, standard Annex K Huffman tables).

    ``quant_tables`` overrides the quality-scaled (luma, chroma)
    quantization tables with explicit (8, 8) integer arrays — e.g. all
    ones for the block-constant exactness law.
    """
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    if img.ndim == 2:
        ncomp = 1
    elif img.ndim == 3 and img.shape[2] == 3:
        ncomp = 3
    else:
        raise ValueError("encode_jpeg expects (H, W[, 1|3])")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("degenerate JPEG dimensions")
    if h > 65535 or w > 65535:
        raise ValueError("JPEG dimensions exceed 65535")

    if quant_tables is not None:
        qluma = np.asarray(quant_tables[0], dtype=np.int64).reshape(8, 8)
        qchroma = np.asarray(quant_tables[1], dtype=np.int64).reshape(8, 8)
        if (qluma < 1).any() or (qluma > 255).any() \
                or (qchroma < 1).any() or (qchroma > 255).any():
            raise ValueError("JPEG quant table entries must be in [1, 255]")
    else:
        qluma, qchroma = _jpeg_quality_tables(quality)

    x = img.astype(np.float64)
    if ncomp == 3:
        r, g, b = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        yp = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample_420:
            sampling = [(2, 2), (1, 1), (1, 1)]
            ce = _jpeg_pad_to_blocks(cb, 2, 2)
            re = _jpeg_pad_to_blocks(cr, 2, 2)
            cb = (ce[0::2, 0::2] + ce[0::2, 1::2]
                  + ce[1::2, 0::2] + ce[1::2, 1::2]) / 4.0
            cr = (re[0::2, 0::2] + re[0::2, 1::2]
                  + re[1::2, 0::2] + re[1::2, 1::2]) / 4.0
        else:
            sampling = [(1, 1), (1, 1), (1, 1)]
        planes = [yp, cb, cr]
        qsel = [0, 1, 1]
    else:
        sampling = [(1, 1)]
        planes = [x]
        qsel = [0]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = [
        np.pad(
            p,
            ((0, mcuy * sv * 8 - p.shape[0]), (0, mcux * sh * 8 - p.shape[1])),
            mode="edge",
        )
        for p, (sh, sv) in zip(planes, sampling)
    ]
    qts = [qluma, qchroma][: (2 if ncomp == 3 else 1)]

    dc_enc = [_jpeg_huff_encode_table(*_JPEG_STD_DC_LUMA),
              _jpeg_huff_encode_table(*_JPEG_STD_DC_CHROMA)]
    ac_enc = [_jpeg_huff_encode_table(*_JPEG_STD_AC_LUMA),
              _jpeg_huff_encode_table(*_JPEG_STD_AC_CHROMA)]
    tsel = [0, 1, 1][:ncomp]

    a = _JPEG_DCT_A
    bw = _JpegBitWriter()
    preds = [0] * ncomp
    body = bytearray()
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.pad_to_byte()
            body += bw.out
            bw = _JpegBitWriter()
            body += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            preds = [0] * ncomp
        my, mx = divmod(mcu, mcux)
        for ci in range(ncomp):
            sh, sv = sampling[ci]
            q = qts[qsel[ci]]
            for by in range(sv):
                for bxk in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bxk) * 8
                    blk = padded[ci][y0: y0 + 8, x0: x0 + 8] - 128.0
                    s = a @ blk @ a.T
                    coef = np.round(s / q).astype(np.int64)
                    # baseline AC categories cap at 10 (|v| <= 1023);
                    # only a basis-aligned checkerboard at quant step 1
                    # can exceed it — saturate rather than error
                    dc = coef[0, 0]
                    coef = np.clip(coef, -1023, 1023)
                    coef[0, 0] = dc
                    preds[ci] = _jpeg_encode_block(
                        bw, coef.reshape(64)[_JPEG_ZIGZAG], preds[ci],
                        dc_enc[tsel[ci]], ac_enc[tsel[ci]],
                    )
    bw.pad_to_byte()
    body += bw.out

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00" + bytes([1, 1, 0]) +
               struct.pack(">HH", 1, 1) + bytes([0, 0]))
    for ti, qt in enumerate(qts):
        zz = qt.reshape(64)[_JPEG_ZIGZAG]
        out += seg(0xDB, bytes([ti]) + bytes(int(v) for v in zz))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = sampling[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    out += seg(0xC0, sof)
    for cls, tables in ((0, (_JPEG_STD_DC_LUMA, _JPEG_STD_DC_CHROMA)),
                        (1, (_JPEG_STD_AC_LUMA, _JPEG_STD_AC_CHROMA))):
        for ti in range(2 if ncomp == 3 else 1):
            bits, vals = tables[ti]
            out += seg(0xC4, bytes([(cls << 4) | ti]) + bytes(bits)
                       + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (tsel[ci] << 4) | tsel[ci]])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += body
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def sniff_media_type(blob: bytes) -> str | None:
    """Identify a decodable payload by magic bytes; None if unknown."""
    if blob[:2] == b"BM":
        return "image/bmp"
    if blob[: len(_PNG_SIG)] == _PNG_SIG:
        return "image/png"
    if blob[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if blob[:2] == b"P6":
        return "image/x-portable-pixmap"
    if blob[:2] == b"P5":
        return "image/x-portable-graymap"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "audio/wav"
    return None


def sniff_and_decode_image(blob: bytes) -> np.ndarray | None:
    """Decode BMP/PNG/JPEG/PPM/PGM payloads to an (H, W, 3) uint8 RGB
    raster; None when the magic is not a format this module handles
    (the caller then falls back to its stub policy)."""
    kind = sniff_media_type(blob)
    if kind == "image/bmp":
        return decode_bmp(blob)
    if kind == "image/jpeg":
        px = decode_jpeg(blob)
        if px.shape[2] == 1:
            return np.repeat(px, 3, axis=2)
        return px
    if kind == "image/gif":
        return decode_gif(blob)
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

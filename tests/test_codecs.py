"""Dependency-free codec tests (pipeline/codecs.py) + the real-decode
wiring in pipeline/multimodal.py.

Golden-byte checks build payloads by hand from the format specs (not
with our own encoder), so encoder and decoder cannot share a bug.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from anomaly_detection_spark.pipeline import codecs, multimodal


def _rng(seed=7):
    return np.random.default_rng(seed)


# --- BMP -------------------------------------------------------------------

def test_bmp_roundtrip_odd_width():
    # width 5 -> row stride 16 (15 data + 1 pad): exercises padding
    img = _rng().integers(0, 256, (3, 5, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(img)), img)


def test_bmp_golden_hand_built_bottom_up():
    # 2x2 24-bit BMP built from the spec: bottom-up rows, BGR, 4-byte
    # row padding (2*3=6 -> stride 8)
    px = {  # (row, col) -> RGB
        (0, 0): (255, 0, 0), (0, 1): (0, 255, 0),
        (1, 0): (0, 0, 255), (1, 1): (10, 20, 30),
    }
    def bgr(rc):
        r, g, b = px[rc]
        return bytes([b, g, r])
    raster = (bgr((1, 0)) + bgr((1, 1)) + b"\x00\x00"   # bottom row first
              + bgr((0, 0)) + bgr((0, 1)) + b"\x00\x00")
    blob = (struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0,
                          len(raster), 0, 0, 0, 0)
            + raster)
    img = codecs.decode_bmp(blob)
    for (r, c), rgb_val in px.items():
        assert tuple(img[r, c]) == rgb_val


def test_bmp_top_down_and_32bit():
    # negative height = top-down; 32bpp rows have no padding (4 | 4*w)
    raster = bytes([1, 2, 3, 9,   4, 5, 6, 9,     # row 0: BGRA BGRA
                    7, 8, 9, 9,   10, 11, 12, 9])  # row 1
    blob = (struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 32, 0,
                          len(raster), 0, 0, 0, 0)
            + raster)
    img = codecs.decode_bmp(blob)
    assert img.shape == (2, 2, 3)
    assert tuple(img[0, 0]) == (3, 2, 1)   # BGR -> RGB, alpha dropped
    assert tuple(img[1, 1]) == (12, 11, 10)


def test_bmp_rejects_compressed_and_palette():
    img = _rng().integers(0, 256, (2, 2, 3), dtype=np.uint8)
    blob = bytearray(codecs.encode_bmp(img))
    struct.pack_into("<I", blob, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError):
        codecs.decode_bmp(bytes(blob))
    blob2 = bytearray(codecs.encode_bmp(img))
    struct.pack_into("<H", blob2, 28, 8)  # 8bpp palette
    with pytest.raises(ValueError):
        codecs.decode_bmp(bytes(blob2))


def test_bmp_truncated_raster_rejected():
    img = _rng().integers(0, 256, (4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        codecs.decode_bmp(codecs.encode_bmp(img)[:-10])


# --- netpbm ----------------------------------------------------------------

def test_ppm_roundtrip_and_comments():
    img = _rng().integers(0, 256, (3, 4, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(img)), img)
    # hand-built header with comments and mixed whitespace
    blob = (b"P6 # comment right after magic\n# another\n 4\t3 #w h\n255\n"
            + img.tobytes())
    assert np.array_equal(codecs.decode_ppm(blob), img)


def test_pgm_roundtrip_and_16bit_rejected():
    g = _rng().integers(0, 256, (5, 2), dtype=np.uint8)
    assert np.array_equal(codecs.decode_pgm(codecs.encode_pgm(g)), g)
    with pytest.raises(ValueError):
        codecs.decode_pgm(b"P5\n2 2\n65535\n" + bytes(8))


# --- WAV -------------------------------------------------------------------

def test_wav_roundtrip_stereo():
    pcm = _rng().integers(-32768, 32768, (100, 2)).astype(np.int16)
    out, rate = codecs.decode_wav(codecs.encode_wav(pcm, 22050))
    assert rate == 22050
    assert np.array_equal(out, pcm)


def test_wav_chunk_walk_and_8bit():
    # LIST chunk before fmt/data, odd-size chunk padding, 8-bit PCM
    samples8 = bytes([0, 128, 255, 64, 192])  # odd size -> pad byte
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE"
            + b"LIST" + struct.pack("<I", 4) + b"INFO"
            + b"data" + struct.pack("<I", len(samples8)) + samples8 + b"\x00"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    out, rate = codecs.decode_wav(blob)
    assert rate == 8000 and out.shape == (5, 1)
    # 8-bit unsigned -> int16: (x-128) << 8
    assert out[:, 0].tolist() == [(-128) << 8, 0, 127 << 8, (-64) << 8, 64 << 8]


def test_wav_non_pcm_rejected():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + bytes(4))
    with pytest.raises(ValueError):
        codecs.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


# --- sniff + multimodal wiring ----------------------------------------------

def test_sniff_dispatch():
    img = _rng().integers(0, 256, (2, 2, 3), dtype=np.uint8)
    assert codecs.sniff_media_type(codecs.encode_bmp(img)) == "image/bmp"
    assert codecs.sniff_media_type(b"plain text") is None
    gray = codecs.sniff_and_decode_image(
        codecs.encode_pgm(img[:, :, 0])
    )
    assert gray.shape == (2, 2, 3)
    assert np.array_equal(gray[:, :, 0], gray[:, :, 2])  # replicated


def test_decode_image_real_path_feeds_resize():
    img = _rng().integers(0, 256, (8, 6, 3), dtype=np.uint8)
    out = multimodal.decode_image_stub(codecs.encode_bmp(img), fake=False)
    assert np.array_equal(out, img)
    small = multimodal.resize_nearest(out, 3, 4)
    assert small.shape == (4, 3, 3)


def test_decode_stub_real_features_image_and_wav():
    img = np.full((4, 4, 3), 255, dtype=np.uint8)
    f = multimodal.decode_stub(codecs.encode_ppm(img), fake=False)
    assert f.shape == (8,)
    assert f[:3] == pytest.approx([1.0, 1.0, 1.0])  # channel means
    assert f[3:6] == pytest.approx([0.0, 0.0, 0.0])  # channel stds
    pcm = np.zeros((50, 1), dtype=np.int16)
    fw = multimodal.decode_stub(codecs.encode_wav(pcm, 16000), fake=False)
    assert fw.shape == (8,)
    assert fw[0] == 0.0 and fw[1] == 0.0            # mean, rms of silence
    assert fw[4] == pytest.approx(16000 / 48000.0)


def test_magic_collision_falls_back_to_stub():
    # a "document" that happens to start with P6 but is not a PPM
    junk = b"P6 is my favorite chess opening, said nobody"
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(junk, fake=False)
    f = multimodal.decode_stub(junk, fake=True)
    assert f.shape == (8,)  # sha256 stub path, not a crash


def test_extract_features_real_bmp_payloads(spark):
    # end-to-end mapInPandas over REAL encoded payloads
    imgs = {i: _rng(i).integers(0, 256, (4, 4, 3), dtype=np.uint8)
            for i in (1, 2, 3)}
    df = spark.createDataFrame(
        [(i, bytearray(codecs.encode_bmp(img))) for i, img in imgs.items()],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in
            multimodal.extract_features(df, fake=False).collect()}
    for i, img in imgs.items():
        expect = img.astype(np.float64).mean(axis=(0, 1)) / 255.0
        assert rows[i].features[:3] == pytest.approx(list(expect))


# --- PNG ---------------------------------------------------------------------


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _hand_png(w, h, color, scanlines: bytes, depth=8, interlace=0) -> bytes:
    """Assemble a PNG from the spec (NOT with encode_png): signature,
    IHDR, one IDAT holding the zlib-compressed filtered scanlines."""
    import zlib
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(scanlines))
            + _png_chunk(b"IEND", b""))


def _ref_unfilter(scanlines, h, stride, bpp):
    """Independent scalar reference unfilter (pure-python ints, spec
    pseudocode transcription) — shares no code with the numpy kernel."""
    out = []
    for y in range(h):
        row = list(scanlines[y * (1 + stride) + 1:(y + 1) * (1 + stride)])
        ft = scanlines[y * (1 + stride)]
        recon = []
        for x in range(stride):
            a = recon[x - bpp] if x >= bpp else 0
            b = out[y - 1][x] if y else 0
            c = out[y - 1][x - bpp] if (y and x >= bpp) else 0
            if ft == 0:
                v = row[x]
            elif ft == 1:
                v = row[x] + a
            elif ft == 2:
                v = row[x] + b
            elif ft == 3:
                v = row[x] + ((a + b) >> 1)
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = row[x] + pr
            recon.append(v & 0xFF)
        out.append(recon)
    return np.array(out, dtype=np.uint8)


def test_png_roundtrip_all_channel_counts():
    for nch in (1, 2, 3, 4):
        img = _rng(nch).integers(0, 256, (5, 4, nch), dtype=np.uint8)
        out = codecs.decode_png(codecs.encode_png(img))
        assert np.array_equal(out, img), f"nch={nch}"


def test_png_all_five_filter_types_match_scalar_reference():
    # 5 rows x 4 px RGB, one row per filter type, random filtered bytes:
    # the numpy unfilter must agree with the spec-pseudocode reference
    w, h, bpp = 4, 5, 3
    stride = w * bpp
    rng = _rng(99)
    scan = bytearray()
    for ft in (0, 1, 2, 3, 4):
        scan.append(ft)
        scan += bytes(rng.integers(0, 256, stride, dtype=np.uint8))
    blob = _hand_png(w, h, 2, bytes(scan))
    got = codecs.decode_png(blob)
    want = _ref_unfilter(bytes(scan), h, stride, bpp).reshape(h, w, bpp)
    assert np.array_equal(got, want)


def test_png_golden_hand_built_sub_filter():
    # 1 row, 3 RGB pixels, Sub filter: raw (10,20,30 | 5,6,7 | 250,250,250)
    # -> recon (10,20,30 | 15,26,37 | 9,20,31)  (mod-256 on the last)
    scan = bytes([1, 10, 20, 30, 5, 6, 7, 250, 250, 250])
    img = codecs.decode_png(_hand_png(3, 1, 2, scan))
    assert img.tolist() == [[[10, 20, 30], [15, 26, 37], [9, 20, 31]]]


def test_png_rejections():
    img = _rng(1).integers(0, 256, (2, 2, 3), dtype=np.uint8)
    good = codecs.encode_png(img)
    # corrupt one IDAT byte: CRC check must fire
    bad = bytearray(good)
    bad[45] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        codecs.decode_png(bytes(bad))
    with pytest.raises(ValueError, match="interlaced"):
        codecs.decode_png(_hand_png(2, 1, 2, bytes(7), interlace=1))
    with pytest.raises(ValueError, match="16-bit"):
        codecs.decode_png(_hand_png(2, 1, 2, bytes(13), depth=16))
    with pytest.raises(ValueError, match="palette"):
        codecs.decode_png(_hand_png(2, 1, 3, bytes(3)))
    with pytest.raises(ValueError, match="size mismatch"):
        codecs.decode_png(_hand_png(3, 2, 2, bytes(5)))


def test_png_sniff_and_rgb_normalization():
    gray = _rng(2).integers(0, 256, (3, 3), dtype=np.uint8)
    blob = codecs.encode_png(gray)
    assert codecs.sniff_media_type(blob) == "image/png"
    rgb = codecs.sniff_and_decode_image(blob)
    assert rgb.shape == (3, 3, 3)
    assert np.array_equal(rgb[:, :, 0], gray)
    assert np.array_equal(rgb[:, :, 1], gray)
    rgba = _rng(3).integers(0, 256, (2, 2, 4), dtype=np.uint8)
    out = codecs.sniff_and_decode_image(codecs.encode_png(rgba))
    assert np.array_equal(out, rgba[:, :, :3])  # alpha dropped


def test_png_feeds_real_feature_path():
    img = _rng(4).integers(0, 256, (4, 4, 3), dtype=np.uint8)
    f = multimodal.decode_stub(codecs.encode_png(img), fake=False)
    expect = img.astype(np.float64).mean(axis=(0, 1)) / 255.0
    assert f[:3] == pytest.approx(list(expect))


# --- JPEG (baseline DCT) -----------------------------------------------------

def _ones_q():
    q = np.ones((8, 8), dtype=np.int64)
    return (q, q)


def _tile_constant(tiles: np.ndarray) -> np.ndarray:
    """Expand a (ty, tx) uint8 tile-value grid to (8ty, 8tx) pixels."""
    return np.kron(tiles, np.ones((8, 8), dtype=np.uint8))


def test_jpeg_gray_block_constant_exact_q1():
    tiles = _rng(11).integers(0, 256, (4, 4), dtype=np.uint8)
    img = _tile_constant(tiles)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(img, quant_tables=_ones_q()))
    assert dec.shape == (32, 32, 1)
    assert np.array_equal(dec[:, :, 0], img)


def test_jpeg_gray_block_constant_exact_q90_standard_tables():
    # DC quant step at q90 is 3 < 8, so the block-constant law still
    # gives an EXACT uint8 round trip through the real Annex K path
    tiles = _rng(12).integers(0, 256, (2, 5), dtype=np.uint8)
    img = _tile_constant(tiles)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=90))
    assert np.array_equal(dec[:, :, 0], img)


def test_jpeg_non_multiple_of_8_dims_tile_constant_exact():
    # edge padding replicates pixels from the same aligned tile, so the
    # constancy (and hence exactness) survives partial border blocks
    tiles = _rng(13).integers(0, 256, (4, 3), dtype=np.uint8)
    img = _tile_constant(tiles)[:27, :21]
    dec = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=90))
    assert dec.shape == (27, 21, 1)
    assert np.array_equal(dec[:, :, 0], img)


def test_jpeg_color_444_smooth_gradient_bounded_error():
    h, w = 40, 56
    row = np.linspace(30, 220, w)
    img = np.stack(
        [np.tile(row, (h, 1)), np.tile(row[::-1], (h, 1)),
         np.full((h, w), 128.0)], axis=2
    ).astype(np.uint8)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=95))
    assert dec.shape == (h, w, 3)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 4


def test_jpeg_420_constant_color_exact_and_smooth_bounded():
    const = np.zeros((24, 24, 3), np.uint8)
    const[:, :, 0], const[:, :, 1], const[:, :, 2] = 200, 100, 50
    dec = codecs.decode_jpeg(
        codecs.encode_jpeg(const, quality=95, subsample_420=True)
    )
    assert np.abs(dec.astype(int) - const.astype(int)).max() <= 1
    h, w = 22, 30  # odd-ish dims force chroma padding + upsample crop
    row = np.linspace(60, 200, w)
    smooth = np.stack([np.tile(row, (h, 1))] * 3, axis=2).astype(np.uint8)
    dec2 = codecs.decode_jpeg(
        codecs.encode_jpeg(smooth, quality=95, subsample_420=True)
    )
    assert dec2.shape == (h, w, 3)
    assert np.abs(dec2.astype(int) - smooth.astype(int)).max() <= 8


def test_jpeg_restart_intervals_match_unrestarted():
    tiles = _rng(14).integers(0, 256, (3, 4), dtype=np.uint8)
    img = _tile_constant(tiles)
    plain = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=85))
    rst = codecs.encode_jpeg(img, quality=85, restart_interval=2)
    assert b"\xff\xdd" in rst and b"\xff\xd0" in rst  # DRI + RST0 present
    assert np.array_equal(codecs.decode_jpeg(rst), plain)


def _hand_jpeg(entropy: bytes, dc_val: int = 4) -> bytes:
    """Hand-assemble a minimal 8x8 grayscale baseline JPEG with all-1
    quant tables and trivial one-symbol Huffman tables (DC: symbol
    ``dc_val`` on code '0'; AC: EOB on code '0') — built from the T.81
    spec, NOT with encode_jpeg, so the decoder is checked
    independently."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([1] * 64)
    out += b"\xff\xc0" + struct.pack(">H", 11) + bytes([8]) \
        + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    bits1 = bytes([1] + [0] * 15)
    out += b"\xff\xc4" + struct.pack(">H", 20) + bytes([0x00]) + bits1 \
        + bytes([dc_val])
    out += b"\xff\xc4" + struct.pack(">H", 20) + bytes([0x10]) + bits1 \
        + bytes([0x00])
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_golden_hand_built_positive_dc():
    # bits: DC code '0', category 4, magnitude 1000 (=+8), AC EOB '0'
    # -> 0 1000 0 + pad 11 = 0x43; DC=8, IDCT -> 8/8 + 128 = 129
    img = codecs.decode_jpeg(_hand_jpeg(bytes([0x43])))
    assert img.shape == (8, 8, 1)
    assert (img == 129).all()


def test_jpeg_golden_hand_built_negative_dc():
    # 0 0111 0 + pad 11 = 0x3B; receive 7 < 8 -> extend to -8 -> 127
    img = codecs.decode_jpeg(_hand_jpeg(bytes([0x3B])))
    assert (img == 127).all()


def test_jpeg_rejects_unsupported_modes():
    tiles = _rng(15).integers(0, 256, (1, 1), dtype=np.uint8)
    blob = bytearray(codecs.encode_jpeg(_tile_constant(tiles)))
    i = blob.index(b"\xff\xc0")
    blob[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        codecs.decode_jpeg(bytes(blob))
    with pytest.raises(ValueError, match="SOI"):
        codecs.decode_jpeg(b"\x00\x01")
    big = _tile_constant(_rng(18).integers(0, 256, (4, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_jpeg(codecs.encode_jpeg(big, quality=90)[:-20])
    q16 = bytearray(_hand_jpeg(bytes([0x43])))
    q16[q16.index(b"\xff\xdb") + 4] = 0x10  # Pq=1: 16-bit table
    with pytest.raises(ValueError, match="16-bit"):
        codecs.decode_jpeg(bytes(q16))


def test_jpeg_standard_tables_are_canonical():
    for bits, vals in (codecs._JPEG_STD_DC_LUMA, codecs._JPEG_STD_DC_CHROMA):
        assert sum(bits) == len(vals) == 12
    for bits, vals in (codecs._JPEG_STD_AC_LUMA, codecs._JPEG_STD_AC_CHROMA):
        assert sum(bits) == len(vals) == 162
    # canonical construction must not overflow any code length
    for bits, vals in (codecs._JPEG_STD_DC_LUMA, codecs._JPEG_STD_DC_CHROMA,
                       codecs._JPEG_STD_AC_LUMA, codecs._JPEG_STD_AC_CHROMA):
        codecs._jpeg_huff_decode_table(bits, vals)


def test_jpeg_sniff_and_rgb_normalization():
    tiles = _rng(16).integers(0, 256, (2, 2), dtype=np.uint8)
    blob = codecs.encode_jpeg(_tile_constant(tiles), quality=90)
    assert codecs.sniff_media_type(blob) == "image/jpeg"
    rgb = codecs.sniff_and_decode_image(blob)
    assert rgb.shape == (16, 16, 3)
    assert np.array_equal(rgb[:, :, 0], _tile_constant(tiles))


def test_jpeg_feeds_real_feature_path():
    tiles = _rng(17).integers(0, 256, (2, 2), dtype=np.uint8)
    img = _tile_constant(tiles)
    f = multimodal.decode_stub(codecs.encode_jpeg(img, quality=90),
                               fake=False)
    expect = img.astype(np.float64).mean() / 255.0
    assert f[0] == pytest.approx(expect)


def test_jpeg_encode_rejects_bad_inputs():
    with pytest.raises(ValueError, match="uint8"):
        codecs.encode_jpeg(np.zeros((4, 4), np.float64))
    with pytest.raises(ValueError, match="degenerate"):
        codecs.encode_jpeg(np.zeros((0, 4), np.uint8))
    with pytest.raises(ValueError, match="quality"):
        codecs.encode_jpeg(np.zeros((4, 4), np.uint8), quality=0)


# --- GIF (LZW) ---------------------------------------------------------------

def test_gif_roundtrip_small_palette():
    rng = _rng(21)
    idx = rng.integers(0, 7, (13, 21), dtype=np.uint8)
    pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    img = codecs.decode_gif(codecs.encode_gif(idx, pal))
    assert np.array_equal(img, pal[idx.astype(int)])


def test_gif_roundtrip_256_colors_hits_12bit_codes():
    # 80x90 random 256-color noise grows the LZW dictionary past
    # 4096 entries, forcing the 12-bit cap + mid-stream clear path
    rng = _rng(22)
    idx = rng.integers(0, 256, (80, 90), dtype=np.uint8)
    pal = np.arange(256, dtype=np.uint8)[:, None].repeat(3, axis=1)
    img = codecs.decode_gif(codecs.encode_gif(idx, pal))
    assert np.array_equal(img[:, :, 0], idx)


def _hand_gif() -> bytes:
    """Hand-assemble a 2x1 two-color GIF from the 89a spec (header,
    LSD + 2-entry GCT, image descriptor, min-code 2, LZW codes
    [clear=4, 0, 1, end=5] packed LSB-first = 0x44 0x0A) — built
    WITHOUT encode_gif, so the decoder is checked independently."""
    return (
        b"GIF89a"
        + struct.pack("<HH", 2, 1)
        + bytes([0x80, 0, 0])            # GCT present, 2 entries
        + bytes([10, 20, 30, 200, 210, 220])  # palette
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 1) + b"\x00"
        + bytes([2])                      # LZW min code size
        + bytes([2, 0x44, 0x0A])          # one 2-byte data sub-block
        + b"\x00\x3b"
    )


def test_gif_golden_hand_built():
    img = codecs.decode_gif(_hand_gif())
    assert img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [10, 20, 30]
    assert img[0, 1].tolist() == [200, 210, 220]


def test_gif_interlaced_roundtrip():
    # interlace is decode-only: permute rows into pass order by hand
    # around the encoder's output, then flip the interlace bit
    rng = _rng(23)
    idx = rng.integers(0, 16, (11, 5), dtype=np.uint8)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    rows = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        rows.extend(range(start, 11, step))
    blob = bytearray(codecs.encode_gif(idx[np.array(rows)], pal))
    # image descriptor starts right after 6+7+GCT(16*3); packed byte is
    # its 10th byte (0x2c + 4 u16 + packed)
    dpos = 6 + 7 + 48
    assert blob[dpos] == 0x2C
    blob[dpos + 9] |= 0x40
    img = codecs.decode_gif(bytes(blob))
    assert np.array_equal(img, pal[idx.astype(int)])


def test_gif_rejects_bad_streams():
    with pytest.raises(ValueError, match="not a GIF"):
        codecs.decode_gif(b"NOPE")
    with pytest.raises(ValueError, match="no image data"):
        codecs.decode_gif(b"GIF89a" + struct.pack("<HH", 1, 1)
                          + bytes([0, 0, 0]) + b"\x3b")
    bad = bytearray(_hand_gif())
    bad[-3] = 0x07  # corrupt a data byte -> dangling LZW code
    with pytest.raises(ValueError, match="GIF"):
        codecs.decode_gif(bytes(bad))
    with pytest.raises(ValueError, match="palette"):
        codecs.encode_gif(np.zeros((2, 2), np.uint8), np.zeros((1, 3), np.uint8))
    with pytest.raises(ValueError, match="outside palette"):
        codecs.encode_gif(np.full((2, 2), 9, np.uint8),
                          np.zeros((4, 3), np.uint8))


def test_gif_sniff_and_dispatch():
    blob = _hand_gif()
    assert codecs.sniff_media_type(blob) == "image/gif"
    assert codecs.sniff_and_decode_image(blob).shape == (1, 2, 3)


# --- G.711 companding --------------------------------------------------------

def test_g711_codebook_idempotence():
    b = np.arange(256, dtype=np.uint8)
    # A-law: encode(decode(code)) == code for ALL 256 codes
    assert np.array_equal(codecs.alaw_encode(codecs.alaw_decode(b)), b)
    # u-law: same, except 0x7F (negative zero) which canonicalizes to
    # 0xFF (positive zero) — the known G.711 +-0 artifact
    out = codecs.ulaw_encode(codecs.ulaw_decode(b))
    mism = np.where(out != b)[0]
    assert mism.tolist() == [0x7F]
    assert codecs.ulaw_decode(np.array([0x7F], np.uint8))[0] == 0
    assert out[0x7F] == 0xFF


def test_g711_wav_roundtrip_both_laws():
    rng = _rng(24)
    for law, dec_fn in (("ulaw", codecs.ulaw_decode),
                        ("alaw", codecs.alaw_decode)):
        # start from decoder-image PCM so companding is exact
        pcm = dec_fn(rng.integers(0, 256, 600, dtype=np.uint8)).reshape(-1, 2)
        got, rate = codecs.decode_wav(
            codecs.encode_wav_g711(pcm, 8000, law)
        )
        assert rate == 8000 and np.array_equal(got, pcm)


def test_g711_wav_feeds_real_feature_path():
    pcm = codecs.ulaw_decode(np.arange(0, 250, dtype=np.uint8))[:, None]
    f = multimodal.decode_stub(
        codecs.encode_wav_g711(pcm, 8000, "ulaw"), fake=False
    )
    x = pcm.astype(np.float64) / 32768.0
    assert f[0] == pytest.approx(float(x.mean()))


def test_g711_monotone_decode():
    # each law's decode must be monotone over the positive code range
    # (magnitude grows with segment) — a transcription-error tripwire
    pos_u = codecs.ulaw_decode(np.arange(0x80, 0x100, dtype=np.uint8)[::-1])
    assert (np.diff(pos_u.astype(int)) >= 0).all()
    pos_a = codecs.alaw_decode(
        (np.arange(0x80) ^ 0x55).astype(np.uint8) | 0x80
    )
    assert pos_a.min() >= 0

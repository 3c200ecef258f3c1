"""WebP VP8L codec: lossless round-trips over every encoder feature,
hand-crafted streams for the decoder-only paths (neighbor distance map,
meta prefix groups, code-length repeats, max_symbol trim), and the
decode_image / perceptual / Spark pixel-stats wiring."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from metadata_crawler_spark.operators.webp_codec import (
    _BitReader,
    _BitWriter,
    _SymbolWriter,
    _lz77_split,
    _read_prefix_code,
    _riff_wrap,
    _write_prefix_code,
    decode_webp,
    encode_webp,
)


def _rt(arr: np.ndarray, **kw) -> None:
    out = decode_webp(encode_webp(arr, **kw))
    assert out.dtype == np.uint8
    assert out.shape == arr.shape
    assert np.array_equal(out, arr), kw


def _rand(shape, seed=7):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


# ---------------------------------------------------------------------------
# encoder-feature round trips (lossless => exact equality)
# ---------------------------------------------------------------------------


def test_literal_rgb_rgba_roundtrip():
    _rt(_rand((13, 17, 3)))
    _rt(_rand((8, 9, 4), seed=1))


def test_single_color_and_tiny_dims():
    _rt(np.full((5, 6, 3), 123, np.uint8))
    _rt(np.array([[[1, 2, 3]]], np.uint8))
    _rt(_rand((1, 37, 3)), )
    _rt(_rand((37, 1, 4)))


def test_subtract_green_roundtrip():
    _rt(_rand((12, 10, 3)), subtract_green=True)
    _rt(_rand((7, 7, 4), seed=2), subtract_green=True)


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_all_modes_roundtrip(mode):
    _rt(_rand((11, 14, 3), seed=mode), predictor=True, predictor_mode=mode,
        predictor_bits=2)


def test_color_transform_roundtrip():
    img = _rand((10, 13, 3), seed=3)
    for ct in [(16, 0, 0), (0, -10, 0), (0, 0, 33), (-128, 127, -1)]:
        _rt(img, color_transform=ct)


def test_stacked_transforms_cache_lz77():
    img = _rand((9, 12, 4), seed=4)
    _rt(img, subtract_green=True, color_transform=(12, -4, 9),
        predictor=True, predictor_mode=11, cache_bits=5)
    runs = np.repeat(_rand((6, 5, 3), seed=5), 7, axis=1)
    _rt(runs, lz77_runs=True)
    _rt(runs, lz77_runs=True, cache_bits=6)
    _rt(runs, subtract_green=True, predictor=True, lz77_runs=True)


def test_color_cache_all_sizes():
    img = _rand((8, 8, 3), seed=6)
    for bits in (1, 4, 11):
        _rt(img, cache_bits=bits)


@pytest.mark.parametrize("ncol,w", [(2, 13), (4, 7), (16, 9), (3, 8), (200, 15)])
def test_palette_roundtrip_packing_widths(ncol, w):
    rng = np.random.default_rng(ncol * 100 + w)
    colors = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    _rt(colors[rng.integers(0, ncol, (5, w))], palette=True)


def test_palette_rgba_and_too_many_colors():
    rng = np.random.default_rng(0)
    colors = rng.integers(0, 256, (30, 4), dtype=np.uint8)
    _rt(colors[rng.integers(0, 30, (9, 9))], palette=True)
    with pytest.raises(ValueError, match="256 distinct"):
        encode_webp(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8),
                    palette=True)


# ---------------------------------------------------------------------------
# hand-crafted streams: decoder paths the fixture encoder never emits
# ---------------------------------------------------------------------------


def _stream_header(bw: _BitWriter, w: int, h: int, alpha: int = 0) -> None:
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(alpha, 1)
    bw.write(0, 3)


def test_distance_map_matches_spec_plane_code_grid():
    """The derived distance map must equal the spec's published table.
    Independent pin: the spec/libwebp expresses the same mapping as a
    plane-code lookup grid (8 rows x 16 columns, y in 0..7, screen
    x-offset in -8..7); that grid is a permutation of 0..119 plus eight
    invalid cells — a strong self-checksum — and inverting it yields the
    table in code order."""
    from metadata_crawler_spark.operators.webp_codec import _DIST_MAP

    lut = [
        96, 73, 55, 39, 23, 13, 5, 1, 255, 255, 255, 255, 255, 255, 255, 255,
        101, 78, 58, 42, 26, 16, 8, 2, 0, 3, 9, 17, 27, 43, 59, 79,
        102, 86, 62, 46, 32, 20, 10, 6, 4, 7, 11, 21, 33, 47, 63, 87,
        105, 90, 70, 52, 37, 28, 18, 14, 12, 15, 19, 29, 38, 53, 71, 91,
        110, 99, 82, 66, 48, 35, 30, 24, 22, 25, 31, 36, 49, 67, 83, 100,
        115, 108, 94, 76, 64, 50, 44, 40, 34, 41, 45, 51, 65, 77, 95, 109,
        118, 113, 103, 92, 80, 68, 60, 56, 54, 57, 61, 69, 81, 93, 104, 114,
        119, 116, 111, 106, 97, 88, 84, 74, 72, 75, 85, 89, 98, 107, 112, 117,
    ]
    vals = [v for v in lut if v != 255]
    assert sorted(vals) == list(range(120))  # the checksum
    table = [None] * 120
    for idx, v in enumerate(lut):
        if v == 255:
            continue
        y, x_lut = divmod(idx, 16)
        table[v] = (-(x_lut - 8), y)  # screen offset -> backward offset
    assert list(_DIST_MAP) == table


def test_neighbor_distance_map():
    """dist_code 1 => (0, 1) => the pixel directly above: craft a 4x2
    image whose second row is an LZ77 copy of the first via the
    close-neighbor map (the encoder only emits the plain >120 form)."""
    w, h = 4, 2
    row = [(255, 10, 20, 30), (255, 40, 50, 60), (255, 70, 80, 90),
           (255, 5, 6, 7)]  # ARGB
    bw = _BitWriter()
    _stream_header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    g_w, r_w, b_w, a_w, d_w = (_SymbolWriter() for _ in range(5))
    for a, r, g, b in row:
        g_w.add(g); r_w.add(r); b_w.add(b); a_w.add(a)
    lsym, lextra, lnbits = _lz77_split(4)  # copy length 4
    g_w.add(256 + lsym, lextra, lnbits)
    dsym, dextra, dnbits = _lz77_split(1)  # dist_code 1 -> neighbor map
    d_w.add(dsym, dextra, dnbits)
    g_codes = _write_prefix_code(bw, g_w.freqs, 280)
    r_codes = _write_prefix_code(bw, r_w.freqs, 256)
    b_codes = _write_prefix_code(bw, b_w.freqs, 256)
    a_codes = _write_prefix_code(bw, a_w.freqs, 256)
    d_codes = _write_prefix_code(bw, d_w.freqs, 40)
    for a, r, g, b in row:
        c, cl = g_codes[g]; bw.write_code(c, cl)
        c, cl = r_codes[r]; bw.write_code(c, cl)
        c, cl = b_codes[b]; bw.write_code(c, cl)
        c, cl = a_codes[a]; bw.write_code(c, cl)
    c, cl = g_codes[256 + lsym]; bw.write_code(c, cl)
    if lnbits:
        bw.write(lextra, lnbits)
    c, cl = d_codes[dsym]; bw.write_code(c, cl)
    if dnbits:
        bw.write(dextra, dnbits)
    out = decode_webp(_riff_wrap(bw.bytes()))
    assert out.shape == (2, 4, 3)
    assert np.array_equal(out[1], out[0])  # second row copied from above
    assert tuple(out[0, 0]) == (10, 20, 30)


def test_neighbor_distance_map_far_code():
    """Tail of the map (dist_code 97 = (8, 0) = 8 pixels back): the far
    codes the fixture encoder never emits still decode correctly."""
    w, h = 12, 1
    row = [(255, 10 * i, 10 * i + 1, 10 * i + 2) for i in range(8)]
    bw = _BitWriter()
    _stream_header(bw, w, h)
    bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    g_w, r_w, b_w, a_w, d_w = (_SymbolWriter() for _ in range(5))
    for a, r, g, b in row:
        g_w.add(g); r_w.add(r); b_w.add(b); a_w.add(a)
    lsym, lextra, lnbits = _lz77_split(4)
    g_w.add(256 + lsym, lextra, lnbits)
    dsym, dextra, dnbits = _lz77_split(97)  # (8, 0) -> dist 8
    d_w.add(dsym, dextra, dnbits)
    g_codes = _write_prefix_code(bw, g_w.freqs, 280)
    r_codes = _write_prefix_code(bw, r_w.freqs, 256)
    b_codes = _write_prefix_code(bw, b_w.freqs, 256)
    a_codes = _write_prefix_code(bw, a_w.freqs, 256)
    d_codes = _write_prefix_code(bw, d_w.freqs, 40)
    for a, r, g, b in row:
        for codes, sym in ((g_codes, g), (r_codes, r), (b_codes, b), (a_codes, a)):
            c, cl = codes[sym]; bw.write_code(c, cl)
    c, cl = g_codes[256 + lsym]; bw.write_code(c, cl)
    if lnbits:
        bw.write(lextra, lnbits)
    c, cl = d_codes[dsym]; bw.write_code(c, cl)
    if dnbits:
        bw.write(dextra, dnbits)
    out = decode_webp(_riff_wrap(bw.bytes()))
    assert out.shape == (1, 12, 3)
    assert np.array_equal(out[0, 8:12], out[0, 0:4])  # copied from 8 back


def test_meta_prefix_two_groups():
    """Entropy image splits the image into two 8px-tile prefix groups;
    each group's codes only know its own half's symbols, so decoding
    proves the per-tile group dispatch."""
    w, h = 16, 8
    left = (255, 1, 2, 3)
    right = (255, 200, 201, 202)
    bw = _BitWriter()
    _stream_header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta prefix present
    bw.write(3 - 2, 3)  # meta_bits = 3 => 8px tiles => entropy image 2x1
    # entropy sub-image: pixels (A, R, G, B) with group idx in green
    from metadata_crawler_spark.operators.webp_codec import _encode_subimage

    epx = np.array([[255, 0, 0, 0], [255, 0, 1, 0]], dtype=np.uint8)
    _encode_subimage(bw, epx, 2)
    # two groups: group 0 codes only `left`, group 1 only `right`
    for pix in (left, right):
        a, r, g, b = pix
        g_codes = _write_prefix_code(bw, {g: 1}, 280)
        r_codes = _write_prefix_code(bw, {r: 1}, 256)
        b_codes = _write_prefix_code(bw, {b: 1}, 256)
        a_codes = _write_prefix_code(bw, {a: 1}, 256)
        _write_prefix_code(bw, {}, 40)
    # all single-symbol codes -> zero data bits; the image is fully
    # determined by the group dispatch
    out = decode_webp(_riff_wrap(bw.bytes()))
    assert out.shape == (8, 16, 3)
    assert np.array_equal(out[:, :8], np.broadcast_to((1, 2, 3), (8, 8, 3)))
    assert np.array_equal(
        out[:, 8:], np.broadcast_to((200, 201, 202), (8, 8, 3))
    )


def test_code_length_repeats_16_17_18():
    """Prefix-code definition using the RLE code-length symbols: 256
    symbols of length 8 written as one literal + 16-repeats, zeros via
    17/18."""
    bw = _BitWriter()
    bw.write(0, 1)  # not simple
    bw.write(19 - 4, 4)
    # clc lengths: 8->1, 16->2, 17->3, 18->3 (Kraft: 1/2+1/4+1/8+1/8=1)
    clc_len = {8: 1, 16: 2, 17: 3, 18: 3}
    for s in (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15):
        bw.write(clc_len.get(s, 0), 3)
    bw.write(0, 1)  # no max_symbol trim
    # canonical codes over {8,16,17,18} sorted by (len, symbol):
    # 8 -> 0 (1 bit); 16 -> 10 (2); 17 -> 110 (3); 18 -> 111 (3)
    def emit(sym):
        bw.write_code({8: 0, 16: 0b10, 17: 0b110, 18: 0b111}[sym],
                      clc_len[sym])

    emit(8)  # symbol 0: length 8
    n = 1
    while n < 256:  # 16-repeat fills with prev length (8)
        emit(16)
        rep = min(6, 256 - n)
        bw.write(rep - 3, 2)
        n += rep
    # explicit zero tail for symbols 256..279: one 17 (3+0) + one 18 (11+7)
    emit(17); bw.write(3, 3)   # 6 zeros
    emit(18); bw.write(7, 7)   # 18 zeros => 24 total
    code = _read_prefix_code(_BitReader(bw.bytes()), 280)
    # all 256 literals decodable at 8 bits, canonical order
    br = _BitReader(bytes([0x00]))  # code 00000000 -> symbol 0
    assert code.decode(br) == 0


def test_max_symbol_trim():
    """The explicit max_symbol field stops the length loop early;
    remaining symbols default to unused."""
    bw = _BitWriter()
    bw.write(0, 1)  # not simple
    bw.write(19 - 4, 4)
    clc_len = {0: 1, 1: 1}
    for s in (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15):
        bw.write(clc_len.get(s, 0), 3)
    bw.write(1, 1)  # use max_symbol
    bw.write(0, 3)  # length_nbits = 2
    bw.write(0, 2)  # max_symbol = 2
    # emit two '1' lengths: clc canonical: 0 -> 0, 1 -> 1
    bw.write_code(1, 1)
    bw.write_code(1, 1)
    code = _read_prefix_code(_BitReader(bw.bytes()), 280)
    br = _BitReader(bytes([0b10]))  # LSB-first: bits 0 then 1
    assert code.decode(br) == 0
    assert code.decode(br) == 1


# ---------------------------------------------------------------------------
# error handling
# ---------------------------------------------------------------------------


def test_corrupt_inputs_raise():
    img = _rand((6, 6, 3))
    blob = encode_webp(img)
    with pytest.raises(ValueError):
        decode_webp(blob[:20])  # truncated
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00WAVE")  # wrong RIFF form
    with pytest.raises(ValueError, match="VP8L"):
        decode_webp(blob[:12] + b"XXXX" + blob[16:])  # no image chunk
    # lossy VP8 names the honest stub
    lossy = (b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8 "
             + struct.pack("<I", 4) + b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="lossy"):
        decode_webp(lossy)


def test_incomplete_prefix_code_rejected():
    bw = _BitWriter()
    _stream_header(bw, 2, 1)
    bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    # green code: normal path, two symbols at length 2 (Kraft 1/2 != 1)
    bw.write(0, 1)
    bw.write(19 - 4, 4)
    clc_len = {0: 1, 2: 1}
    for s in (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15):
        bw.write(clc_len.get(s, 0), 3)
    bw.write(1, 1)  # max_symbol trim so we only write 2 lengths
    bw.write(0, 3)
    bw.write(0, 2)
    bw.write_code(1, 1)  # symbol 0: length 2
    bw.write_code(1, 1)  # symbol 1: length 2
    with pytest.raises(ValueError, match="incomplete"):
        decode_webp(_riff_wrap(bw.bytes()))


# ---------------------------------------------------------------------------
# wiring: decode_image dispatch, perceptual identity, Spark stats
# ---------------------------------------------------------------------------


def test_decode_image_dispatch_and_probe_agreement():
    from metadata_crawler_spark.operators.media_probe import probe_media
    from metadata_crawler_spark.operators.multimodal import decode_image

    img = _rand((24, 31, 3), seed=9)
    blob = encode_webp(img, subtract_green=True, cache_bits=4)
    out = decode_image(blob)
    assert np.array_equal(out, img)
    p = probe_media(blob)
    assert (p["width"], p["height"]) == (31, 24)  # header probe agrees


def test_perceptual_hash_png_webp_identical():
    from metadata_crawler_spark.operators.multimodal import encode_png
    from metadata_crawler_spark.operators.perceptual import dhash64
    from metadata_crawler_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    # smooth it so dhash bits are spatially meaningful
    img = (base.astype(np.int32) + np.roll(base, 1, 0) + np.roll(base, 1, 1)
           ).astype(np.uint8)
    png = encode_png(img)
    webp = encode_webp(img, predictor=True)
    assert dhash64(decode_image(png)) == dhash64(decode_image(webp))


def test_spark_media_pixel_stats_webp(spark):
    from metadata_crawler_spark.operators.multimodal import media_pixel_stats

    img = _rand((16, 12, 3), seed=10)
    rows = [
        (1, bytearray(encode_webp(img, cache_bits=3))),
        (2, bytearray(b"RIFF\x08\x00\x00\x00WEBPVP8 ")),  # lossy: ok=False
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    out = {r.media_id: r for r in media_pixel_stats(df).collect()}
    assert out[1].ok and (out[1].width, out[1].height) == (12, 16)
    assert out[1].fmt == "webp"
    assert abs(out[1].px_mean - float(img.mean())) < 1e-4
    assert not out[2].ok

"""Property-based fuzz tests (hypothesis) for the pure-Python surfaces.

The hand-rolled codec stack (PNG/GIF/FLAC/WebP-lossless/JPEG) and the
URL/PSL canonicalizers are exactly the code where example-based tests
miss edge shapes: odd dimensions, extreme values, pathological strings.
Every property here is engine-independent (no Spark session), so the
whole file runs in seconds and exercises thousands of random inputs.

Reference analog for the invariants: the reference trusts external
libraries for codecs; this repo implements them from the public specs,
so round-trip identity (lossless paths) and idempotence/parity (URL
canonicalization tiers) are the contracts the rest of the engine
builds on (media_pixel_stats, perceptual hashing, seen-set keying).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

FAST = settings(
    max_examples=40,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)


# ---------------------------------------------------------------- PNG

def _np_rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


@st.composite
def _png_arrays(draw):
    h = draw(st.integers(1, 12))
    w = draw(st.integers(1, 12))
    ch = draw(st.sampled_from([0, 2, 3, 4]))  # 0 = grayscale (h, w)
    seed = draw(st.integers(0, 2**31 - 1))
    shape = (h, w) if ch == 0 else (h, w, ch)
    return _np_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


@FAST
@given(
    arr=_png_arrays(),
    filter_type=st.integers(0, 4),
    interlace=st.booleans(),
)
def test_png_roundtrip_fuzz(arr, filter_type, interlace):
    from metadata_crawler_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    got = decode_png(encode_png(arr, filter_type=filter_type,
                                interlace=interlace))
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, arr)


# ---------------------------------------------------------------- GIF

@FAST
@given(
    n=st.integers(1, 3),
    h=st.integers(1, 10),
    # w == 3 is excluded: encode_gif's documented shape heuristic reads
    # an (n, h, 3) array as one RGB frame, not a w=3 grayscale animation
    w=st.integers(1, 10).filter(lambda w: w != 3),
    seed=st.integers(0, 2**31 - 1),
    compress=st.booleans(),
    interlace=st.booleans(),
)
def test_gif_gray_roundtrip_fuzz(n, h, w, seed, compress, interlace):
    from metadata_crawler_spark.operators.gif_codec import (
        decode_gif,
        encode_gif,
    )

    frames = _np_rng(seed).integers(0, 256, size=(n, h, w), dtype=np.uint8)
    got, _delays = decode_gif(
        encode_gif(frames, compress=compress, interlace=interlace)
    )
    # grayscale input maps onto the 256-gray palette: RGB out, R==G==B
    assert got.shape == (n, h, w, 3)
    np.testing.assert_array_equal(got[..., 0], frames)
    np.testing.assert_array_equal(got[..., 1], frames)
    np.testing.assert_array_equal(got[..., 2], frames)


@FAST
@given(
    h=st.integers(1, 10),
    w=st.integers(2, 10),
    n_colors=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
    compress=st.booleans(),
)
def test_gif_rgb_roundtrip_fuzz(h, w, n_colors, seed, compress):
    from metadata_crawler_spark.operators.gif_codec import (
        decode_gif,
        encode_gif,
    )

    rng = _np_rng(seed)
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(h, w))
    rgb = palette[idx]
    got, _ = decode_gif(encode_gif(rgb, compress=compress))
    assert got.shape == (1, h, w, 3)
    np.testing.assert_array_equal(got[0], rgb)


# --------------------------------------------------------------- FLAC

@st.composite
def _flac_cases(draw):
    n_ch = draw(st.integers(1, 2))
    # total samples: exercise partial final blocks too
    n = draw(st.integers(1, 700))
    seed = draw(st.integers(0, 2**31 - 1))
    mode = draw(st.sampled_from(
        ["verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4"]
    ))
    stereo = (
        draw(st.sampled_from(["indep", "left_side", "right_side", "mid_side"]))
        if n_ch == 2
        else "indep"
    )
    rice = draw(st.integers(0, 10))
    part_order = draw(st.sampled_from([0, 1, 2]))
    rng = _np_rng(seed)
    # smooth-ish signal keeps fixed-predictor residuals in rice range
    # while still hitting negatives / extremes via the random walk
    x = np.cumsum(
        rng.integers(-300, 301, size=(n, n_ch)), axis=0
    ).astype(np.int64)
    x = np.clip(x, -(1 << 15), (1 << 15) - 1)
    return x, mode, stereo, rice, part_order


@FAST
@given(case=_flac_cases())
def test_flac_roundtrip_fuzz(case):
    from metadata_crawler_spark.operators.flac_codec import (
        decode_flac,
        encode_flac,
    )

    x, mode, stereo, rice, part_order = case
    blob = encode_flac(
        x,
        mode=mode,
        stereo_mode=stereo,
        rice_param=rice,
        part_order=part_order,
        block_size=256,
    )
    y, rate = decode_flac(blob)
    yi = np.round(y * (1 << 15)).astype(np.int64)
    assert yi.shape == x.shape
    np.testing.assert_array_equal(yi, x)


# ------------------------------------------------------ WebP lossless

@st.composite
def _webp_cases(draw):
    h = draw(st.integers(1, 10))
    w = draw(st.integers(1, 10))
    ch = draw(st.sampled_from([3, 4]))
    seed = draw(st.integers(0, 2**31 - 1))
    arr = _np_rng(seed).integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    flags = draw(
        st.fixed_dictionaries(
            {
                "subtract_green": st.booleans(),
                "predictor": st.booleans(),
                "cache_bits": st.sampled_from([0, 2]),
                "lz77_runs": st.booleans(),
            }
        )
    )
    if flags["predictor"]:
        flags["predictor_mode"] = draw(st.integers(0, 13))
    return arr, flags


@FAST
@given(case=_webp_cases())
def test_webp_lossless_roundtrip_fuzz(case):
    from metadata_crawler_spark.operators.webp_codec import (
        decode_webp,
        encode_webp,
    )

    arr, flags = case
    got = decode_webp(encode_webp(arr, **flags))
    # the decoder drops the alpha plane when the header's alpha flag is
    # unset, so RGB in => (h, w, 3) out; RGBA round-trips all 4 planes
    assert got.shape == arr.shape
    np.testing.assert_array_equal(got, arr)


@FAST
@given(
    h=st.integers(1, 8),
    w=st.integers(1, 8),
    n_colors=st.integers(1, 6),
    seed=st.integers(0, 2**31 - 1),
)
def test_webp_palette_roundtrip_fuzz(h, w, n_colors, seed):
    from metadata_crawler_spark.operators.webp_codec import (
        decode_webp,
        encode_webp,
    )

    rng = _np_rng(seed)
    palette = rng.integers(0, 256, size=(n_colors, 4), dtype=np.uint8)
    arr = palette[rng.integers(0, n_colors, size=(h, w))]
    got = decode_webp(encode_webp(arr, palette=True))
    np.testing.assert_array_equal(got, arr)


# ---------------------------------------------------------------- JPEG
# JPEG is lossy: the fuzz contract is structural (shape/dtype/no crash)
# plus a bounded error for quant=1 where only DCT rounding intervenes.

@FAST
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
    progressive=st.booleans(),
)
def test_jpeg_decode_fuzz(h, w, seed, progressive):
    from metadata_crawler_spark.operators.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    # smooth gradient + mild noise: random noise at quant=1 still
    # round-trips within a small bound (DCT is exact on floats; the
    # error budget is quantization rounding + clip)
    yy, xx = np.mgrid[0:h, 0:w]
    rng = _np_rng(seed)
    g = (
        (yy * 3 + xx * 5) % 200 + rng.integers(0, 8, size=(h, w))
    ).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(g, quant=1, progressive=progressive))
    assert got.shape == (h, w)
    assert got.dtype == np.uint8
    assert int(np.abs(got.astype(int) - g.astype(int)).max()) <= 24


# ----------------------------------------------- URL canonicalization

_URLISH = st.one_of(
    # well-formed-ish URLs assembled from parts
    st.builds(
        lambda scheme, host, port, path, q, frag: (
            f"{scheme}://{host}{port}{path}{q}{frag}"
        ),
        st.sampled_from(["http", "HTTP", "https", "HtTpS", "ftp"]),
        st.from_regex(r"[A-Za-z0-9\-]{1,8}(\.[A-Za-z0-9\-]{1,6}){0,3}",
                      fullmatch=True),
        st.sampled_from(["", ":80", ":443", ":8080", ":0"]),
        st.from_regex(r"(/[A-Za-z0-9%~ \.\-_/]{0,12}){0,3}", fullmatch=True),
        st.sampled_from(["", "?b=2&a=1", "?a=%20x", "?x", "?a=+b", "?=v"]),
        st.sampled_from(["", "#frag", "#"]),
    ),
    # raw adversarial text
    st.text(min_size=0, max_size=40),
)


@settings(max_examples=200, deadline=None,
    derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(url=_URLISH)
def test_canon_url_py_idempotent(url):
    from metadata_crawler_spark.functions.urls import canon_url_py

    once = canon_url_py(url)
    assert canon_url_py(once) == once


@settings(max_examples=200, deadline=None,
    derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(url=_URLISH)
def test_canon_batch_matches_reference(url):
    """The vectorized fast path must agree with the pure-Python
    reference canonicalizer on every input (the fast tier is an
    optimization, never a semantic fork)."""
    from metadata_crawler_spark.functions.urls import (
        _canon_batch,
        canon_url_py,
    )

    got = _canon_batch(pd.Series([url])).iloc[0]
    assert got == canon_url_py(url)


# ------------------------------------------------------- PSL domains

_HOSTISH = st.one_of(
    st.from_regex(r"[a-z0-9\-]{1,6}(\.[a-z0-9\-]{1,8}){0,4}", fullmatch=True),
    st.sampled_from([
        "", ".", "com", "example.com", "a.b.ck", "www.ck", "city.kobe.jp",
        "foo.blogspot.com", "x.y.z.blogspot.com", "a..b", ".leading.dot",
        "trailing.dot.",
    ]),
    st.text(st.characters(min_codepoint=33, max_codepoint=126),
            min_size=0, max_size=24),
)


@settings(max_examples=300, deadline=None,
    derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(host=_HOSTISH)
def test_psl_structural_invariants(host):
    from metadata_crawler_spark.functions.domains import (
        py_public_suffix,
        py_registered_domain,
    )

    suf = py_public_suffix(host)
    reg = py_registered_domain(host)
    # the extractor normalizes case and outer dots before matching
    norm = host.strip().strip(".").lower()
    if suf is not None:
        # the suffix is a label-aligned suffix of the normalized host
        assert norm == suf or norm.endswith("." + suf)
    if reg is not None:
        assert suf is not None
        # registered domain = exactly one label + the public suffix
        assert reg.endswith("." + suf) or reg == suf
        assert reg.count(".") == suf.count(".") + 1
        assert norm == reg or norm.endswith("." + reg)
    # idempotence: the registered domain of a registered domain is itself
    if reg is not None:
        assert py_registered_domain(reg) == reg

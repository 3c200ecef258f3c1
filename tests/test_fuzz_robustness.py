"""Adversarial-bytes fuzz: decoders must TERMINATE on corrupt input.

Crawled media is attacker-controlled; ``media_pixel_stats`` maps any
decoder exception to an ok=False row, so the remaining production
hazards are (a) a parse loop that stops advancing (task hang — at
100 TB that's a stuck executor, far worse than a bad row) and (b) an
allocation driven by a corrupt header instead of the payload. Each
property here takes a VALID fixture-encoded blob, mutates it (bit
flips, truncation, random tail), and asserts the decoder either
returns or raises within a wall-time budget.
"""

from __future__ import annotations

import time

import numpy as np
from hypothesis import given
from hypothesis import strategies as st

from fuzz_util import FUZZ
from fuzz_util import mutate as _mutate
from fuzz_util import terminates as _decode_terminates


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


# one valid blob per codec, module scope (built once)
def _valid_blobs() -> dict[str, bytes]:
    from metadata_crawler_spark.operators.flac_codec import encode_flac
    from metadata_crawler_spark.operators.gif_codec import encode_gif
    from metadata_crawler_spark.operators.jpeg_codec import encode_jpeg
    from metadata_crawler_spark.operators.multimodal import encode_png
    from metadata_crawler_spark.operators.webp_codec import encode_webp

    rng = _rng(99)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    pcm = np.clip(
        np.cumsum(rng.integers(-200, 201, size=(600, 2)), axis=0),
        -32768, 32767,
    )
    return {
        "png": encode_png(img, filter_type=4),
        "gif": encode_gif(gray),
        "jpeg": encode_jpeg(gray, quant=2),
        "webp": encode_webp(img, predictor=True, cache_bits=2),
        "flac": encode_flac(pcm, mode="fixed2", part_order=1),
    }


_BLOBS = _valid_blobs()


def _decoders():
    from metadata_crawler_spark.operators.flac_codec import decode_flac
    from metadata_crawler_spark.operators.gif_codec import decode_gif
    from metadata_crawler_spark.operators.jpeg_codec import decode_jpeg
    from metadata_crawler_spark.operators.multimodal import decode_png
    from metadata_crawler_spark.operators.webp_codec import decode_webp

    return {
        "png": decode_png,
        "gif": decode_gif,
        "jpeg": decode_jpeg,
        "webp": decode_webp,
        "flac": decode_flac,
    }


_DECODERS = _decoders()


@FUZZ
@given(
    codec=st.sampled_from(sorted(_BLOBS)),
    seed=st.integers(0, 2**31 - 1),
    n_flips=st.integers(1, 6),
    trunc=st.booleans(),
)
def test_decoder_terminates_on_corruption(codec, seed, n_flips, trunc):
    _decode_terminates(_DECODERS[codec], _mutate(_BLOBS[codec], seed,
                                                 n_flips, trunc))


@FUZZ
@given(
    codec=st.sampled_from(sorted(_BLOBS)),
    seed=st.integers(0, 2**31 - 1),
    n_tail=st.integers(0, 64),
)
def test_decoder_terminates_on_valid_prefix_random_tail(codec, seed, n_tail):
    rng = _rng(seed)
    blob = _BLOBS[codec][:16] + bytes(
        rng.integers(0, 256, size=n_tail, dtype=np.uint8)
    )
    _decode_terminates(_DECODERS[codec], blob)


@FUZZ
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(0, 200))
def test_decoders_terminate_on_random_bytes(seed, n):
    blob = bytes(_rng(seed).integers(0, 256, size=n, dtype=np.uint8))
    for decode in _DECODERS.values():
        _decode_terminates(decode, blob)


def test_sniff_plus_stats_dispatch_on_garbage():
    """The exact media_pixel_stats dispatch path: sniff then decode,
    mapped over a pile of corrupted blobs — every row must resolve to
    ok True/False (no hang, no unhandled non-Exception exit)."""
    from metadata_crawler_spark.operators.multimodal import (
        decode_image,
        sniff_format,
    )

    rng = _rng(7)
    blobs = [
        _mutate(_BLOBS[c], int(rng.integers(0, 2**31)), 4, True)
        for c in sorted(_BLOBS)
        for _ in range(20)
    ]
    t0 = time.monotonic()
    decoded = failed = 0
    for b in blobs:
        fmt = sniff_format(b)
        try:
            if fmt in ("ppm", "pgm", "png", "jpeg", "webp"):
                decode_image(b)
                decoded += 1
        except Exception:
            failed += 1
    assert decoded + failed > 0
    assert time.monotonic() - t0 < 30.0

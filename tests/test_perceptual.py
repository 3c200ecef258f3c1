"""Perceptual media fingerprints: dHash/aHash invariances, spectrogram
audio fingerprint, and the Spark decode->hash->blocked-join surface."""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from metadata_crawler_spark.operators.multimodal import encode_png
from metadata_crawler_spark.operators.perceptual import (
    PHASH_SCHEMA,
    ahash64,
    area_resize,
    audio_fp64,
    dhash64,
    media_neardup,
    media_phash,
    phash_neardup_pairs,
    to_gray,
)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _base_image(seed: int = 3, h: int = 64, w: int = 64) -> np.ndarray:
    """Deterministic structured image: gradient + blocks + a diagonal —
    enough spatial structure that dhash bits are meaningful."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    img = (x * 2 + y).astype(np.float64)
    img[16:40, 8:24] += 90
    img[np.abs(x - y) < 3] += 60
    img += rng.normal(0, 1.5, size=(h, w))
    g = np.clip(img, 0, 255).astype(np.uint8)
    return np.stack([g, np.roll(g, 2, axis=1), 255 - g], axis=2)


def _wav_bytes(x: np.ndarray, rate: int = 8000) -> bytes:
    pcm = (np.clip(x, -1, 1) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def _tone(seed: int = 1, n: int = 8000) -> np.ndarray:
    """Deterministic multi-tone signal with a frequency ramp."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 8000.0
    f0, f1 = rng.integers(200, 400), rng.integers(900, 1500)
    return 0.4 * np.sin(2 * np.pi * f0 * t) + 0.3 * np.sin(
        2 * np.pi * f1 * t * (1 + t)
    )


# ---------------------------------------------------------------------------
# numpy-level invariances
# ---------------------------------------------------------------------------


def test_area_resize_exact_blocks():
    # 4x4 -> 2x2 with integer blocks: exact block means
    a = np.arange(16, dtype=np.float64).reshape(4, 4)
    r = area_resize(a, 2, 2)
    assert np.allclose(r, [[2.5, 4.5], [10.5, 12.5]])


def test_dhash_deterministic_and_resize_invariant():
    img = _base_image()
    h1, h2 = dhash64(img), dhash64(img)
    assert h1 == h2
    up = np.kron(img, np.ones((2, 2, 1))).astype(np.uint8)  # 2x upsample
    assert _hamming(h1, dhash64(up)) <= 2


def test_dhash_brightness_invariant():
    img = _base_image()
    dim = (img.astype(np.float64) * 0.7 + 10).astype(np.uint8)
    # strictly monotone intensity map preserves every comparison
    assert _hamming(dhash64(img), dhash64(dim)) <= 2


def test_dhash_noise_robust_distinct_far():
    img = _base_image()
    rng = np.random.default_rng(11)
    noisy = np.clip(
        img.astype(np.int16) + rng.integers(-3, 4, size=img.shape), 0, 255
    ).astype(np.uint8)
    assert _hamming(dhash64(img), dhash64(noisy)) <= 8
    other = _base_image(seed=99)[:, ::-1]  # different content
    assert _hamming(dhash64(img), dhash64(other)) > 12


def test_ahash_gray_and_signed_packing():
    g = to_gray(_base_image())
    a = ahash64(g.astype(np.uint8))
    assert isinstance(a, int) and -(2**63) <= a < 2**63
    assert a == ahash64(g.astype(np.uint8))


def test_audio_fp_volume_and_stereo_invariant():
    x = _tone()
    fp = audio_fp64(x, 8000)
    assert fp == audio_fp64(x * 0.3, 8000)  # volume scaling
    stereo = np.stack([x, x], axis=1)
    assert fp == audio_fp64(stereo, 8000)  # downmix of identical channels


def test_audio_fp_noise_robust_distinct_far():
    x = _tone()
    rng = np.random.default_rng(5)
    assert _hamming(audio_fp64(x, 8000), audio_fp64(x + rng.normal(0, 0.01, x.shape), 8000)) <= 10
    y = _tone(seed=77)[::-1] * np.linspace(0, 1, x.shape[0])
    assert _hamming(audio_fp64(x, 8000), audio_fp64(y, 8000)) > 12


def test_audio_fp_short_clip_no_crash():
    assert isinstance(audio_fp64(np.zeros(5), 8000), int)
    assert isinstance(audio_fp64(np.zeros(0), 8000), int)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def media_df(spark):
    img = _base_image()
    # same pixels, two encodings — the headline re-encode duplicate
    png = encode_png(img)
    ppm = b"P6\n%d %d\n255\n" % (img.shape[1], img.shape[0]) + img.tobytes()
    other = _base_image(seed=99)[:, ::-1]
    rows = [
        (0, png),
        (1, ppm),
        (2, encode_png(other)),
        (3, _wav_bytes(_tone())),
        (4, _wav_bytes(_tone() * 0.25)),  # same audio, quieter
        (5, b"definitely not media"),
        (6, None),
    ]
    return spark.createDataFrame(rows, "media_id long, media binary")


def test_media_phash_reencode_identical(spark, media_df):
    out = {r.media_id: r for r in media_phash(media_df).collect()}
    assert out[0].ok and out[1].ok
    assert out[0].phash == out[1].phash  # PNG vs PPM of the same pixels
    assert out[0].ahash == out[1].ahash
    assert out[3].ok and out[3].ahash is None  # audio: no ahash
    assert out[3].phash == out[4].phash  # volume-invariant
    assert not out[5].ok and out[5].phash is None
    assert not out[6].ok


def test_media_neardup_pairs(spark, media_df):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in media_neardup(media_df, max_hamming=6).collect()
    }
    assert pairs.get((0, 1)) == 0  # re-encoded image pair
    assert pairs.get((3, 4)) == 0  # re-leveled audio pair
    assert (0, 2) not in pairs and (1, 2) not in pairs  # distinct images


def test_pigeonhole_block_width(spark):
    # hamming exactly 6 with the errors spread across three 16-bit blocks:
    # a 16-bit blocking would STILL find it only if one block matches —
    # here blocks 0..2 each get 2 flips, block 3 is clean, so both widths
    # work; then flip 2 bits in EVERY 16-bit block (hamming 8 > 6 at
    # max_hamming=6 -> excluded by the verify filter regardless).
    a = 0xF123456789ABCDEF - (1 << 64)  # bit 63 set: signed packing path
    flips6 = (1 << 1) | (1 << 5) | (1 << 17) | (1 << 20) | (1 << 33) | (1 << 40)
    b = a ^ flips6
    df = spark.createDataFrame(
        [(1, a), (2, b)], "media_id long, phash long"
    )
    got = phash_neardup_pairs(df, max_hamming=6).collect()
    assert len(got) == 1 and got[0].hamming == 6

    # max_hamming=6 uses 8-bit blocks: plant a pair whose SIX flips all
    # land in distinct 16-bit blocks' low bytes -> every 8-bit block with
    # a flip differs, but 8 blocks minus 6 flips leaves >=2 exact 8-bit
    # blocks, so pigeonhole still catches it.
    flips_spread = (1 << 0) | (1 << 9) | (1 << 18) | (1 << 27) | (1 << 36) | (1 << 45)
    c = a ^ flips_spread
    df2 = spark.createDataFrame([(1, a), (3, c)], "media_id long, phash long")
    got2 = phash_neardup_pairs(df2, max_hamming=6).collect()
    assert len(got2) == 1 and got2[0].hamming == 6


def test_phash_schema_stable(spark, media_df):
    out = media_phash(media_df)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,fmt:string,phash:bigint,ahash:bigint,ok:boolean>"
    )
    assert PHASH_SCHEMA.startswith("media_id long")


def test_small_image_hashes_match_upscaled_copy():
    # images smaller than the hash grid used to fall into zero-filled
    # phantom cells and never match their resized duplicates (r5 review):
    # nearest-replication must make a tiny image hash EXACTLY like its
    # piecewise-constant upscale.
    rng = np.random.default_rng(7)
    small = rng.integers(0, 256, size=(2, 2), dtype=np.uint8)
    big = np.kron(small, np.ones((50, 50), dtype=np.uint8))  # 100x100 copy
    # dhash's 9-wide grid can't split 2 columns evenly, so boundary cells
    # mix on the downsampled side: a few bits of noise, well inside the
    # default max_hamming=6 (before the fix the distance was ~30: random).
    assert _hamming(dhash64(small), dhash64(big)) <= 4
    # ahash's even 8x8 grid aligns exactly with the 2x2 content
    assert ahash64(small) == ahash64(big)
    # 1-pixel-wide strip vs its widened copy
    strip = rng.integers(0, 256, size=(16, 1), dtype=np.uint8)
    wide = np.repeat(strip, 40, axis=1)
    assert dhash64(strip) == dhash64(wide)


def test_wide_hamming_thresholds_keep_pigeonhole(spark):
    # max_hamming >= 16 exceeds what 4-bit blocks guarantee: the width
    # ladder must drop to 2-bit blocks so a pair at distance 16 with one
    # flip in every 4-bit block is still found.
    a = 0x0123456789ABCDEF
    flips = 0
    for blk in range(16):  # one bit in each of the 16 4-bit blocks
        flips |= 1 << (blk * 4)
    b = a ^ flips
    df = spark.createDataFrame([(1, a), (2, b)], "media_id long, phash long")
    got = phash_neardup_pairs(df, max_hamming=16).collect()
    assert len(got) == 1 and got[0].hamming == 16

    with pytest.raises(ValueError):
        phash_neardup_pairs(df, max_hamming=64)


def test_simhash_pigeonhole_guard(spark):
    # simhash_neardup_pairs must refuse (block_bits, max_hamming) combos
    # that would silently miss pairs instead of under-reporting.
    from metadata_crawler_spark.operators.dedup import simhash_neardup_pairs

    df = spark.createDataFrame([(1, 0), (2, 15)], "id long, simhash long")
    with pytest.raises(ValueError):
        simhash_neardup_pairs(df, max_hamming=4, block_bits=16)
    with pytest.raises(ValueError):
        simhash_neardup_pairs(df, max_hamming=3, block_bits=24)


def test_flac_fingerprint_matches_wav(spark):
    """FLAC is lossless: the spectral audio fingerprint of a FLAC blob
    equals the fingerprint of the WAV carrying the same PCM."""
    import io
    import wave

    import numpy as np

    from metadata_crawler_spark.operators.flac_codec import encode_flac
    from metadata_crawler_spark.operators.perceptual import media_phash

    rng = np.random.default_rng(9)
    pcm = (rng.integers(-20000, 20000, size=4000)).astype(np.int64)
    flac = encode_flac(pcm, sample_rate=8000, mode="fixed2", rice_param=8)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(pcm.astype("<i2").tobytes())
    df = spark.createDataFrame(
        [(0, bytearray(flac)), (1, bytearray(buf.getvalue()))],
        "media_id long, media binary",
    )
    out = {r["media_id"]: r for r in media_phash(df).collect()}
    assert out[0]["ok"] and out[1]["ok"]
    assert out[0]["phash"] == out[1]["phash"]

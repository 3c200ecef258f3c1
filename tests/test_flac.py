"""FLAC codec (operators/flac_codec.py): spec round-trips over every
decoder path via the feature-flagged fixture encoder, plus the Spark
stats-parity drive through media_pixel_stats.

Reference analog: open_dataset engine dispatch
(/root/reference/src/metadata_crawler/api/storage_backend.py:102-149)."""

from __future__ import annotations

import numpy as np
import pytest

from metadata_crawler_spark.operators.flac_codec import (
    decode_flac,
    encode_flac,
    parse_streaminfo,
)


def _smooth(n: int) -> np.ndarray:
    return (2000 * np.sin(np.arange(n) / 25.0)).astype(np.int64)


def _rt(x: np.ndarray, **kw) -> tuple[np.ndarray, int]:
    bps = kw.get("bits_per_sample", 16)
    blob = encode_flac(x, **kw)
    y, rate = decode_flac(blob)
    yi = np.round(y * (1 << (bps - 1))).astype(np.int64)
    xx = x if x.ndim == 2 else x[:, None]
    assert yi.shape == xx.shape
    np.testing.assert_array_equal(yi, xx)
    return y, rate


@pytest.mark.parametrize(
    "mode", ["constant", "verbatim", "fixed0", "fixed1", "fixed2",
             "fixed3", "fixed4"]
)
def test_subframe_modes_roundtrip(mode):
    x = (
        np.full(500, -123, np.int64)
        if mode == "constant"
        else _smooth(900)
    )
    _rt(x, mode=mode, rice_param=6)


def test_lpc_roundtrip():
    _rt(_smooth(700), mode="lpc", lpc_coeffs=[3, -3, 1], lpc_shift=1,
        rice_param=7)


@pytest.mark.parametrize(
    "stereo", ["indep", "left_side", "right_side", "mid_side"]
)
def test_stereo_modes_roundtrip(stereo):
    sm = _smooth(600)
    st = np.stack([sm, (sm * 0.7).astype(np.int64)], axis=1)
    _rt(st, mode="fixed2", stereo_mode=stereo, rice_param=6)


def test_partitions_rice2_wasted_and_bps():
    rng = np.random.default_rng(11)
    _rt(_smooth(512), mode="fixed1", part_order=2, rice_param=5)
    _rt(_smooth(640), mode="fixed2", rice2=True, rice_param=6)
    w = (rng.integers(-100, 100, size=400) * 8).astype(np.int64)
    _rt(w, mode="verbatim", wasted=3)
    x8 = rng.integers(-120, 120, size=300).astype(np.int64)
    _rt(x8, bits_per_sample=8)


def test_streaminfo_and_rate():
    sm = _smooth(1000)
    blob = encode_flac(sm, sample_rate=44100, block_size=256)
    info = parse_streaminfo(blob)
    assert info["sample_rate"] == 44100
    assert info["channels"] == 1
    assert info["bits_per_sample"] == 16
    assert info["total_samples"] == 1000
    _y, rate = decode_flac(blob)
    assert rate == 44100


def test_nonstandard_rate_uses_streaminfo():
    # 12345 Hz has no frame-header code -> sr_code 0 (from STREAMINFO)
    _y, rate = (
        decode_flac(encode_flac(_smooth(300), sample_rate=12345))
    )
    assert rate == 12345


def test_crc_corruption_raises():
    blob = bytearray(encode_flac(_smooth(512), block_size=256))
    info = parse_streaminfo(bytes(blob))
    # flip one bit inside the first frame's audio payload
    blob[info["frames_at"] + 20] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))


def test_media_pixel_stats_flac_parity(spark):
    """Spark drive: FLAC blobs produce the same rms/duration stats as
    the equivalent WAV blobs of identical samples."""
    import io
    import wave

    from metadata_crawler_spark.operators.multimodal import (
        media_pixel_stats,
    )

    rng = np.random.default_rng(5)
    rows = []
    for i in range(6):
        nf = int(rng.integers(300, 1200))
        pcm = (rng.integers(-20000, 20000, size=nf)).astype(np.int64)
        flac = encode_flac(pcm, sample_rate=8000, mode="fixed2",
                           rice_param=8)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(pcm.astype("<i2").tobytes())
        rows.append((2 * i, bytearray(flac)))
        rows.append((2 * i + 1, bytearray(buf.getvalue())))
    df = spark.createDataFrame(rows, "media_id long, media binary")
    out = {
        r["media_id"]: r
        for r in media_pixel_stats(df).collect()
    }
    for i in range(6):
        f, w = out[2 * i], out[2 * i + 1]
        assert f["ok"] and w["ok"]
        assert f["fmt"] == "flac" and w["fmt"] == "wav"
        assert f["n_samples"] == w["n_samples"]
        assert f["sample_rate"] == w["sample_rate"] == 8000
        assert f["rms"] == pytest.approx(w["rms"], abs=1e-4)
        assert f["duration_s"] == w["duration_s"]


def test_reserved_sample_size_code_is_value_error():
    """Review fix: reserved ss_code=3 raises ValueError (the corrupt-
    media contract), not KeyError."""
    blob = bytearray(encode_flac(_smooth(256), block_size=256))
    info = parse_streaminfo(bytes(blob))
    f = info["frames_at"]
    # frame byte 3 = ch_code<<4 | ss_code<<1 | reserved; force ss=3
    blob[f + 3] = (blob[f + 3] & 0xF0) | (3 << 1)
    with pytest.raises(ValueError, match="sample size"):
        decode_flac(bytes(blob))

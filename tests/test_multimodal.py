"""Multimodal plumbing: binary media columns -> typed metadata via
mapInPandas; resize/frame-sample plans; decode stub behavior."""

from __future__ import annotations

import pytest

from metadata_crawler_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    extract_media_meta,
    frame_sample_plan,
    gen_media,
    resize_meta,
)


@pytest.fixture(scope="module")
def media(spark):
    pdf = gen_media(200)
    return spark.createDataFrame(pdf, MEDIA_SCHEMA).cache()


def test_meta_extraction(spark, media):
    meta = extract_media_meta(media)
    rows = meta.collect()
    assert len(rows) == 200
    assert all(r.ok for r in rows)
    assert all(r.kind in ("image", "audio", "video") for r in rows)
    assert all(8 <= r.width <= 512 and 8 <= r.height <= 512 for r in rows)
    # mime agrees with parsed kind (header is the source of truth)
    assert all(r.kind in r.mime for r in rows)


def test_corrupt_blob_flagged(spark):
    pdf = gen_media(3)
    pdf.loc[1, "media"] = b"not a media file"
    meta = extract_media_meta(spark.createDataFrame(pdf, MEDIA_SCHEMA))
    rows = {r.media_id: r for r in meta.collect()}
    assert rows[0].ok and rows[2].ok and not rows[1].ok
    assert rows[1].kind == "unknown"


def test_resize_and_frame_plans(spark, media):
    meta = extract_media_meta(media)
    resized = resize_meta(meta, max_side=128)
    bad = resized.filter(
        (resized.target_width > 128) | (resized.target_height > 128)
    ).count()
    assert bad == 0
    # aspect preserved within 1px of ceil rounding
    one = resized.filter(resized.width > 256).first()
    assert abs(one.target_width / one.width - one.target_height / one.height) < 0.05
    frames = frame_sample_plan(meta, every_n=10)
    f = frames.groupBy("media_id").count().collect()
    assert len(f) > 0


def test_decode_stub_raises_cleanly():
    with pytest.raises(NotImplementedError):
        decode_image(b"MCSF....")


def test_decode_ppm_pgm_numpy_roundtrip():
    """Pure-numpy PPM/PGM decode (VERDICT r3 item 8): planted pixel
    arrays round-trip exactly, comments and 16-bit maxval included."""
    import numpy as np

    from metadata_crawler_spark.operators.multimodal import decode_ppm

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    blob = b"P6\n# a comment\n7 5\n255\n" + px.tobytes()
    assert (decode_ppm(blob) == px).all()
    gray = rng.integers(0, 65536, size=(4, 6), dtype=np.uint16).astype(">u2")
    blob16 = b"P5 6 4 65535\n" + gray.tobytes()
    assert (decode_ppm(blob16) == gray).all()
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n7 5\n255\n" + px.tobytes()[:-8])  # truncated
    with pytest.raises(ValueError):
        decode_ppm(b"JFIF....")


def test_decode_wav_numpy_roundtrip():
    import io
    import wave

    import numpy as np

    from metadata_crawler_spark.operators.multimodal import decode_wav

    pcm = (np.sin(np.linspace(0, 20, 800)) * 20000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(pcm.tobytes())
    x, rate = decode_wav(buf.getvalue())
    assert rate == 16000 and x.shape == (400, 2)
    assert np.allclose(x.reshape(-1) * 32768.0, pcm.astype(np.float64))


def test_media_pixel_stats_spark(spark):
    """The mapInPandas decode path: per-blob stats columns must equal
    numpy computed directly on the planted arrays."""
    import numpy as np

    from metadata_crawler_spark.operators.multimodal import (
        decode_ppm,
        decode_wav,
        gen_real_media,
        media_pixel_stats,
    )

    pdf = gen_real_media(30)
    df = spark.createDataFrame(pdf, MEDIA_SCHEMA).repartition(4)
    got = {r["media_id"]: r for r in media_pixel_stats(df).collect()}
    assert len(got) == 30 and all(r["ok"] for r in got.values())
    for i in range(6):
        blob = bytes(pdf.loc[i, "media"])
        r = got[i]
        if r["fmt"] in ("ppm", "pgm"):
            a = decode_ppm(blob)
            assert r["height"] == a.shape[0] and r["width"] == a.shape[1]
            assert r["px_mean"] == float(np.round(a.mean(), 6))
            assert r["px_std"] == float(np.round(a.std(), 6))
        else:
            x, rate = decode_wav(blob)
            assert r["fmt"] == "wav" and r["sample_rate"] == rate
            assert r["n_samples"] == x.shape[0]
            assert r["rms"] == float(np.round(np.sqrt((x**2).mean()), 6))
    # corrupt blob -> ok=False row, job does not fail
    import pandas as pd

    bad = spark.createDataFrame(
        pd.DataFrame(
            [(99, "image/x-portable-pixmap", b"P6\n9999 9999\n255\nxx")],
            columns=["media_id", "mime", "media"],
        ),
        MEDIA_SCHEMA,
    )
    rows = media_pixel_stats(bad).collect()
    assert len(rows) == 1 and rows[0]["ok"] is False


def test_extract_media_meta_real_formats(spark):
    """The suffix/magic dispatch (open_dataset analog) now recognizes the
    real formats: PPM dims and WAV frame counts come from actual decode."""
    from metadata_crawler_spark.operators.multimodal import gen_real_media

    pdf = gen_real_media(9)
    meta = {
        r["media_id"]: r
        for r in extract_media_meta(
            spark.createDataFrame(pdf, MEDIA_SCHEMA)
        ).collect()
    }
    assert all(m["ok"] for m in meta.values())
    kinds = {m["kind"] for m in meta.values()}
    assert kinds == {"image", "audio"}
    for i, m in meta.items():
        if m["kind"] == "image":
            assert m["width"] > 0 and m["height"] > 0 and m["n_frames"] == 1
        else:
            assert m["n_frames"] > 0

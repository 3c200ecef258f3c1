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

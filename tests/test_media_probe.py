"""Media header probes (operators/media_probe.py): spec-crafted WebP /
MP3 / Ogg / FLAC fixtures, truncation safety, and the Spark surface."""

import struct

from metadata_crawler_spark.operators.media_probe import (
    media_probe,
    probe_flac,
    probe_media,
    probe_mp3,
    probe_ogg,
    probe_webp,
)


def _riff(chunks: list[tuple[bytes, bytes]]) -> bytes:
    body = b"WEBP"
    for fourcc, payload in chunks:
        body += fourcc + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def webp_lossy(w: int, h: int) -> bytes:
    payload = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", w, h)
    return _riff([(b"VP8 ", payload)])


def webp_lossless(w: int, h: int) -> bytes:
    bits = (w - 1) | ((h - 1) << 14)
    return _riff([(b"VP8L", b"\x2f" + struct.pack("<I", bits))])


def webp_anim(w: int, h: int, n: int) -> bytes:
    vp8x = bytes([0x02]) + b"\x00\x00\x00" + (w - 1).to_bytes(3, "little") + (
        h - 1
    ).to_bytes(3, "little")
    return _riff([(b"VP8X", vp8x)] + [(b"ANMF", b"")] * n)


def mp3_frames(n: int, mono: bool = True, id3: bool = False, xing: int = 0) -> bytes:
    # MPEG-1 Layer III, 128 kbps, 44100 Hz, no padding
    hdr = bytes([0xFF, 0xFB, 0x90, 0xC0 if mono else 0x00])
    size = 1152 * 128000 // 8 // 44100  # 417
    out = b""
    if id3:
        out += b"ID3\x04\x00\x00" + bytes([0, 0, 0, 100]) + b"\x00" * 100
    if xing:
        side = 17 if mono else 32
        body = b"\x00" * side + b"Xing" + struct.pack(">II", 1, xing)
        out += hdr + body + b"\x00" * (size - 4 - len(body))
        return out
    return out + (hdr + b"\x00" * (size - 4)) * n


def _ogg_page(typ: int, granule: int, segments: bytes, nseg: int) -> bytes:
    return (
        b"OggS\x00" + bytes([typ]) + struct.pack("<q", granule)
        + b"\x00" * 12 + bytes([nseg]) + segments
    )


def ogg_opus(channels: int, pre_skip: int, granule: int) -> bytes:
    head = (
        b"OpusHead\x01" + bytes([channels]) + struct.pack("<H", pre_skip)
        + struct.pack("<I", 48000) + b"\x00\x00\x00"
    )
    first = _ogg_page(0x02, 0, bytes([len(head)]) + head, 1)
    last = _ogg_page(0x04, granule, b"", 0)
    return first + last


def ogg_vorbis(channels: int, rate: int, granule: int) -> bytes:
    head = b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels]) + struct.pack(
        "<I", rate
    ) + b"\x00" * 12
    first = _ogg_page(0x02, 0, bytes([len(head)]) + head, 1)
    last = _ogg_page(0x04, granule, b"", 0)
    return first + last


def flac_blob(rate: int, channels: int, total: int) -> bytes:
    bits = (rate << 44) | ((channels - 1) << 41) | ((16 - 1) << 36) | total
    si = b"\x00" * 10 + bits.to_bytes(8, "big") + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si


def test_webp_variants():
    assert probe_webp(webp_lossy(640, 480)) == dict(
        fmt="webp", codec="vp8", width=640, height=480, channels=0,
        sample_rate=0, bitrate_kbps=0, n_frames=1, duration_s=0.0, ok=True,
    )
    p = probe_webp(webp_lossless(1000, 2000))
    assert (p["codec"], p["width"], p["height"], p["ok"]) == ("vp8l", 1000, 2000, True)
    a = probe_webp(webp_anim(320, 240, 7))
    assert (a["width"], a["height"], a["n_frames"], a["ok"]) == (320, 240, 7, True)


def test_mp3_cbr_walk_and_id3_skip():
    p = probe_mp3(mp3_frames(30))
    assert (p["sample_rate"], p["bitrate_kbps"], p["channels"]) == (44100, 128, 1)
    assert p["n_frames"] == 30
    assert abs(p["duration_s"] - 30 * 1152 / 44100) < 1e-6 and p["ok"]
    p2 = probe_mp3(mp3_frames(30, id3=True))
    assert p2["n_frames"] == 30 and p2["ok"]
    assert probe_mp3(mp3_frames(4, mono=False))["channels"] == 2


def test_mp3_xing_exact_count():
    p = probe_mp3(mp3_frames(1, xing=12345))
    assert p["n_frames"] == 12345
    assert abs(p["duration_s"] - 12345 * 1152 / 44100) < 1e-5 and p["ok"]


def test_ogg_opus_and_vorbis():
    p = probe_ogg(ogg_opus(2, 312, 48000 * 2 + 312))
    assert (p["codec"], p["channels"], p["sample_rate"]) == ("opus", 2, 48000)
    assert p["duration_s"] == 2.0 and p["ok"]
    v = probe_ogg(ogg_vorbis(2, 44100, 44100 * 3))
    assert (v["codec"], v["sample_rate"], v["duration_s"]) == ("vorbis", 44100, 3.0)


def test_flac_streaminfo():
    p = probe_flac(flac_blob(44100, 2, 441000))
    assert (p["channels"], p["sample_rate"], p["n_frames"]) == (2, 44100, 441000)
    assert p["duration_s"] == 10.0 and p["ok"]


def test_truncation_and_garbage_never_raise():
    blobs = [
        webp_lossy(640, 480), mp3_frames(3), ogg_opus(2, 0, 480),
        flac_blob(8000, 1, 100), b"", b"RIFF", b"OggS", b"fLaC\x00", b"\xff\xfb",
    ]
    for b in blobs:
        for cut in (0, 3, 7, 11, 15, len(b) // 2):
            probe_media(b[:cut])  # must not raise
    assert probe_media(None)["ok"] is False
    assert probe_media(b"not media at all")["ok"] is False


def test_spark_media_probe_surface(spark):
    rows = [
        (1, webp_lossy(64, 32)),
        (2, mp3_frames(10)),
        (3, ogg_opus(1, 0, 4800)),
        (4, flac_blob(16000, 1, 32000)),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    out = {r["media_id"]: r.asDict() for r in media_probe(df).collect()}
    assert out[1]["fmt"] == "webp" and out[1]["width"] == 64
    assert out[2]["fmt"] == "mp3" and out[2]["n_frames"] == 10
    assert out[3]["codec"] == "opus" and out[3]["duration_s"] == 0.1
    assert out[4]["fmt"] == "flac" and out[4]["duration_s"] == 2.0
    assert out[5]["ok"] is False
    plan = media_probe(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_extract_media_meta_dispatches_probed_formats(spark):
    """The generic metadata pass (multimodal.extract_media_meta) now types
    WebP/MP3/Ogg/FLAC blobs via the header probes instead of 'unknown'."""
    from metadata_crawler_spark.operators.multimodal import extract_media_meta

    rows = [
        (1, "image/webp", webp_lossy(64, 32)),
        (2, "image/webp", webp_anim(16, 16, 5)),
        (3, "audio/mpeg", mp3_frames(10)),
        (4, "audio/flac", flac_blob(16000, 1, 32000)),
    ]
    df = spark.createDataFrame(rows, "media_id long, mime string, media binary")
    out = {r["media_id"]: r.asDict() for r in extract_media_meta(df).collect()}
    assert out[1]["kind"] == "image" and out[1]["width"] == 64 and out[1]["ok"]
    assert out[2]["kind"] == "video" and out[2]["n_frames"] == 5
    assert out[3]["kind"] == "audio" and out[3]["n_frames"] == 10 and out[3]["ok"]
    assert out[4]["kind"] == "audio" and out[4]["ok"]


def test_media_probe_null_id_never_raises(spark):
    """One NULL media_id row must not kill the probe job (module posture:
    garbage never raises); the NULL is carried through."""
    from metadata_crawler_spark.operators.media_probe import media_probe

    rows = [(1, b"garbage"), (None, b"RIFF\x00\x00\x00\x00WEBP")]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    out = media_probe(df).collect()
    assert len(out) == 2
    assert {r.media_id for r in out} == {1, None}

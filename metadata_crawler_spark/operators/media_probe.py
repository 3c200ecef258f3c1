"""Header-level media probes: typed metadata from WebP / MP3 / Ogg / FLAC
blobs WITHOUT full decode — pure stdlib `struct` bit-twiddling over the
public container specs.

A 100 TB crawl needs dimensions / duration / codec facets for every media
object it keeps (the reference's open-and-extract stage,
api/storage_backend.py:102-149 feeding DataSpecs extraction); it does NOT
need pixels or PCM for most of them. These probes close the metadata gap
for the formats whose *decoders* remain sandbox-stubbed (WebP pixel data,
MP3 audio): the header walk is a few hundred bytes of the blob, so the
per-row cost is independent of media size.

Formats (all from their public specs):

- **WebP** (RIFF): ``VP8 `` lossy (frame-tag start code + 14-bit dims),
  ``VP8L`` lossless (0x2F signature + packed 14-bit dims), ``VP8X``
  extended (24-bit canvas dims, animation flag, ANMF frame count).
- **MP3** (MPEG-1/2/2.5 Layer III): ID3v2 skip (syncsafe size), frame
  header parse (version/layer/bitrate/sample-rate/channel tables), Xing/
  Info VBR tag for exact frame counts, else a bounded whole-blob frame
  walk; duration = frames x samples-per-frame / rate.
- **Ogg**: first-page codec id (``\\x01vorbis`` / ``OpusHead``) for
  channels + rate; last-page granule position for duration (Opus granules
  are always 48 kHz, minus pre-skip).
- **FLAC**: STREAMINFO block (20-bit rate, 3-bit channels, 36-bit total
  samples).

Spark shape: `probe_media` is per-blob Python (headers are imperative),
batched via mapInPandas exactly like extract_media_meta — map-side off
the scan, no shuffle, only ~100-byte metadata rows ever move.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

PROBE_SCHEMA = (
    "media_id long, fmt string, codec string, width int, height int, "
    "channels int, sample_rate int, bitrate_kbps int, n_frames long, "
    "duration_s double, ok boolean"
)

_EMPTY = dict(
    fmt="unknown", codec="", width=0, height=0, channels=0, sample_rate=0,
    bitrate_kbps=0, n_frames=0, duration_s=0.0, ok=False,
)


# ---------------------------------------------------------------------------
# WebP
# ---------------------------------------------------------------------------

def probe_webp(b: bytes) -> dict:
    """RIFF walk: dims from the first VP8 /VP8L/VP8X chunk; animations
    report n_frames = ANMF count and kind stays discoverable via codec."""
    out = dict(_EMPTY, fmt="webp")
    if len(b) < 16 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return out
    pos, end = 12, min(len(b), 8 + struct.unpack("<I", b[4:8])[0])
    n_anmf = 0
    while pos + 8 <= end:
        fourcc = b[pos : pos + 4]
        size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        payload = b[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8 " and len(payload) >= 10:
            # frame tag (3B) then start code 9D 01 2A, then 14-bit dims
            if payload[3:6] == b"\x9d\x01\x2a":
                w = struct.unpack("<H", payload[6:8])[0] & 0x3FFF
                h = struct.unpack("<H", payload[8:10])[0] & 0x3FFF
                out.update(codec="vp8", width=w, height=h, ok=True)
        elif fourcc == b"VP8L" and len(payload) >= 5 and payload[0] == 0x2F:
            bits = struct.unpack("<I", payload[1:5])[0]
            out.update(
                codec="vp8l",
                width=(bits & 0x3FFF) + 1,
                height=((bits >> 14) & 0x3FFF) + 1,
                ok=True,
            )
        elif fourcc == b"VP8X" and len(payload) >= 10:
            w = int.from_bytes(payload[4:7], "little") + 1
            h = int.from_bytes(payload[7:10], "little") + 1
            out.update(codec=out["codec"] or "vp8x", width=w, height=h, ok=True)
            if not payload[0] & 0x02:  # no animation flag
                out["n_frames"] = max(out["n_frames"], 1)
        elif fourcc == b"ANMF":
            n_anmf += 1
        pos += 8 + size + (size & 1)  # chunks pad to even
    if n_anmf:
        out["n_frames"] = n_anmf
    elif out["ok"] and not out["n_frames"]:
        out["n_frames"] = 1
    return out


# ---------------------------------------------------------------------------
# MP3
# ---------------------------------------------------------------------------

# MPEG-1 Layer III bitrate table (kbps); index 0 = free, 15 = bad.
_BR_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0]
# MPEG-2/2.5 Layer III.
_BR_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0]
_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}


def _mp3_frame(b: bytes, pos: int):
    """(frame_size, samples_per_frame, rate, bitrate_kbps, channels) for a
    Layer-III frame header at ``pos``, or None."""
    if pos + 4 > len(b):
        return None
    h = struct.unpack(">I", b[pos : pos + 4])[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver = (h >> 19) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer = (h >> 17) & 3  # 1 = Layer III
    if ver == 1 or layer != 1:
        return None
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3  # 3 = mono
    rate = _RATES[ver][sr_idx]
    kbps = (_BR_V1_L3 if ver == 3 else _BR_V2_L3)[br_idx]
    spf = 1152 if ver == 3 else 576
    size = spf * kbps * 1000 // 8 // rate + padding
    return size, spf, rate, kbps, (1 if mode == 3 else 2)


def probe_mp3(b: bytes, max_frames: int = 1_000_000) -> dict:
    """ID3v2 skip -> first frame header -> Xing/Info exact frame count if
    present, else a full frame walk (local to the blob, O(n_frames))."""
    out = dict(_EMPTY, fmt="mp3", codec="mpeg-l3")
    pos = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        sz = b[6] << 21 | b[7] << 14 | b[8] << 7 | b[9]  # syncsafe
        pos = 10 + sz
    first = _mp3_frame(b, pos)
    if first is None:
        return out
    size, spf, rate, kbps, ch = first
    out.update(sample_rate=rate, bitrate_kbps=kbps, channels=ch)
    # Xing/Info tag sits after the side info of the first frame.
    side = (17 if ch == 1 else 32) if spf == 1152 else (9 if ch == 1 else 17)
    tag_at = pos + 4 + side
    tag = b[tag_at : tag_at + 4]
    if tag in (b"Xing", b"Info") and len(b) >= tag_at + 12:
        flags = struct.unpack(">I", b[tag_at + 4 : tag_at + 8])[0]
        if flags & 1:  # frames field present
            frames = struct.unpack(">I", b[tag_at + 8 : tag_at + 12])[0]
            out.update(
                n_frames=frames,
                duration_s=round(frames * spf / rate, 6),
                ok=True,
            )
            return out
    frames = 0
    while frames < max_frames:
        fr = _mp3_frame(b, pos)
        if fr is None:
            break
        frames += 1
        pos += fr[0]
    out.update(
        n_frames=frames, duration_s=round(frames * spf / rate, 6), ok=frames > 0
    )
    return out


# ---------------------------------------------------------------------------
# Ogg (Vorbis / Opus)
# ---------------------------------------------------------------------------

def probe_ogg(b: bytes) -> dict:
    out = dict(_EMPTY, fmt="ogg")
    if b[:4] != b"OggS" or len(b) < 28:
        return out
    nseg = b[26]
    body = 27 + nseg
    head = b[body : body + 64]
    pre_skip = 0
    if head[:7] == b"\x01vorbis" and len(head) >= 16:
        out.update(
            codec="vorbis",
            channels=head[11],
            sample_rate=struct.unpack("<I", head[12:16])[0],
        )
    elif head[:8] == b"OpusHead" and len(head) >= 12:
        pre_skip = struct.unpack("<H", head[10:12])[0]
        out.update(codec="opus", channels=head[9], sample_rate=48000)
    else:
        return out
    # duration from the LAST page's granule position
    last = b.rfind(b"OggS")
    granule = struct.unpack("<q", b[last + 6 : last + 14])[0] if last + 14 <= len(b) else 0
    if granule > 0 and out["sample_rate"]:
        out.update(
            n_frames=max(0, granule - pre_skip),
            duration_s=round(max(0, granule - pre_skip) / out["sample_rate"], 6),
        )
    out["ok"] = True
    return out


# ---------------------------------------------------------------------------
# FLAC
# ---------------------------------------------------------------------------

def probe_flac(b: bytes) -> dict:
    out = dict(_EMPTY, fmt="flac", codec="flac")
    if b[:4] != b"fLaC" or len(b) < 8 + 34:
        return out
    pos = 4
    while pos + 4 <= len(b):
        hdr = b[pos]
        size = int.from_bytes(b[pos + 1 : pos + 4], "big")
        if hdr & 0x7F == 0:  # STREAMINFO
            si = b[pos + 4 : pos + 4 + size]
            if len(si) >= 18:
                bits = int.from_bytes(si[10:18], "big")
                rate = bits >> 44
                ch = ((bits >> 41) & 0x7) + 1
                total = bits & ((1 << 36) - 1)
                out.update(
                    channels=ch, sample_rate=rate, n_frames=total,
                    duration_s=round(total / rate, 6) if rate else 0.0,
                    ok=rate > 0,
                )
            return out
        if hdr & 0x80:  # last-metadata-block and not STREAMINFO first
            break
        pos += 4 + size
    return out


# ---------------------------------------------------------------------------
# dispatch + Spark surface
# ---------------------------------------------------------------------------

def probe_media(blob: bytes | None) -> dict:
    b = bytes(blob) if blob is not None else b""
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        return probe_webp(b)
    if b[:4] == b"OggS":
        return probe_ogg(b)
    if b[:4] == b"fLaC":
        return probe_flac(b)
    if b[:3] == b"ID3" or (len(b) >= 4 and _mp3_frame(b, 0) is not None):
        return probe_mp3(b)
    return dict(_EMPTY)


def media_probe(df: DataFrame, blob_col: str = "media", id_col: str = "media_id") -> DataFrame:
    """Typed metadata for WebP/MP3/Ogg/FLAC blobs via mapInPandas —
    map-side off the scan, header-bounded work per row, only metadata
    rows (~100 B) ever reach an exchange."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                d = probe_media(blob)
                # NULL ids surface as NaN/None in pandas; int() on either
                # raises and would kill the task — against this module's
                # never-raise posture (garbage blobs return ok=False, so
                # a garbage id must not fare worse). Carry the NULL.
                d["media_id"] = None if pd.isna(mid) else int(mid)
                rows.append(d)
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "fmt", "codec", "width", "height", "channels",
                    "sample_rate", "bitrate_kbps", "n_frames", "duration_s", "ok",
                ],
            )

    return df.select(id_col, blob_col).mapInPandas(run, PROBE_SCHEMA)

"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Reference analog: ``open_dataset`` engine dispatch by suffix — h5netcdf /
cfgrib / zarr decoders selected per object (/root/reference/src/
metadata_crawler/api/storage_backend.py:102-149) with stats extracted per
variable (api/config.py:405-458). Our objects are media blobs riding the
same pages pipeline.

The container has no image/audio libraries, so the DECODE step is stubbed
two ways (both clearly marked): real decoders behind an import-try
(PIL/soundfile -> NotImplementedError when absent), plus a deterministic
fake format ("MCSF") whose header the fixture generator writes and the
extractor parses — so the Spark-side plumbing (schema, mapInPandas batch
shape, partitioning, UDF signatures) is fully real and tested while the
pixel math is not pretended.

Fake format: b"MCSF" | kind(1B: 0=img,1=aud,2=vid) | w(2B) | h(2B) |
n_frames(2B) | payload.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, mime string, media binary"
)
META_SCHEMA = (
    "media_id long, mime string, kind string, width int, height int, "
    "n_frames int, n_bytes long, ok boolean"
)
KINDS = {0: "image", 1: "audio", 2: "video"}
MAGIC = b"MCSF"


def gen_media(n: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic fake media blobs (fixture side of the stub)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = int(rng.integers(0, 3))
        w, h, fr = int(rng.integers(8, 512)), int(rng.integers(8, 512)), int(rng.integers(1, 120))
        payload = rng.bytes(int(rng.integers(16, 256)))
        blob = MAGIC + struct.pack(">BHHH", kind, w, h, fr) + payload
        rows.append((i, f"application/x-mcsf-{KINDS[kind]}", blob))
    return pd.DataFrame(rows, columns=["media_id", "mime", "media"])


def _parse_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = {"media_id": pdf["media_id"], "mime": pdf["mime"]}
    kinds, ws, hs, frs, oks = [], [], [], [], []
    for blob in pdf["media"]:
        b = bytes(blob) if blob is not None else b""
        if len(b) >= 11 and b[:4] == MAGIC:
            kind, w, h, fr = struct.unpack(">BHHH", b[4:11])
            kinds.append(KINDS.get(kind, "unknown")); ws.append(w); hs.append(h)
            frs.append(fr); oks.append(True)
        else:
            kinds.append("unknown"); ws.append(0); hs.append(0)
            frs.append(0); oks.append(False)
    out.update(
        kind=kinds, width=ws, height=hs, n_frames=frs,
        n_bytes=pdf["media"].map(lambda b: len(b) if b is not None else 0),
        ok=oks,
    )
    return pd.DataFrame(out)


def extract_media_meta(df: DataFrame) -> DataFrame:
    """mapInPandas header parse: binary in, typed metadata out. This is the
    stage where a real pipeline would also decode — see decode_image."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _parse_batch(pdf)

    return df.mapInPandas(run, META_SCHEMA)


def decode_image(blob: bytes):
    """Decode a real image to an array. STUB: the sandbox has no imaging
    libraries; with PIL installed this body is complete."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return np.asarray(Image.open(io.BytesIO(blob)))
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decode requires PIL, not present in this environment; "
            "the deterministic MCSF header path (extract_media_meta) "
            "exercises the full Spark plumbing instead"
        ) from exc


def resize_meta(df: DataFrame, max_side: int = 256) -> DataFrame:
    """The resize *plan* (target dims preserving aspect) as pure column
    math — the pixel resample itself would live inside the decode UDF."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")),
    )
    return df.withColumn(
        "target_width", F.ceil(F.col("width") * scale).cast("int")
    ).withColumn("target_height", F.ceil(F.col("height") * scale).cast("int"))


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: explode the frame indices to
    fetch (0, n, 2n, ...) — one output row per (media, frame)."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)
    )
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
    )

"""Perceptual media fingerprints: near-duplicate IMAGE and AUDIO
detection over binary media columns.

Text near-dup has four engines here (MinHash/LSH, SimHash, span,
embedding); media blobs until now only had exact byte-hash dedup. But
the same photo re-encoded (PNG vs PPM), resized, or lightly
re-compressed is byte-distinct while pixel-near-identical — at 100 TB of
crawled media that's the dominant duplicate class. Reference analog: the
reference's dedup key is metadata-level (file path/version,
/root/reference/src/metadata_crawler/api/metadata_stores.py upsert
keys); content-level perceptual hashing is the web-scale extension, same
role its MinHash plays for text.

Design (all pure numpy on the stdlib decoders — no PIL, no scipy):

- ``dhash64``: the classic difference hash — grayscale, area-mean
  downsample to 8x9, bit = left pixel brighter than its right neighbor.
  Invariant to global brightness/contrast scaling (monotone transforms of
  intensity preserve the comparisons), stable under resize/re-encode
  noise.
- ``ahash64``: average hash (8x8, bit = pixel > mean) — a second,
  cheaper opinion; XOR-distance of the pair catches different failure
  modes (dhash = gradients, ahash = coarse luminance layout).
- ``audio_fp64``: spectrogram dHash — 16 time frames x rfft band
  energies pooled onto a 8x9 log-energy grid, then the SAME
  difference-hash rule along time (Haitsma-Kalker-style sign-of-
  difference features). Invariant to volume scaling (energy ratios),
  robust to re-quantization.

Spark surface: ``media_phash`` decodes inside ``mapInPandas`` — pixels
and PCM never leave the task; only (media_id, fmt, phash, ahash) rides
the exchange (~32 bytes/row at any corpus size). Pair finding reuses the
SimHash pigeonhole blocked join (``simhash_neardup_pairs``): hamming<=k
pairs share one exact 16-bit block, so candidate generation is an
equi-join — never a cross join, identical 100 TB story to text SimHash.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metadata_crawler_spark.operators.dedup import simhash_neardup_pairs
from metadata_crawler_spark.operators.multimodal import (
    decode_image,
    decode_wav,
    sniff_format,
)

# ---------------------------------------------------------------------------
# pixel-side primitives
# ---------------------------------------------------------------------------


def to_gray(img: np.ndarray) -> np.ndarray:
    """(H,W) or (H,W,C) uint8/uint16 -> float64 luma (H,W). Rec.601
    weights for RGB; alpha ignored; gray passes through."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 2:
        return a
    if a.shape[2] == 1:
        return a[:, :, 0]
    if a.shape[2] == 2:  # gray+alpha
        return a[:, :, 0]
    return a[:, :, 0] * 0.299 + a[:, :, 1] * 0.587 + a[:, :, 2] * 0.114


def area_resize(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic area-mean resample to (out_h, out_w). Downsampling:
    every source pixel lands in exactly one output cell (floor(r*out/in)),
    cell value is the mean of its pixels. An axis SMALLER than the target
    is first nearest-replicated up to the target size (dest cell r reads
    source row floor(r*in/out)) so every output cell is fed — zero-filled
    phantom cells would make small images hash nothing like their resized
    duplicates. bincount keeps the float64 summation order fixed ->
    bit-identical on any platform or partitioning."""
    h, w = gray.shape
    if h == 0 or w == 0:
        return np.zeros((out_h, out_w))
    if h < out_h:  # nearest-replicate rows up to the grid height
        gray = gray[(np.arange(out_h) * h) // out_h, :]
        h = out_h
    if w < out_w:  # nearest-replicate cols up to the grid width
        gray = gray[:, (np.arange(out_w) * w) // out_w]
        w = out_w
    ri = np.minimum((np.arange(h) * out_h) // h, out_h - 1)
    ci = np.minimum((np.arange(w) * out_w) // w, out_w - 1)
    idx = (ri[:, None] * out_w + ci[None, :]).ravel()
    sums = np.bincount(idx, weights=gray.ravel(), minlength=out_h * out_w)
    cnts = np.bincount(idx, minlength=out_h * out_w)
    return (sums / np.maximum(cnts, 1)).reshape(out_h, out_w)


def _pack_bits(bits: np.ndarray) -> int:
    """64 bools (row-major) -> signed int64 (bit i = bits[i]), matching
    the two's-complement packing text SimHash uses so hamming64/bit_count
    apply unchanged."""
    v = 0
    for i, b in enumerate(bits.ravel()[:64]):
        if b:
            v |= 1 << i
    # wrap to signed 64-bit (Spark LongType)
    return v - (1 << 64) if v >= 1 << 63 else v


def dhash64(img: np.ndarray) -> int:
    """Difference hash: 8x9 luma grid, bit = cell brighter than its right
    neighbor (8 rows x 8 comparisons = 64 bits)."""
    g = area_resize(to_gray(img), 8, 9)
    return _pack_bits(g[:, :-1] > g[:, 1:])


def ahash64(img: np.ndarray) -> int:
    """Average hash: 8x8 luma grid, bit = cell above the grid mean."""
    g = area_resize(to_gray(img), 8, 8)
    return _pack_bits(g > g.mean())


def audio_fp64(pcm: np.ndarray, rate: int, n_frames: int = 16) -> int:
    """Spectrogram difference hash. Mono-downmix, split into ``n_frames``
    equal windows, rfft magnitude per window pooled onto 8 log-spaced-ish
    bands x 9 time columns via :func:`area_resize` on the log-energy
    matrix, then the dHash comparison along time. Volume-invariant (log
    energy shifts by a constant; differences unchanged)."""
    x = np.asarray(pcm, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    n = x.shape[0]
    if n < n_frames * 2:  # too short for a spectrogram: hash the raw curve
        g = area_resize(x.reshape(1, -1) if n else np.zeros((1, 1)), 8, 9)
        return _pack_bits(g[:, :-1] > g[:, 1:])
    frame_len = n // n_frames
    frames = x[: frame_len * n_frames].reshape(n_frames, frame_len)
    mag = np.abs(np.fft.rfft(frames, axis=1))[:, 1:]  # drop DC
    loge = np.log1p(mag).T  # (bands, time)
    g = area_resize(loge, 8, 9)
    return _pack_bits(g[:, :-1] > g[:, 1:])


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

PHASH_SCHEMA = "media_id long, fmt string, phash long, ahash long, ok boolean"

#: formats the stdlib decoders turn into pixels / PCM
_IMAGE_FMTS = ("ppm", "pgm", "png", "jpeg")


def media_phash(
    df: DataFrame, blob_col: str = "media", id_col: str = "media_id"
) -> DataFrame:
    """(id, blob) -> (media_id, fmt, phash, ahash, ok). Images get
    dhash64/ahash64; WAV audio gets audio_fp64 in ``phash`` (ahash NULL);
    GIFs hash their FIRST frame (animation dedup = same opening frame);
    undecodable/unknown blobs -> ok=False with NULL hashes (bad media is
    data, not a task failure). Decode happens in the task; only the
    fingerprints ride the exchange."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                fmt = sniff_format(b)
                row = {
                    "media_id": mid, "fmt": fmt,
                    "phash": None, "ahash": None, "ok": False,
                }
                try:
                    if fmt in _IMAGE_FMTS:
                        a = decode_image(b)
                        row.update(phash=dhash64(a), ahash=ahash64(a), ok=True)
                    elif fmt == "gif":
                        from .gif_codec import decode_gif

                        fr, _ = decode_gif(b)
                        row.update(
                            phash=dhash64(fr[0]), ahash=ahash64(fr[0]), ok=True
                        )
                    elif fmt in ("wav", "flac"):
                        if fmt == "wav":
                            x, rate = decode_wav(b)
                        else:  # FLAC decodes losslessly -> identical
                            from .flac_codec import decode_flac  # fingerprint

                            x, rate = decode_flac(b)
                        row.update(phash=audio_fp64(x, rate), ok=True)
                except Exception:
                    row["ok"] = False
                rows.append(row)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, PHASH_SCHEMA)


def phash_neardup_pairs(
    hashes: DataFrame,
    max_hamming: int = 6,
    hash_col: str = "phash",
    id_col: str = "media_id",
) -> DataFrame:
    """Blocked perceptual-hash join: (id_a, id_b, hamming) for pairs
    within ``max_hamming`` bits. Delegates to the text SimHash pigeonhole
    join — block width adapts so hamming<=k pairs ALWAYS share one exact
    block: pigeonhole needs 64/width >= k+1 blocks, so width = the
    largest power-of-two divisor of 64 with that property (16 for k<=3,
    8 for k<=7, 4 for k<=15, 2 for k<=31, 1 for k<=63; k>=64 is every
    pair and raises). Candidate generation stays an equi-join at any
    corpus size; narrower blocks mean more candidates, never misses."""
    if not 0 <= max_hamming <= 63:
        raise ValueError(
            f"max_hamming={max_hamming} out of range for 64-bit "
            "fingerprints (0..63)"
        )
    bw = 16
    while 64 // bw < max_hamming + 1:
        bw //= 2
    sims = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("simhash")
    )
    return simhash_neardup_pairs(sims, max_hamming=max_hamming, block_bits=bw)


def media_neardup(
    df: DataFrame,
    max_hamming: int = 6,
    blob_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """End-to-end media near-dup: decode -> fingerprint -> blocked
    hamming join, returning (id_a, id_b, hamming). Audio and image hashes
    live in the same 64-bit space but different formats never collide in
    practice; filter on fmt upstream to scope to one modality."""
    return phash_neardup_pairs(
        media_phash(df, blob_col, id_col), max_hamming=max_hamming
    )

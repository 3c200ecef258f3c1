"""Pure-stdlib/numpy FLAC decoder + feature-flagged fixture encoder.

Closes most of the remaining audio gap in the multimodal tier
(``operators/multimodal.py`` — WAV decodes for real, FLAC was a header
probe): FLAC is the one mainstream *lossless* audio codec, so a
spec-faithful decoder is bit-exact verifiable against fixtures without
any imaging/audio library. The format is public (RFC 9639 / the
xiph.org specification); everything here is implemented from that spec.

Decoder coverage:
  - STREAMINFO parse + metadata-block skip (any block types)
  - frame headers: both blocking strategies, all block-size /
    sample-rate / sample-size codes (incl. the follow-up 8/16-bit
    forms), UTF-8-coded frame/sample numbers
  - channel assignments: independent (1..8), left/side, right/side,
    mid/side (side channel at +1 bit)
  - subframes: CONSTANT, VERBATIM, FIXED orders 0..4, LPC orders 1..32
    (quantized coefficients, signed shift), wasted-bits unary prefix
  - residual: RICE (4-bit) and RICE2 (5-bit) partition methods, any
    partition order, escape (unencoded) partitions
  - CRC-8 (frame header) and CRC-16 (frame) are *computed and checked*;
    a mismatch raises ValueError (corrupt media is data, callers map it
    to ok=False rows — multimodal.media_pixel_stats).

The encoder exists to MAKE deterministic test vectors (same policy as
``encode_png`` / the WebP fixture encoder): it writes CONSTANT /
VERBATIM / FIXED / LPC subframes with real rice-coded residuals, any
partition order, all four stereo modes and optional wasted bits, so
every decoder path round-trips in pytest. It is not a compression-tuned
production encoder and says so.

Reference analog: ``open_dataset`` engine dispatch
(/root/reference/src/metadata_crawler/api/storage_backend.py:102-149) —
the reference hands media to format engines; our engine's jar-free tier
grows FLAC here.

Scale shape: decoding happens inside ``mapInPandas`` tasks next to the
bytes; only per-blob summaries ride the exchange. The bit reader is a
numpy-backed MSB-first cursor (precomputed one-positions +
``searchsorted`` give O(log n) unary scans), plenty for metadata-scale
feature extraction; a 100 TB audio transcode farm would swap in a
native codec behind the same (samples, rate) contract.
"""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCK_SIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_SAMPLE_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    """CRC-8 poly 0x07, init 0 (FLAC frame-header CRC)."""
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 poly 0x8005, init 0 (FLAC whole-frame CRC)."""
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit cursor over a bytes buffer: numpy ``unpackbits``
    for n-bit reads, precomputed one-positions + ``searchsorted`` for
    O(log n) unary scans (rice quotients)."""

    __slots__ = ("bits", "ones", "pos")

    def __init__(self, buf: bytes):
        self.bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        chunk = self.bits[self.pos : self.pos + n]
        if chunk.size < n:
            raise ValueError("flac: truncated stream")
        self.pos += n
        val = 0
        for b in chunk.tolist():
            val = (val << 1) | b
        return val

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        i = np.searchsorted(self.ones, self.pos)
        if i >= self.ones.size:
            raise ValueError("flac: truncated unary code")
        stop = int(self.ones[i])
        q = stop - self.pos
        self.pos = stop + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


def _read_utf8_number(bits: _Bits) -> int:
    """FLAC's UTF-8-style variable-length frame/sample number (extended
    to 36 bits / 7 bytes)."""
    first = bits.read(8)
    if first < 0x80:
        return first
    n_ones = 0
    mask = 0x80
    while first & mask:
        n_ones += 1
        mask >>= 1
    if n_ones < 2 or n_ones > 7:
        raise ValueError("flac: bad utf8-coded number")
    val = first & (0x7F >> n_ones)
    for _ in range(n_ones - 1):
        cont = bits.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("flac: bad utf8 continuation")
        val = (val << 6) | (cont & 0x3F)
    return val


def _decode_residual(bits: _Bits, block_size: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = bits.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts:
        raise ValueError("flac: block size not divisible by partitions")
    out: list[int] = []
    for p in range(n_parts):
        n = block_size >> part_order
        if p == 0:
            n -= order
        param = bits.read(plen)
        if param == escape:
            raw_bits = bits.read(5)
            for _ in range(n):
                out.append(bits.read_signed(raw_bits) if raw_bits else 0)
        else:
            for _ in range(n):
                q = bits.unary()
                r = bits.read(param) if param else 0
                v = (q << param) | r
                out.append((v >> 1) ^ -(v & 1))  # un-zigzag
    return out


def _predict(warmup: list[int], resid: list[int], coeffs: list[int],
             shift: int) -> list[int]:
    x = list(warmup)
    order = len(coeffs)
    for r in resid:
        pred = 0
        for j, c in enumerate(coeffs):
            pred += c * x[-1 - j]
        x.append(r + (pred >> shift))
    del order
    return x


def _decode_subframe(bits: _Bits, block_size: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("flac: bad subframe padding bit")
    sf_type = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
        bps -= wasted
    if sf_type == 0:  # CONSTANT
        v = bits.read_signed(bps)
        x = [v] * block_size
    elif sf_type == 1:  # VERBATIM
        x = [bits.read_signed(bps) for _ in range(block_size)]
    elif 8 <= sf_type <= 12:  # FIXED order 0..4
        order = sf_type - 8
        warm = [bits.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(bits, block_size, order)
        x = _predict(warm, resid, _FIXED_COEFFS[order], 0)
    elif sf_type >= 32:  # LPC, order = (type & 31) + 1
        order = (sf_type & 31) + 1
        warm = [bits.read_signed(bps) for _ in range(order)]
        prec = bits.read(4)
        if prec == 15:
            raise ValueError("flac: invalid qlp precision")
        prec += 1
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative qlp shift")
        coeffs = [bits.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(bits, block_size, order)
        x = _predict(warm, resid, coeffs, shift)
    else:
        raise ValueError(f"flac: reserved subframe type {sf_type}")
    if wasted:
        x = [v << wasted for v in x]
    return x


def parse_streaminfo(blob: bytes) -> dict:
    """STREAMINFO + the byte offset of the first frame."""
    if blob[:4] != b"fLaC":
        raise ValueError("flac: bad magic")
    i = 4
    info: dict | None = None
    while True:
        hdr = blob[i]
        last, btype = hdr & 0x80, hdr & 0x7F
        ln = int.from_bytes(blob[i + 1 : i + 4], "big")
        if btype == 0:
            si = blob[i + 4 : i + 4 + ln]
            rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
            channels = ((si[12] >> 1) & 0x7) + 1
            bps = (((si[12] & 1) << 4) | (si[13] >> 4)) + 1
            total = ((si[13] & 0x0F) << 32) | int.from_bytes(si[14:18], "big")
            info = {
                "min_block": int.from_bytes(si[0:2], "big"),
                "max_block": int.from_bytes(si[2:4], "big"),
                "sample_rate": rate, "channels": channels,
                "bits_per_sample": bps, "total_samples": total,
            }
        i += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("flac: missing STREAMINFO")
    info["frames_at"] = i
    return info


def decode_flac(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream to (samples float64 in [-1, 1], shaped
    (n_frames, n_channels), sample_rate) — the ``decode_wav`` contract,
    so the multimodal stats tier treats both identically."""
    info = parse_streaminfo(blob)
    bits = _Bits(blob)
    bits.pos = info["frames_at"] * 8
    chans: list[list[int]] = [[] for _ in range(info["channels"])]
    total_bits = bits.bits.size
    while bits.pos + 32 <= total_bits:
        frame_start = bits.byte_pos()
        sync = bits.read(14)
        if sync != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        bits.read(1)  # reserved
        bits.read(1)  # blocking strategy (number semantics don't change decode)
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        bits.read(1)  # reserved
        _read_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("flac: reserved block size code")
        elif bs_code == 6:
            block_size = bits.read(8) + 1
        elif bs_code == 7:
            block_size = bits.read(16) + 1
        else:
            block_size = _BLOCK_SIZE_CODES[bs_code]
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        elif sr_code == 15:
            raise ValueError("flac: invalid sample rate code")
        if ss_code == 0:
            bps = info["bits_per_sample"]
        elif ss_code in _SAMPLE_SIZE_CODES:
            bps = _SAMPLE_SIZE_CODES[ss_code]
        else:  # reserved code 3: ValueError per the corrupt-media contract
            raise ValueError("flac: reserved sample size code")
        # header CRC-8 covers sync..crc byte exclusive
        hdr_end = bits.byte_pos()
        expect8 = bits.read(8)
        if _crc8(blob[frame_start:hdr_end]) != expect8:
            raise ValueError("flac: frame header CRC mismatch")
        if ch_code <= 7:
            n_ch = ch_code + 1
            subs = [
                _decode_subframe(bits, block_size, bps) for _ in range(n_ch)
            ]
        elif ch_code in (8, 9, 10):
            n_ch = 2
            # left/side: ch0 normal, ch1 side(+1); right/side: ch0
            # side(+1), ch1 normal; mid/side: ch0 mid, ch1 side(+1)
            bps0 = bps + (1 if ch_code == 9 else 0)
            bps1 = bps + (1 if ch_code in (8, 10) else 0)
            s0 = _decode_subframe(bits, block_size, bps0)
            s1 = _decode_subframe(bits, block_size, bps1)
            if ch_code == 8:  # left/side
                left = s0
                right = [a - b for a, b in zip(s0, s1)]
            elif ch_code == 9:  # right/side: s0=side, s1=right
                right = s1
                left = [a + b for a, b in zip(s1, s0)]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(s0, s1):
                    lr_sum = (m << 1) | (s & 1)
                    left.append((lr_sum + s) >> 1)
                    right.append((lr_sum - s) >> 1)
            subs = [left, right]
        else:
            raise ValueError("flac: reserved channel assignment")
        if len(subs) != info["channels"]:
            raise ValueError("flac: channel count mismatch")
        bits.align()
        frame_end = bits.byte_pos()
        expect16 = bits.read(16)
        if _crc16(blob[frame_start:frame_end]) != expect16:
            raise ValueError("flac: frame CRC mismatch")
        for c, s in enumerate(subs):
            chans[c].extend(s)
    n = min(len(c) for c in chans)
    if info["total_samples"]:
        n = min(n, info["total_samples"])
    arr = np.array([c[:n] for c in chans], dtype=np.float64).T
    scale = float(1 << (info["bits_per_sample"] - 1))
    return arr / scale, info["sample_rate"]


# ---------------------------------------------------------------------------
# Fixture encoder (test vectors only — not a production compressor)
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        if n == 0:
            return
        val &= (1 << n) - 1
        self.acc = (self.acc << n) | val
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _write_utf8_number(w: _BitWriter, val: int) -> None:
    if val < 0x80:
        w.write(val, 8)
        return
    # pick the shortest multi-byte form
    for n_ones in range(2, 8):
        payload_bits = (7 - n_ones) + 6 * (n_ones - 1)
        if val < (1 << payload_bits):
            break
    head_bits = 7 - n_ones
    w.write((0xFF << (8 - n_ones)) & 0xFF | (val >> (6 * (n_ones - 1))), 8)
    del head_bits
    for k in range(n_ones - 2, -1, -1):
        w.write(0x80 | ((val >> (6 * k)) & 0x3F), 8)


def _rice_encode(w: _BitWriter, resid: list[int], param: int,
                 plen: int, part_order: int, order: int,
                 block_size: int) -> None:
    w.write(part_order, 4)
    n_parts = 1 << part_order
    idx = 0
    for p in range(n_parts):
        n = block_size >> part_order
        if p == 0:
            n -= order
        w.write(param, plen)
        for _ in range(n):
            v = resid[idx]
            idx += 1
            u = (abs(v) << 1) - (1 if v < 0 else 0)  # zigzag
            w.write_unary(u >> param)
            w.write(u, param)


def _residual_of(x: list[int], coeffs: list[int], shift: int) -> list[int]:
    order = len(coeffs)
    out = []
    for i in range(order, len(x)):
        pred = sum(c * x[i - 1 - j] for j, c in enumerate(coeffs))
        out.append(x[i] - (pred >> shift))
    return out


def _clamp_part_order(part_order: int, n: int, order: int) -> int:
    """Largest legal partition order <= the requested one for a block of
    ``n`` samples and predictor ``order``: every partition must divide
    ``n`` and the first partition (which loses ``order`` warmup samples)
    must stay non-empty. The final partial block of a stream routinely
    violates the caller's requested order (found by fuzzing: n=1,
    part_order=1 emitted a stream the decoder correctly rejects)."""
    po = part_order
    while po > 0 and (n % (1 << po) or (n >> po) <= order):
        po -= 1
    return po


def _encode_subframe(w: _BitWriter, x: list[int], bps: int, mode: str,
                     lpc_coeffs: list[int] | None, lpc_shift: int,
                     rice_param: int, part_order: int,
                     rice2: bool, wasted: int) -> None:
    if mode.startswith("fixed") and int(mode[-1]) >= len(x):
        # a predictor order >= the (final partial) block length cannot
        # even write its warmup samples — verbatim is the lossless
        # fallback real encoders use for the tail block
        mode = "verbatim"
    if mode == "lpc" and lpc_coeffs and len(lpc_coeffs) >= len(x):
        mode = "verbatim"
    if wasted:
        assert all(v % (1 << wasted) == 0 for v in x)
        x = [v >> wasted for v in x]
        bps -= wasted
    if mode == "constant":
        w.write(0, 1)
        w.write(0, 6)
        w.write(1 if wasted else 0, 1)
        if wasted:
            w.write_unary(wasted - 1)
        w.write(x[0], bps)
        return
    if mode == "verbatim":
        w.write(0, 1)
        w.write(1, 6)
        w.write(1 if wasted else 0, 1)
        if wasted:
            w.write_unary(wasted - 1)
        for v in x:
            w.write(v, bps)
        return
    if mode.startswith("fixed"):
        order = int(mode[-1])
        w.write(0, 1)
        w.write(8 + order, 6)
        w.write(1 if wasted else 0, 1)
        if wasted:
            w.write_unary(wasted - 1)
        for v in x[:order]:
            w.write(v, bps)
        resid = _residual_of(x, _FIXED_COEFFS[order], 0)
        w.write(1 if rice2 else 0, 2)
        _rice_encode(w, resid, rice_param, 5 if rice2 else 4,
                     _clamp_part_order(part_order, len(x), order),
                     order, len(x))
        return
    if mode == "lpc":
        assert lpc_coeffs
        order = len(lpc_coeffs)
        prec = max(max(abs(c) for c in lpc_coeffs).bit_length() + 1, 2)
        w.write(0, 1)
        w.write(32 + order - 1, 6)
        w.write(1 if wasted else 0, 1)
        if wasted:
            w.write_unary(wasted - 1)
        for v in x[:order]:
            w.write(v, bps)
        w.write(prec - 1, 4)
        w.write(lpc_shift, 5)
        for c in lpc_coeffs:
            w.write(c, prec)
        resid = _residual_of(x, lpc_coeffs, lpc_shift)
        w.write(1 if rice2 else 0, 2)
        _rice_encode(w, resid, rice_param, 5 if rice2 else 4,
                     _clamp_part_order(part_order, len(x), order),
                     order, len(x))
        return
    raise ValueError(f"unknown subframe mode {mode}")


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 8000,
    bits_per_sample: int = 16,
    block_size: int = 256,
    mode: str = "verbatim",
    stereo_mode: str = "indep",
    lpc_coeffs: list[int] | None = None,
    lpc_shift: int = 0,
    rice_param: int = 4,
    part_order: int = 0,
    rice2: bool = False,
    wasted: int = 0,
) -> bytes:
    """Fixture encoder: ``samples`` is int array (n, channels) at
    ``bits_per_sample``. ``mode``: constant|verbatim|fixed0..fixed4|lpc;
    ``stereo_mode``: indep|left_side|right_side|mid_side (2ch only).
    Every emitted structure is spec-shaped (valid CRCs, correct
    padding), so the decoder tests are honest round-trips."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, n_ch = samples.shape
    if stereo_mode != "indep" and n_ch != 2:
        raise ValueError("stereo modes need exactly 2 channels")
    out = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    rate_ch_bps = (sample_rate << 16) | ((n_ch - 1) << 13) | (
        (bits_per_sample - 1) << 8
    )
    # 20-bit rate | 3-bit ch-1 | 5-bit bps-1 | 36-bit total, packed by hand
    b = bytearray(8)
    b[0] = (sample_rate >> 12) & 0xFF
    b[1] = (sample_rate >> 4) & 0xFF
    b[2] = ((sample_rate & 0xF) << 4) | ((n_ch - 1) << 1) | (
        (bits_per_sample - 1) >> 4
    )
    b[3] = (((bits_per_sample - 1) & 0xF) << 4) | ((n >> 32) & 0xF)
    b[4:8] = struct.pack(">I", n & 0xFFFFFFFF)
    si += b + b"\x00" * 16  # md5 of raw audio: zeros = unknown
    del rate_ch_bps
    out.append(0x80)  # last block, STREAMINFO
    out += len(si).to_bytes(3, "big")
    out += si
    frame_no = 0
    for start in range(0, n, block_size):
        blk = samples[start : start + block_size]
        bs = blk.shape[0]
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed-blocksize strategy
        if bs == block_size and block_size in _BLOCK_SIZE_CODES.values():
            code = next(
                k for k, v in _BLOCK_SIZE_CODES.items() if v == block_size
            )
            w.write(code, 4)
            tail_bs = None
        else:
            w.write(7, 4)  # 16-bit block size follows
            tail_bs = bs - 1
        sr_code = next(
            (k for k, v in _SAMPLE_RATE_CODES.items() if v == sample_rate), 0
        )
        w.write(sr_code, 4)
        ch_code = {
            "indep": n_ch - 1, "left_side": 8,
            "right_side": 9, "mid_side": 10,
        }[stereo_mode]
        w.write(ch_code, 4)
        ss_code = next(
            (k for k, v in _SAMPLE_SIZE_CODES.items() if v == bits_per_sample),
            0,
        )
        w.write(ss_code, 3)
        w.write(0, 1)
        _write_utf8_number(w, frame_no)
        if tail_bs is not None:
            w.write(tail_bs, 16)
        hdr = bytes(w.buf) if w.nbits == 0 else None
        assert hdr is not None, "frame header must be byte-aligned here"
        w.write(_crc8(hdr), 8)
        if stereo_mode == "indep":
            chan_data = [
                (blk[:, c].tolist(), bits_per_sample) for c in range(n_ch)
            ]
        else:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            side = (left - right).tolist()
            if stereo_mode == "left_side":
                chan_data = [
                    (left.tolist(), bits_per_sample),
                    (side, bits_per_sample + 1),
                ]
            elif stereo_mode == "right_side":
                chan_data = [
                    (side, bits_per_sample + 1),
                    (right.tolist(), bits_per_sample),
                ]
            else:  # mid_side
                mid = ((left + right) >> 1).tolist()
                chan_data = [
                    (mid, bits_per_sample),
                    (side, bits_per_sample + 1),
                ]
        for x, bps_c in chan_data:
            _encode_subframe(
                w, x, bps_c, mode, lpc_coeffs, lpc_shift,
                rice_param, part_order, rice2, wasted,
            )
        w.align()
        frame = w.bytes()
        out += frame
        out += struct.pack(">H", _crc16(frame))
        frame_no += 1
    return bytes(out)

"""Pure-stdlib baseline JPEG codec (no PIL, no jars).

JPEG (with PNG, closed in r5) covers the overwhelming majority of real
web images; this module closes the baseline-sequential JFIF subset so the
multimodal tier (operators/multimodal.py X5 dispatch, reference analog
``open_dataset`` storage_backend.py:102-149) decodes it jar-free:

- ``decode_jpeg``: marker parse (DQT/SOF0/DHT/DRI/SOS), canonical Huffman
  decode of the interleaved entropy-coded scan (byte unstuffing, restart
  markers), dequantize + de-zigzag, vectorized 8x8 IDCT over ALL blocks
  at once (one einsum — the per-bit Huffman walk is the only Python
  loop), chroma upsample, JFIF YCbCr->RGB. Grayscale and 4:4:4/4:2:2/
  4:2:0 color, baseline 8-bit, single interleaved scan.
- ``encode_jpeg``: the matching fixture-side writer (like render_warc /
  encode_png): forward DCT, configurable uniform quantization and
  optional 4:2:0 subsampling, spec Annex-K style Huffman tables.
  JPEG is lossy, so tests assert bounded reconstruction error at
  quant=1 (only DCT rounding) rather than byte equality.

Progressive JPEG, arithmetic coding and 12-bit precision raise
ValueError — callers surface those as ok=False data rows. At 100 TB a
production decode stage would swap this for a native library via the
same ``decode_image`` dispatch; the format plumbing, schema and batch
shape stay identical.
"""

from __future__ import annotations

import struct

import numpy as np

#: zigzag order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

#: DCT-II basis matrix C[u, x] = alpha(u) cos((2x+1) u pi / 16)
_C = np.array([
    [
        (np.sqrt(1.0 / 8) if u == 0 else np.sqrt(2.0 / 8))
        * np.cos((2 * x + 1) * u * np.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
])

# spec Annex K Huffman table specs: (bits[1..16] counts, symbols)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


class _Huffman:
    """Canonical Huffman table (spec §C): decode via per-length
    min/max-code comparison; encode via symbol -> (code, length)."""

    def __init__(self, counts: list[int], symbols: list[int]) -> None:
        self.symbols = list(symbols)
        code = 0
        k = 0
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.enc: dict[int, tuple[int, int]] = {}
        for ln in range(1, 17):
            self.valptr[ln] = k
            self.mincode[ln] = code
            for _ in range(counts[ln - 1]):
                self.enc[symbols[k]] = (code, ln)
                code += 1
                k += 1
            self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, rd: "_BitReader") -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | rd.bit()
            if code <= self.maxcode[ln]:
                return self.symbols[self.valptr[ln] + code - self.mincode[ln]]
        raise ValueError("invalid Huffman code in JPEG scan")


class _BitReader:
    """MSB-first bit reader over already-unstuffed entropy bytes."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.cur = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG scan data")
            self.cur = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, s: int) -> int:
    """spec §F.2.2.1: map an s-bit magnitude to its signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """Vectorized 2-D IDCT over (n, 8, 8) coefficient blocks."""
    return np.einsum("ux,nuv,vy->nxy", _C, coeffs, _C, optimize=True)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """Vectorized forward DCT over (n, 8, 8) spatial blocks."""
    return np.einsum("ux,nxy,vy->nuv", _C, blocks, _C, optimize=True)


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline-sequential JFIF decode -> (h, w) gray or (h, w, 3) RGB
    uint8. Raises ValueError on progressive/arithmetic/12-bit streams."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG blob")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huffman] = {}  # (class 0=DC/1=AC, id)
    frame = None
    restart_interval = 0
    i = 2
    scan = None
    while i + 4 <= len(blob):
        if blob[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        # spec B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while i + 1 < len(blob) and blob[i + 1] == 0xFF:
            i += 1
        marker = blob[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (ln,) = struct.unpack(">H", blob[i + 2 : i + 4])
        seg = blob[i + 4 : i + 2 + ln]
        i += 2 + ln
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                n = 64 * (2 if prec else 1)
                raw = seg[p + 1 : p + 1 + n]
                tbl = (
                    np.frombuffer(raw, dtype=">u2")
                    if prec
                    else np.frombuffer(raw, dtype=np.uint8)
                ).astype(np.float64)
                qt[tid] = tbl
                p += 1 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline(+ext sequential)
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("progressive/arithmetic JPEG unsupported")
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                syms = list(seg[p + 17 : p + 17 + n])
                huff[(cls, tid)] = _Huffman(counts, syms)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS: header seg + entropy data follows
            ns = seg[0]
            smap = []
            for c in range(ns):
                cs, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                smap.append((cs, tabs >> 4, tabs & 0xF))
            # entropy-coded data runs to the next non-RST marker
            j = i
            while j + 1 < len(blob):
                if blob[j] == 0xFF and blob[j + 1] not in (0x00,) and not (
                    0xD0 <= blob[j + 1] <= 0xD7
                ):
                    break
                j += 1
            scan = (smap, blob[i:j])
            i = j
        elif marker == 0xD9:  # EOI
            break
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    h, w, comps = frame
    smap, data = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # restart-interval segments: split on RST markers, each resets DC
    segments = []
    if restart_interval:
        cur = bytearray()
        j = 0
        while j < len(data):
            if data[j] == 0xFF and j + 1 < len(data):
                nxt = data[j + 1]
                if nxt == 0x00:
                    cur.append(0xFF)
                    j += 2
                    continue
                if 0xD0 <= nxt <= 0xD7:
                    segments.append(bytes(cur))
                    cur = bytearray()
                    j += 2
                    continue
            cur.append(data[j])
            j += 1
        segments.append(bytes(cur))
    else:
        segments = [data.replace(b"\xff\x00", b"\xff")]

    by_id = {cid: (hf, vf, tq) for cid, hf, vf, tq in comps}
    order = [(cs, by_id[cs][0], by_id[cs][1], by_id[cs][2], td, ta)
             for cs, td, ta in smap]
    nblocks = {cs: mcux * mcuy * hf * vf for cs, hf, vf, _, _, _ in order}
    coeff = {cs: np.zeros((nblocks[cs], 64)) for cs in by_id if cs in nblocks}
    blkpos: dict[int, list[tuple[int, int]]] = {cs: [] for cs in nblocks}

    mcu_idx = 0
    bi = {cs: 0 for cs in nblocks}
    for seg_data in segments:
        rd = _BitReader(seg_data)
        pred = {cs: 0 for cs in nblocks}
        mcus_here = (
            min(restart_interval, mcux * mcuy - mcu_idx)
            if restart_interval
            else mcux * mcuy - mcu_idx
        )
        for _ in range(mcus_here):
            my, mx = divmod(mcu_idx, mcux)
            for cs, hf, vf, _tq, td, ta in order:
                dc_t, ac_t = huff[(0, td)], huff[(1, ta)]
                for bv in range(vf):
                    for bh in range(hf):
                        zz = np.zeros(64)
                        s = dc_t.decode(rd)
                        diff = _extend(rd.bits(s), s) if s else 0
                        pred[cs] += diff
                        zz[0] = pred[cs]
                        k = 1
                        while k < 64:
                            rs = ac_t.decode(rd)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(rd.bits(s), s)
                            k += 1
                        coeff[cs][bi[cs]] = zz
                        blkpos[cs].append(
                            ((my * vf + bv) * 8, (mx * hf + bh) * 8)
                        )
                        bi[cs] += 1
            mcu_idx += 1
    if mcu_idx != mcux * mcuy:
        raise ValueError("truncated JPEG scan (missing MCUs)")

    planes = {}
    for cs, hf, vf, tq, _td, _ta in order:
        dq = coeff[cs] * qt[tq][None, :]
        blocks = np.zeros((bi[cs], 8, 8))
        blocks.reshape(bi[cs], 64)[:, _ZIGZAG] = dq
        spatial = _idct_blocks(blocks) + 128.0
        plane = np.zeros((mcuy * vf * 8, mcux * hf * 8))
        for n, (py, px) in enumerate(blkpos[cs]):
            plane[py : py + 8, px : px + 8] = spatial[n]
        # upsample to full MCU-grid resolution, crop to the image
        plane = np.repeat(np.repeat(plane, vmax // vf, 0), hmax // hf, 1)
        planes[cs] = plane[:h, :w]

    if len(order) == 1:
        return np.clip(np.round(planes[order[0][0]]), 0, 255).astype(np.uint8)
    y, cb, cr = (planes[cs] for cs, *_ in order)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, ln: int) -> None:
        for k in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (size s, s-bit magnitude code)."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def encode_jpeg(
    arr: np.ndarray,
    quant: int = 1,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline JFIF writer (fixture side): 8-bit gray (h, w) or
    RGB (h, w, 3); uniform quantization ``quant`` (1 = only DCT rounding
    is lossy); ``subsample=True`` emits 4:2:0 chroma;
    ``restart_interval`` > 0 emits DRI + RSTn markers every n MCUs (the
    parallel-decode hook real encoders use). Annex-K style Huffman
    tables."""
    a = np.asarray(arr, dtype=np.float64)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if gray:
        planes = [a]
        factors = [(1, 1)]
        tqs = [0]
    else:
        y = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
        cb = 128.0 - 0.168736 * a[:, :, 0] - 0.331264 * a[:, :, 1] + 0.5 * a[:, :, 2]
        cr = 128.0 + 0.5 * a[:, :, 0] - 0.418688 * a[:, :, 1] - 0.081312 * a[:, :, 2]
        if subsample:
            # 2x2 mean-pool chroma (pad to even first)
            def pool(p):
                ph = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                            mode="edge")
                return (
                    ph[0::2, 0::2] + ph[1::2, 0::2]
                    + ph[0::2, 1::2] + ph[1::2, 1::2]
                ) / 4.0

            planes = [y, pool(cb), pool(cr)]
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            factors = [(1, 1), (1, 1), (1, 1)]
        tqs = [0, 1, 1]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qtab = np.full(64, float(quant))

    # per-component zigzag coefficient blocks in MCU-interleaved order
    comp_blocks: list[list[np.ndarray]] = []
    for (hf, vf), plane in zip(factors, planes):
        pw, ph_ = mcux * hf * 8, mcuy * vf * 8
        p = np.empty((ph_, pw))
        p[: plane.shape[0], : plane.shape[1]] = plane
        p[plane.shape[0] :, : plane.shape[1]] = plane[-1:, :]
        p[:, plane.shape[1] :] = p[:, plane.shape[1] - 1 : plane.shape[1]]
        blocks = []
        for my in range(mcuy):
            for mx in range(mcux):
                for bv in range(vf):
                    for bh in range(hf):
                        py, px = (my * vf + bv) * 8, (mx * hf + bh) * 8
                        blocks.append(p[py : py + 8, px : px + 8])
        spectral = _fdct_blocks(np.stack(blocks) - 128.0)
        # zigzag-order the coefficients: zz[i] = block.flat[_ZIGZAG[i]]
        qz = np.round(spectral.reshape(-1, 64)[:, _ZIGZAG] / qtab)
        comp_blocks.append([qz[n] for n in range(qz.shape[0])])

    dc_tabs = [_Huffman(*_DC_LUMA), _Huffman(*_DC_CHROMA)]
    ac_tabs = [_Huffman(*_AC_LUMA), _Huffman(*_AC_CHROMA)]
    wtr = _BitWriter()
    entropy_parts: list[bytes] = []
    pred = [0] * len(planes)
    idx = [0] * len(planes)
    for _m in range(mcux * mcuy):
        if restart_interval and _m and _m % restart_interval == 0:
            entropy_parts.append(wtr.flush())
            wtr = _BitWriter()
            pred = [0] * len(planes)
        for c, (hf, vf) in enumerate(factors):
            dct_t = dc_tabs[0 if c == 0 else 1]
            act_t = ac_tabs[0 if c == 0 else 1]
            for _ in range(hf * vf):
                zz = comp_blocks[c][idx[c]]
                idx[c] += 1
                dc = int(zz[0])
                s, mag = _magnitude(dc - pred[c])
                pred[c] = dc
                code, ln = dct_t.enc[s]
                wtr.write(code, ln)
                if s:
                    wtr.write(mag, s)
                run = 0
                last_nz = 0
                for k in range(1, 64):
                    if zz[k] != 0:
                        last_nz = k
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = act_t.enc[0xF0]  # ZRL
                        wtr.write(code, ln)
                        run -= 16
                    s, mag = _magnitude(v)
                    code, ln = act_t.enc[(run << 4) | s]
                    wtr.write(code, ln)
                    wtr.write(mag, s)
                    run = 0
                if last_nz < 63:
                    code, ln = act_t.enc[0x00]  # EOB
                    wtr.write(code, ln)
    entropy_parts.append(wtr.flush())
    entropy = entropy_parts[0] + b"".join(
        bytes([0xFF, 0xD0 + ((k - 1) % 8)]) + part
        for k, part in enumerate(entropy_parts[1:], start=1)
    )

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(qtab.astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qtab.astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(planes)])
    for c, ((hf, vf), tq) in enumerate(zip(factors, tqs)):
        sof += bytes([c + 1, (hf << 4) | vf, tq])
    out += seg(0xC0, sof)
    for cls, tid, spec_ in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA), (0, 1, _DC_CHROMA),
        (1, 1, _AC_CHROMA),
    ):
        if gray and tid == 1:
            continue
        counts, syms = spec_
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(counts) + bytes(syms))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for c in range(len(planes)):
        td = ta = 0 if c == 0 else 1
        sos += bytes([c + 1, (td << 4) | ta])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)

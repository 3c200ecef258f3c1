"""Pure-stdlib JPEG codec: baseline AND progressive (no PIL, no jars).

JPEG (with PNG, closed in r5) covers the overwhelming majority of real
web images; this module closes the JFIF Huffman subset so the multimodal
tier (operators/multimodal.py X5 dispatch, reference analog
``open_dataset`` storage_backend.py:102-149) decodes it jar-free:

- ``decode_jpeg``: marker parse (DQT/SOF0/SOF1/SOF2/DHT/DRI/SOS),
  canonical Huffman decode of the entropy-coded scans (byte unstuffing,
  restart markers), dequantize + de-zigzag, vectorized 8x8 IDCT over ALL
  blocks at once (one einsum — the per-bit Huffman walk is the only
  Python loop), chroma upsample, JFIF YCbCr->RGB. Grayscale and
  4:4:4/4:2:2/4:2:0 color, 8-bit. Sequential streams decode single- or
  multi-scan (interleaved and non-interleaved); progressive streams
  (SOF2 — the majority of large web JPEGs) decode the full spec §G.1.2
  scan algebra: spectral selection (Ss..Se bands), successive
  approximation (DC first/refine with point transform Al, AC first with
  EOB-run coding, AC refinement with correction bits), scans
  accumulating into one per-component coefficient store that tolerates
  table redefinition (DHT/DQT/DRI between scans).
- ``encode_jpeg``: the matching fixture-side writer (like render_warc /
  encode_png): forward DCT, configurable uniform quantization and
  optional 4:2:0 subsampling, spec Annex-K style Huffman tables;
  ``progressive=True`` emits a real multi-scan script (interleaved DC
  first at Al=1 + DC refine; per-component AC band scans mixing
  straight Ss/Se bands with an Al=1 first pass + Al=0 refinement, so
  every decoder branch — EOBn, ZRL-in-refinement, correction bits — is
  exercised). JPEG is lossy, so tests assert bounded reconstruction
  error at quant=1 (only DCT rounding) rather than byte equality.

Arithmetic coding, hierarchical/lossless modes and 12-bit precision
raise ValueError — callers surface those as ok=False data rows. At
100 TB a production decode stage would swap this for a native library
via the same ``decode_image`` dispatch; the format plumbing, schema and
batch shape stay identical.
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


def _parse_jpeg(blob: bytes):
    """Marker walk -> (frame, scans, qt). ``frame`` is (h, w, comps,
    progressive); each scan snapshots the Huffman tables and restart
    interval in effect at its SOS (both may be redefined between
    progressive scans, spec B.2.4)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG blob")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huffman] = {}  # (class 0=DC/1=AC, id)
    frame = None
    restart_interval = 0
    scans = []
    i = 2
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps, marker == 0xC2)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("arithmetic/lossless/hierarchical JPEG "
                             "unsupported")
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
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            # entropy-coded data runs to the next non-RST marker
            j = i
            while j + 1 < len(blob):
                if blob[j] == 0xFF and blob[j + 1] not in (0x00,) and not (
                    0xD0 <= blob[j + 1] <= 0xD7
                ):
                    break
                j += 1
            scans.append((smap, ss, se, ahal >> 4, ahal & 0xF, blob[i:j],
                          dict(huff), restart_interval))
            i = j
        elif marker == 0xD9:  # EOI
            break
    if frame is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")
    return frame, scans, qt


def _split_entropy(data: bytes, restart_interval: int) -> list[bytes]:
    """Unstuff 0xFF00 and split the scan's entropy data on RSTn markers
    (each segment restarts DC prediction and the EOB run)."""
    if not restart_interval:
        return [data.replace(b"\xff\x00", b"\xff")]
    segments = []
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
    return segments


def _seq_block(rd: _BitReader, dc_t: _Huffman, ac_t: _Huffman,
               zz: np.ndarray, pred: dict, cs: int) -> None:
    """One full sequential DC+AC block (spec §F.2.2)."""
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


def _ac_first_block(rd: _BitReader, ac_t: _Huffman, zz: np.ndarray,
                    ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC first pass for one block (spec §G.1.2.2): run/size
    coding of the band's point-transformed coefficients with EOBn
    run-length codes spanning blocks. Returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = ac_t.decode(rd)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:  # EOBn: run of (1<<r)+bits(r) all-EOB blocks
                eobrun = (1 << r) - 1  # current block is the first
                if r:
                    eobrun += rd.bits(r)
                return eobrun
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        zz[k] = _extend(rd.bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(rd: _BitReader, ac_t: _Huffman, zz: np.ndarray,
                     ss: int, se: int, al: int, eobrun: int) -> int:
    """Progressive AC successive-approximation refinement for one block
    (spec §G.1.2.3): newly-nonzero coefficients arrive as ±1<<Al runs;
    every already-nonzero coefficient passed on the way consumes one
    correction bit. Returns the updated EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = ac_t.decode(rd)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r  # decremented below for this block
                    if r:
                        eobrun += rd.bits(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history coeffs below
            else:
                if s != 1:
                    raise ValueError("bad magnitude in AC refinement scan")
                newval = p1 if rd.bit() else m1
            # advance over r zero-history coefficients; already-nonzero
            # coefficients consume a correction bit instead of the run
            while k <= se:
                if zz[k] != 0:
                    if rd.bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        # inside an EOB run: only correction bits for nonzero coeffs
        while k <= se:
            if zz[k] != 0 and rd.bit() and (zz[k] & p1) == 0:
                zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(scan, by_id, coef, mcux, mcuy, progressive) -> None:
    """Decode one entropy-coded scan into the per-component coefficient
    stores. Interleaved (ns>1, MCU walk) and non-interleaved (ns==1,
    component block-raster walk) layouts; sequential or progressive."""
    smap, ss, se, ah, al, data, huff, restart_interval = scan
    ns = len(smap)
    if progressive and ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if ns == 1:
        cs0 = smap[0][0]
        _, _, _, bwp0, _, bw0, bh0 = by_id[cs0]
        n_units = bw0 * bh0
    else:
        if progressive and ss != 0:
            raise ValueError("interleaved progressive AC scan is invalid")
        n_units = mcux * mcuy
    unit_idx = 0
    for seg_data in _split_entropy(data, restart_interval):
        rd = _BitReader(seg_data)
        pred = {cs: 0 for cs, _, _ in smap}
        eobrun = 0
        units_here = (
            min(restart_interval, n_units - unit_idx)
            if restart_interval
            else n_units - unit_idx
        )
        for _ in range(units_here):
            if ns == 1:
                by, bx = divmod(unit_idx, bw0)
                blocks = [(smap[0], by * bwp0 + bx)]
            else:
                my, mx = divmod(unit_idx, mcux)
                blocks = []
                for ent in smap:
                    hf, vf, _, bwp, _, _, _ = by_id[ent[0]]
                    for bv in range(vf):
                        for bh in range(hf):
                            blocks.append(
                                (ent, (my * vf + bv) * bwp + mx * hf + bh)
                            )
            for (cs, td, ta), bidx in blocks:
                zz = coef[cs][bidx]
                if not progressive:
                    _seq_block(rd, huff[(0, td)], huff[(1, ta)], zz,
                               pred, cs)
                elif ss == 0 and ah == 0:  # DC first: DPCM of dc >> Al
                    s = huff[(0, td)].decode(rd)
                    diff = _extend(rd.bits(s), s) if s else 0
                    pred[cs] += diff
                    zz[0] = pred[cs] << al
                elif ss == 0:  # DC refinement: one raw bit per block
                    zz[0] |= rd.bit() << al
                elif ah == 0:
                    eobrun = _ac_first_block(
                        rd, huff[(1, ta)], zz, ss, se, al, eobrun
                    )
                else:
                    eobrun = _ac_refine_block(
                        rd, huff[(1, ta)], zz, ss, se, al, eobrun
                    )
            unit_idx += 1
    if unit_idx != n_units:
        raise ValueError("truncated JPEG scan (missing MCUs)")


def decode_jpeg(blob: bytes) -> np.ndarray:
    """JFIF Huffman decode (sequential SOF0/SOF1 + progressive SOF2) ->
    (h, w) gray or (h, w, 3) RGB uint8. Raises ValueError on
    arithmetic/lossless/12-bit streams."""
    (h, w, comps, progressive), scans, qt = _parse_jpeg(blob)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component geometry: padded block grid (MCU-aligned) + the
    # unpadded block dims non-interleaved scans walk (spec A.2.2)
    by_id: dict[int, tuple] = {}
    for cid, hf, vf, tq in comps:
        bwp, bhp = mcux * hf, mcuy * vf
        comp_w = -(-(w * hf) // hmax)  # ceil(w * hf / hmax)
        comp_h = -(-(h * vf) // vmax)
        bw, bh = -(-comp_w // 8), -(-comp_h // 8)
        by_id[cid] = (hf, vf, tq, bwp, bhp, bw, bh)

    # int store: successive-approximation refinement is bitwise
    coef = {
        cid: np.zeros((g[3] * g[4], 64), dtype=np.int64)
        for cid, g in by_id.items()
    }
    for scan in scans:
        _decode_scan(scan, by_id, coef, mcux, mcuy, progressive)

    planes = {}
    for cid, (hf, vf, tq, bwp, bhp, _bw, _bh) in by_id.items():
        dq = coef[cid].astype(np.float64) * qt[tq][None, :]
        blocks = np.zeros((bhp * bwp, 8, 8))
        blocks.reshape(-1, 64)[:, _ZIGZAG] = dq
        spatial = _idct_blocks(blocks) + 128.0
        plane = (
            spatial.reshape(bhp, bwp, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bhp * 8, bwp * 8)
        )
        # upsample to full MCU-grid resolution, crop to the image
        plane = np.repeat(np.repeat(plane, vmax // vf, 0), hmax // hf, 1)
        planes[cid] = plane[:h, :w]

    if len(comps) == 1:
        return np.clip(
            np.round(planes[comps[0][0]]), 0, 255
        ).astype(np.uint8)
    y, cb, cr = (planes[cid] for cid, *_ in comps)
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


#: progressive AC Huffman table: Annex K's AC tables lack the EOBn
#: symbols (0x10..0xE0) progressive scans need, so fixture-side scans use
#: one uniform 8-bit table covering every (run<<4|size) with size 0..13 —
#: 224 codes, Kraft 224/256 < 1, all-ones 8-bit code unused.
_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 224, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(14)],
)


def encode_jpeg(
    arr: np.ndarray,
    quant: int = 1,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Minimal JFIF writer (fixture side): 8-bit gray (h, w) or RGB
    (h, w, 3); uniform quantization ``quant`` (1 = only DCT rounding
    is lossy); ``subsample=True`` emits 4:2:0 chroma;
    ``restart_interval`` > 0 emits DRI + RSTn markers every n MCUs (the
    parallel-decode hook real encoders use; baseline path only).
    ``progressive=True`` emits SOF2 with a real multi-scan script —
    interleaved DC first (Al=1) + DC refinement, per-component AC band
    scans including an Al=1 first pass + Al=0 refinement on the Y
    high band — exercising spectral selection, successive approximation,
    EOBn runs and refinement correction bits. Annex-K style Huffman
    tables (plus a uniform EOBn-capable AC table for progressive)."""
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

    # per-component zigzag coefficient arrays in block-RASTER order over
    # the padded (MCU-aligned) grid; geoms mirror the decoder's by_id
    comp_qz: list[np.ndarray] = []
    geoms: list[tuple[int, int, int, int, int, int]] = []
    for (hf, vf), plane in zip(factors, planes):
        bwp, bhp = mcux * hf, mcuy * vf
        p = np.empty((bhp * 8, bwp * 8))
        p[: plane.shape[0], : plane.shape[1]] = plane
        p[plane.shape[0] :, : plane.shape[1]] = plane[-1:, :]
        p[:, plane.shape[1] :] = p[:, plane.shape[1] - 1 : plane.shape[1]]
        blocks = (
            p.reshape(bhp, 8, bwp, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        spectral = _fdct_blocks(blocks - 128.0)
        # zigzag-order the coefficients: zz[i] = block.flat[_ZIGZAG[i]]
        qz = np.round(spectral.reshape(-1, 64)[:, _ZIGZAG] / qtab).astype(
            np.int64
        )
        comp_qz.append(qz)
        bw = -(-plane.shape[1] // 8)
        bh_ = -(-plane.shape[0] // 8)
        geoms.append((hf, vf, bwp, bhp, bw, bh_))

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(qtab.astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qtab.astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(planes)])
    for c, ((hf, vf), tq) in enumerate(zip(factors, tqs)):
        sof += bytes([c + 1, (hf << 4) | vf, tq])
    out += seg(0xC2 if progressive else 0xC0, sof)

    if progressive:
        out += _encode_progressive_scans(comp_qz, geoms, gray, mcux, mcuy,
                                         seg)
        out += b"\xff\xd9"
        return bytes(out)

    dc_tabs = [_Huffman(*_DC_LUMA), _Huffman(*_DC_CHROMA)]
    ac_tabs = [_Huffman(*_AC_LUMA), _Huffman(*_AC_CHROMA)]
    wtr = _BitWriter()
    entropy_parts: list[bytes] = []
    pred = [0] * len(planes)
    for _m in range(mcux * mcuy):
        if restart_interval and _m and _m % restart_interval == 0:
            entropy_parts.append(wtr.flush())
            wtr = _BitWriter()
            pred = [0] * len(planes)
        my, mx = divmod(_m, mcux)
        for c, (hf, vf) in enumerate(factors):
            dct_t = dc_tabs[0 if c == 0 else 1]
            act_t = ac_tabs[0 if c == 0 else 1]
            bwp = geoms[c][2]
            for bv in range(vf):
                for bh in range(hf):
                    zz = comp_qz[c][(my * vf + bv) * bwp + mx * hf + bh]
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

    hdr = bytearray()
    for cls, tid, spec_ in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA), (0, 1, _DC_CHROMA),
        (1, 1, _AC_CHROMA),
    ):
        if gray and tid == 1:
            continue
        counts, syms = spec_
        hdr += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(counts) + bytes(syms))
    if restart_interval:
        hdr += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for c in range(len(planes)):
        td = ta = 0 if c == 0 else 1
        sos += bytes([c + 1, (td << 4) | ta])
    sos += bytes([0, 63, 0])
    out += hdr
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def _encode_progressive_scans(comp_qz, geoms, gray, mcux, mcuy, seg) -> bytes:
    """DHT + the progressive scan script (spec §G.1.2): interleaved DC
    first at Al=1, per-component AC band scans (Y splits 1..5 / 6..63
    with successive approximation on the high band), AC refinement,
    DC refinement."""
    dc_tabs = [_Huffman(*_DC_LUMA), _Huffman(*_DC_CHROMA)]
    ac_prog = _Huffman(*_AC_PROG)
    out = bytearray()
    for cls, tid, spec_ in ((0, 0, _DC_LUMA), (0, 1, _DC_CHROMA),
                            (1, 0, _AC_PROG)):
        if gray and (cls, tid) == (0, 1):
            continue
        counts, syms = spec_
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(counts)
                   + bytes(syms))
    ncomp = len(comp_qz)

    def sos(comps_in_scan, ss, se, ah, al, entropy):
        hdrb = bytes([len(comps_in_scan)])
        for c in comps_in_scan:
            hdrb += bytes([c + 1, (0 if c == 0 else 1) << 4 | 0])
        hdrb += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, hdrb) + entropy

    all_comps = list(range(ncomp))
    out += sos(all_comps, 0, 0, 0, 1,
               _emit_dc_first(comp_qz, geoms, dc_tabs, mcux, mcuy, al=1))
    out += sos([0], 1, 5, 0, 0,
               _emit_ac_first(comp_qz[0], geoms[0], ac_prog, 1, 5, al=0))
    out += sos([0], 6, 63, 0, 1,
               _emit_ac_first(comp_qz[0], geoms[0], ac_prog, 6, 63, al=1))
    for c in range(1, ncomp):
        out += sos([c], 1, 63, 0, 0,
                   _emit_ac_first(comp_qz[c], geoms[c], ac_prog, 1, 63,
                                  al=0))
    out += sos([0], 6, 63, 1, 0,
               _emit_ac_refine(comp_qz[0], geoms[0], ac_prog, 6, 63, al=0))
    out += sos(all_comps, 0, 0, 1, 0,
               _emit_dc_refine(comp_qz, geoms, mcux, mcuy, al=0))
    return bytes(out)


def _emit_dc_first(comp_qz, geoms, dc_tabs, mcux, mcuy, al: int) -> bytes:
    """Interleaved DC first scan: DPCM of (dc >> Al), arithmetic shift."""
    wtr = _BitWriter()
    pred = [0] * len(comp_qz)
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for c, qz in enumerate(comp_qz):
            hf, vf, bwp = geoms[c][:3]
            tab = dc_tabs[0 if c == 0 else 1]
            for bv in range(vf):
                for bh in range(hf):
                    v = int(qz[(my * vf + bv) * bwp + mx * hf + bh][0]) >> al
                    s, mag = _magnitude(v - pred[c])
                    pred[c] = v
                    code, ln = tab.enc[s]
                    wtr.write(code, ln)
                    if s:
                        wtr.write(mag, s)
    return wtr.flush()


def _emit_dc_refine(comp_qz, geoms, mcux, mcuy, al: int) -> bytes:
    """Interleaved DC refinement: one raw bit (bit Al of dc) per block."""
    wtr = _BitWriter()
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for c, qz in enumerate(comp_qz):
            hf, vf, bwp = geoms[c][:3]
            for bv in range(vf):
                for bh in range(hf):
                    dc = int(qz[(my * vf + bv) * bwp + mx * hf + bh][0])
                    wtr.write((dc >> al) & 1, 1)
    return wtr.flush()


def _raster_blocks(geom) -> list[int]:
    """Non-interleaved scan block order: raster over the UNPADDED block
    grid, indexed into the padded store (spec A.2.2)."""
    _hf, _vf, bwp, _bhp, bw, bh = geom
    return [by * bwp + bx for by in range(bh) for bx in range(bw)]


def _flush_eobrun(wtr: _BitWriter, act: _Huffman, eobrun: int,
                  pend: list[int]) -> int:
    """Emit a pending EOBn code + the correction bits riding the run."""
    if eobrun:
        nb = eobrun.bit_length() - 1
        code, ln = act.enc[nb << 4]
        wtr.write(code, ln)
        if nb:
            wtr.write(eobrun - (1 << nb), nb)
    for b in pend:
        wtr.write(b, 1)
    pend.clear()
    return 0


def _emit_ac_first(qz, geom, act: _Huffman, ss: int, se: int,
                   al: int) -> bytes:
    """AC first pass over one component's band: run/size of the
    point-transformed values, EOBn runs spanning all-zero-band blocks."""
    wtr = _BitWriter()
    eobrun = 0
    for bidx in _raster_blocks(geom):
        zz = qz[bidx]
        r = 0
        for k in range(ss, se + 1):
            t = int(zz[k])
            t2 = abs(t) >> al
            if t2 == 0:
                r += 1
                continue
            eobrun = _flush_eobrun(wtr, act, eobrun, [])
            while r > 15:
                code, ln = act.enc[0xF0]  # ZRL
                wtr.write(code, ln)
                r -= 16
            s, mag = _magnitude(t2 if t >= 0 else -t2)
            code, ln = act.enc[(r << 4) | s]
            wtr.write(code, ln)
            wtr.write(mag, s)
            r = 0
        if r:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _flush_eobrun(wtr, act, eobrun, [])
    _flush_eobrun(wtr, act, eobrun, [])
    return wtr.flush()


def _emit_ac_refine(qz, geom, act: _Huffman, ss: int, se: int,
                    al: int) -> bytes:
    """AC refinement pass (spec §G.1.2.3, libjpeg jcphuff shape):
    newly-nonzero coefficients (|coef|>>Al == 1) code as run/1 + sign;
    already-nonzero ones buffer a correction bit that flushes right
    after the next emitted Huffman code (ZRL / run-size / EOBn)."""
    wtr = _BitWriter()
    eobrun = 0
    pend: list[int] = []  # correction bits riding the pending EOB run
    for bidx in _raster_blocks(geom):
        zz = qz[bidx]
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eob = 0  # index-after-last newly-nonzero coefficient
        for j, t in enumerate(absv):
            if t == 1:
                eob = j + 1
        r = 0
        br: list[int] = []  # correction bits since the last code
        for j, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            # ZRLs only while more newly-nonzero coeffs follow; trailing
            # zero runs fold into the EOB run instead
            while r > 15 and j < eob:
                eobrun = _flush_eobrun(wtr, act, eobrun, pend)
                code, ln = act.enc[0xF0]
                wtr.write(code, ln)
                r -= 16
                for b in br:
                    wtr.write(b, 1)
                br = []
            if t > 1:  # previously nonzero: buffer its correction bit
                br.append(t & 1)
                continue
            eobrun = _flush_eobrun(wtr, act, eobrun, pend)
            code, ln = act.enc[(r << 4) | 1]
            wtr.write(code, ln)
            wtr.write(1 if int(zz[ss + j]) > 0 else 0, 1)
            for b in br:
                wtr.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pend.extend(br)
            if eobrun == 0x7FFF or len(pend) > 900:
                eobrun = _flush_eobrun(wtr, act, eobrun, pend)
    _flush_eobrun(wtr, act, eobrun, pend)
    return wtr.flush()

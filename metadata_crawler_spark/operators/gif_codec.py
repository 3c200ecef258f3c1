"""Pure-stdlib GIF codec (no PIL, no jars).

Closes the GIF half of the X5 compressed-codec stub (multimodal decode
tier 1; reference analog ``open_dataset`` dispatch,
storage_backend.py:102-149): GIF is lossless LZW over palette indices,
so unlike JPEG it round-trips byte-identically — and animated GIFs give
the engine a REAL multi-frame decode to drive ``frame_sample_plan``
with, not just header metadata.

- ``decode_gif``: header + logical-screen descriptor, global/local
  color tables, graphic-control extensions (frame delays), image
  descriptors (frame offsets, interlace), a full variable-width LZW
  decoder (code-size growth, CLEAR/EOI, 12-bit cap), 4-pass interlace
  reorder, and draw-over frame compositing onto the logical screen.
  Returns (frames (n, h, w, 3) uint8, delays_ms list).
- ``encode_gif``: fixture-side writer using the classic "uncompressed
  GIF" LZW form — every pixel emitted as its root code with a CLEAR
  before the decoder's table would force a width change — so the
  decoder's real LZW path (table growth + clear handling) is exercised
  by construction. Optional multi-frame with per-frame delays.

Not handled (honest limits, all raise/ignore cleanly): disposal methods
other than draw-over, transparency compositing (the index is drawn as
its palette color), sorted/plain-text/application extensions (skipped).
"""

from __future__ import annotations

import struct

import numpy as np


def _read_subblocks(blob: bytes, i: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at i; return (data, next)."""
    out = bytearray()
    while i < len(blob):
        n = blob[i]
        i += 1
        if n == 0:
            return bytes(out), i
        out += blob[i : i + n]
        i += n
    raise ValueError("truncated GIF sub-blocks")


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Variable-width LZW (GIF flavor): codes grow from min+1 bits up to
    12; CLEAR resets the table; EOI ends the stream. LSB-first packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # bit reader state (LSB-first)
    acc = 0
    nbits = 0
    pos = 0

    def init_table():
        return {i: bytes([i]) for i in range(clear)}, clear + 2, min_code_size + 1

    table, next_code, width = init_table()
    prev: bytes | None = None
    while n_out < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, next_code, width = init_table()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW code")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += len(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
        # early change: the decoder's table additions lag the encoder's
        # by one code (it can only define prev+entry[0] after seeing the
        # NEXT code), so it must widen one code early — when its own
        # next free code reaches 2^width - 1 the encoder's has reached
        # 2^width and switched (the standard giflib/Pillow behavior).
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError("GIF frame ended short of its pixel count")
    return out


#: GIF interlace passes: (row_start, row_step)
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(blob: bytes) -> tuple[np.ndarray, list[int]]:
    """Decode all frames: returns (frames uint8 (n, h, w, 3), delays_ms).
    Frames composite draw-over onto the logical screen (prior content
    persists where a frame is smaller than the canvas)."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF blob")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", blob[6:13])
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(blob[i : i + 3 * n], dtype=np.uint8).reshape(-1, 3)
        i += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:] = gct[0]
    frames: list[np.ndarray] = []
    delays: list[int] = []
    delay_ms = 0
    while i < len(blob):
        b = blob[i]
        i += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = blob[i]
            i += 1
            if label == 0xF9:  # graphic control
                n = blob[i]
                if n >= 4:
                    _gflags, delay_cs, _transp = struct.unpack(
                        "<BHB", blob[i + 1 : i + 5]
                    )
                else:
                    delay_cs = 0
                delay_ms = delay_cs * 10
                i += 1 + n
                if blob[i] != 0:
                    raise ValueError("bad GIF graphic-control terminator")
                i += 1
            else:  # skip any other extension's sub-blocks
                _, i = _read_subblocks(blob, i)
        elif b == 0x2C:  # image descriptor
            left, top, fw, fh, fflags = struct.unpack("<HHHHB", blob[i : i + 9])
            i += 9
            ct = gct
            if fflags & 0x80:
                n = 2 << (fflags & 0x07)
                ct = np.frombuffer(
                    blob[i : i + 3 * n], dtype=np.uint8
                ).reshape(-1, 3)
                i += 3 * n
            if ct is None:
                raise ValueError("GIF frame has no color table")
            min_code = blob[i]
            i += 1
            data, i = _read_subblocks(blob, i)
            idx = _lzw_decode(data, min_code, fw * fh).reshape(fh, fw)
            if fflags & 0x40:  # interlaced: de-permute rows
                de = np.empty_like(idx)
                src = 0
                for start, step in _GIF_INTERLACE:
                    rows = range(start, fh, step)
                    de[list(rows)] = idx[src : src + len(rows)]
                    src += len(rows)
                idx = de
            canvas[top : top + fh, left : left + fw] = ct[
                np.minimum(idx, len(ct) - 1)
            ]
            frames.append(canvas.copy())
            delays.append(delay_ms)
            # GIF89a: a graphic-control extension "applies only to the
            # first graphic rendering block to follow" — a frame without
            # its own GCE must NOT inherit the previous frame's delay.
            delay_ms = 0
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF contains no image frames")
    return np.stack(frames), delays


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Real greedy-longest-match GIF LZW: grows code width in lockstep
    with the decoder (widen when the next free code reaches 2^width),
    CLEARs at the 4096-entry cap. This is the writer that exercises the
    decoder's 10/11/12-bit growth path, which the uncompressed form
    (below) never reaches."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([c]): c for c in range(clear)}, clear + 2

    table, next_code = fresh()
    emit(clear)
    w = b""
    for px in indices.ravel().tolist():
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        # cap at 4095 (not 4096) so the decoder — whose additions lag by
        # one — never has to disambiguate a real max-table code from the
        # KwKwK special case at the very top of the code space
        if next_code < 4095:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            width = min_code_size + 1
            table, next_code = fresh()
        w = bytes([px])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    blocks = bytearray()
    for j in range(0, len(out), 255):
        chunk = out[j : j + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return bytes(blocks)


def _lzw_encode_uncompressed(indices: np.ndarray, min_code_size: int) -> bytes:
    """Classic 'uncompressed GIF' LZW: emit each pixel as its root code,
    issuing CLEAR whenever the decoder's table is about to widen past the
    initial code size — valid LZW that never compresses, keeping the
    writer trivial while the reader exercises real table growth."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # decoder adds one table entry per code after the first; widen point
    # is at table size 2^width. Reset comfortably before that.
    reset_every = (1 << width) - clear - 3

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for k, px in enumerate(indices.ravel().tolist()):
        if k and k % reset_every == 0:
            emit(clear)
        emit(px)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    # wrap in <=255-byte sub-blocks
    blocks = bytearray()
    for j in range(0, len(out), 255):
        chunk = out[j : j + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return bytes(blocks)


def encode_gif(
    frames: np.ndarray | list,
    delays_ms: list[int] | None = None,
    interlace: bool = False,
    compress: bool = True,
) -> bytes:
    """Fixture-side GIF writer: ``frames`` is (h, w) / (h, w, 3) for one
    frame or (n, h, w[, 3]) for an animation. RGB input is quantized to
    a 256-entry grayscale-ish palette ONLY if it already uses <=256
    distinct colors (exact, lossless) — fixtures should construct
    palette-sized imagery. Grayscale input maps to the 256-gray palette
    losslessly."""
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim == 2:
        a = a[None, :, :]
    elif a.ndim == 3 and a.shape[-1] == 3:
        # heuristic: trailing dim 3 = one RGB frame (a grayscale
        # animation with w=3 must be passed as (n, h, 3, 1)-free shapes)
        a = a[None]
    if a.ndim == 3:  # (n, h, w) grayscale
        n, h, w = a.shape
        palette = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
        idx_frames = a
    else:  # (n, h, w, 3) rgb -> exact palette
        n, h, w, _ = a.shape
        flat = a.reshape(-1, 3)
        palette, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(palette) > 256:
            raise ValueError("encode_gif needs <=256 distinct colors")
        pad = np.zeros((256 - len(palette), 3), dtype=np.uint8)
        palette = np.vstack([palette, pad])
        idx_frames = inverse.astype(np.uint8).reshape(n, h, w)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT, 256 entries
    out += palette.astype(np.uint8).tobytes()
    delays_ms = delays_ms or [0] * len(idx_frames)
    for fi, idx in enumerate(idx_frames):
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", 0, delays_ms[fi] // 10, 0
        ) + b"\x00"
        fflags = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, fflags)
        body = idx
        if interlace:
            order = [
                r for start, step in _GIF_INTERLACE for r in range(start, h, step)
            ]
            body = idx[order]
        out.append(8)  # min LZW code size (256-entry palette)
        enc = _lzw_encode if compress else _lzw_encode_uncompressed
        out += enc(body, 8)
    out += b"\x3b"
    return bytes(out)

"""Pure-stdlib PDF text extraction (no PIL, no jars, no poppler).

PDFs are a substantial share of crawled web documents and the highest-
value non-HTML text source a pretraining pipeline mines (scientific
papers, reports). Reference analog: the per-format ``open_dataset``
engine dispatch (/root/reference/src/metadata_crawler/api/
storage_backend.py:102-149) — our blobs ride the same pages pipeline
and decode per-format inside Arrow batches.

Scope (honest, documented subset — the shapes a lenient extractor
needs for the vast majority of text PDFs):

- classic cross-reference PDFs AND compressed object streams
  (/Type/ObjStm, PDF 1.5+) — objects are discovered by a full-file
  scan, so broken/absent xref tables don't matter;
- stream filters: none, FlateDecode (stdlib zlib), incl. 1-element
  filter arrays; other filters skip that stream and flag ``partial``;
- page text from /Contents streams: BT/ET text objects with Tj ' " TJ
  show ops, Td/TD/T*/Tm line tracking, literal-string escapes
  (octal, \\n, \\(…), hex strings, balanced parens;
- simple-font bytes decode Latin-1; fonts carrying a /ToUnicode CMap
  (the standard embedding for subset/CID fonts) decode through parsed
  beginbfchar/beginbfrange sections, keyed by the active /Tf font via
  the page's /Resources /Font dict — 1- and 2-byte codes.

Everything else (encrypted files, exotic filters, fonts with neither
a simple encoding nor ToUnicode) degrades to ``ok=False`` / partial
text, never a task failure — the same garbage-in/data-out posture as
``media_probe``.

Spark surface: ``pdf_text_table`` maps (id, blob) -> (id, n_pages,
text, ok, err) inside ``mapInPandas`` (Arrow batches, no per-row
Python UDF); the decode is per-blob CPU work that scales with
executors, identical in shape to ``media_pixel_stats``.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Minimal PDF object lexer/parser (spec ISO 32000-1 §7.3)."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def parse(self):
        """Parse one object at pos (dict/array/name/number/string/ref)."""
        self._skip_ws()
        d = self.data
        if self.pos >= len(d):
            raise ValueError("EOF in PDF object")
        c = d[self.pos]
        if d.startswith(b"<<", self.pos):
            return self._dict()
        if c == 0x3C:  # <hex>
            return self._hex_string()
        if c == 0x28:  # (literal)
            return self._literal_string()
        if c == 0x2F:  # /name
            return self._name()
        if c == 0x5B:  # [array]
            return self._array()
        if d.startswith(b"true", self.pos):
            self.pos += 4
            return True
        if d.startswith(b"false", self.pos):
            self.pos += 5
            return False
        if d.startswith(b"null", self.pos):
            self.pos += 4
            return None
        return self._number_or_ref()

    def _dict(self) -> dict:
        self.pos += 2
        out = {}
        while True:
            self._skip_ws()
            if self.data.startswith(b">>", self.pos):
                self.pos += 2
                return out
            key = self._name()
            out[key] = self.parse()

    def _array(self) -> list:
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.pos < len(self.data) and self.data[self.pos] == 0x5D:
                self.pos += 1
                return out
            out.append(self.parse())

    def _name(self) -> str:
        if self.data[self.pos] != 0x2F:
            raise ValueError("expected PDF name")
        self.pos += 1
        start = self.pos
        d = self.data
        while self.pos < len(d) and d[self.pos] not in _WS + _DELIM:
            self.pos += 1
        raw = d[start : self.pos]
        # #xx hex escapes in names
        return re.sub(
            rb"#([0-9A-Fa-f]{2})",
            lambda m: bytes([int(m.group(1), 16)]),
            raw,
        ).decode("latin-1")

    def _literal_string(self) -> bytes:
        d = self.data
        self.pos += 1
        out = bytearray()
        depth = 1
        while self.pos < len(d):
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= len(d):
                    break
                e = d[self.pos]
                if e in b"nrtbf":
                    out += {
                        0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                        0x62: b"\b", 0x66: b"\f",
                    }[e]
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < len(d) and d[self.pos] == 0x0A:
                        self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                    oct_ = 0
                    k = 0
                    while k < 3 and self.pos < len(d) and 0x30 <= d[self.pos] <= 0x37:
                        oct_ = oct_ * 8 + (d[self.pos] - 0x30)
                        self.pos += 1
                        k += 1
                    out.append(oct_ & 0xFF)
                else:
                    out.append(e)
                    self.pos += 1
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
            out.append(c)
            self.pos += 1
        return bytes(out)

    def _hex_string(self) -> bytes:
        d = self.data
        self.pos += 1
        digits = []
        while self.pos < len(d) and d[self.pos] != 0x3E:
            c = d[self.pos]
            if c not in _WS:
                digits.append(chr(c))
            self.pos += 1
        self.pos += 1
        if len(digits) % 2:
            digits.append("0")  # spec: odd count pads with 0
        return bytes.fromhex("".join(digits))

    def _number_or_ref(self):
        d = self.data
        m = re.match(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)", d[self.pos :])
        if not m:
            raise ValueError(f"bad PDF token at {self.pos}")
        tok = m.group(0)
        self.pos += len(tok)
        if b"." in tok:
            return float(tok)
        num = int(tok)
        # lookahead for "gen R" -> indirect reference
        save = self.pos
        self._skip_ws()
        m2 = re.match(rb"(\d+)\s+R(?![A-Za-z])", d[self.pos :])
        if m2 and num >= 0:
            self.pos += m2.end()
            return _Ref(num)
        self.pos = save
        return num


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int) -> None:
        self.num = num

    def __repr__(self) -> str:  # pragma: no cover
        return f"_Ref({self.num})"


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")


#: inflate cap per stream — a crawled decompression bomb must cost a
#: skipped stream, not an executor OOM (never-raise posture)
_MAX_INFLATE = 64 * 1024 * 1024


def _decode_stream(body: bytes, sdict: dict) -> bytes | None:
    """Apply /Filter: None, FlateDecode, or a 1-element array of it.
    Returns None for unsupported filters and zlib bombs (caller flags
    partial)."""
    filt = sdict.get("Filter")
    if isinstance(filt, list):
        if len(filt) == 0:
            filt = None
        elif len(filt) == 1:
            filt = filt[0]
        else:
            return None
    if filt is None:
        return body
    if filt == "FlateDecode":
        try:
            # bounded inflate: decompressobj + max_length (also tolerates
            # trailing garbage after the deflate stream)
            dec = zlib.decompressobj()
            raw = dec.decompress(body, _MAX_INFLATE)
            if dec.unconsumed_tail:  # output cap hit: decompression bomb
                return None
        except zlib.error:
            return None
        parms = sdict.get("DecodeParms")
        if isinstance(parms, dict) and parms.get("Predictor", 1) > 1:
            return _png_predictor(raw, parms)
        return raw
    return None


def _png_predictor(raw: bytes, parms: dict) -> bytes | None:
    """PNG Up/Sub/Paeth predictors (xref streams use Up almost always)."""
    cols = int(parms.get("Columns", 1)) * int(parms.get("Colors", 1)) * (
        int(parms.get("BitsPerComponent", 8)) // 8
    )
    stride = cols + 1
    out = bytearray()
    prev = bytearray(cols)
    for r in range(0, len(raw) - stride + 1, stride):
        ft = raw[r]
        row = bytearray(raw[r + 1 : r + stride])
        if ft == 2:  # Up
            for i in range(cols):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 1:  # Sub
            for i in range(1, cols):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif ft != 0:
            return None  # Average/Paeth not seen in xref streams
        out += row
        prev = row
    return bytes(out)


def _scan_objects(blob: bytes) -> dict[int, tuple]:
    """Full-file scan for ``N G obj`` definitions -> {num: (dict-or-val,
    stream-bytes-or-None)}. Robust to broken xref tables; last
    definition wins (incremental updates append)."""
    objs: dict[int, tuple] = {}
    for m in _OBJ_RE.finditer(blob):
        num = int(m.group(1))
        lex = _Lexer(blob, m.end())
        try:
            val = lex.parse()
        except Exception:  # noqa: BLE001 - one truncated/corrupt object
            continue  # (e.g. IndexError at EOF) must not lose the rest
        stream = None
        lex._skip_ws()
        sm = _STREAM_RE.match(blob, lex.pos)
        if sm is not None and isinstance(val, dict):
            start = sm.end()
            end = blob.find(b"endstream", start)
            if end < 0:
                continue
            # spec: EOL before endstream is not stream data
            body = blob[start:end]
            if body.endswith(b"\r\n"):
                body = body[:-2]
            elif body.endswith(b"\n") or body.endswith(b"\r"):
                body = body[:-1]
            stream = body
        objs[num] = (val, stream)
    return objs


def _expand_objstm(objs: dict[int, tuple]) -> None:
    """Inflate /Type/ObjStm containers and merge their embedded objects
    (spec §7.5.7: header of N (objnum offset) pairs, then bodies)."""
    for _num, (val, stream) in list(objs.items()):
        if not (isinstance(val, dict) and val.get("Type") == "ObjStm"
                and stream is not None):
            continue
        raw = _decode_stream(stream, val)
        if raw is None:
            continue
        n = val.get("N")
        first = val.get("First")
        if not isinstance(n, int) or not isinstance(first, int):
            continue
        hdr = _Lexer(raw)
        pairs = []
        try:
            for _ in range(n):
                onum = hdr.parse()
                off = hdr.parse()
                pairs.append((int(onum), int(off)))
        except Exception:  # noqa: BLE001 - corrupt ObjStm header
            continue
        for onum, off in pairs:
            if onum in objs:  # top-level (newer) definition wins
                continue
            try:
                objs[onum] = (_Lexer(raw, first + off).parse(), None)
            except Exception:  # noqa: BLE001
                continue


def _resolve(v, objs):
    seen = 0
    while isinstance(v, _Ref):
        v = objs.get(v.num, (None, None))[0]
        seen += 1
        if seen > 32:  # reference cycle
            return None
    return v


def _page_order(objs: dict[int, tuple]) -> list[dict]:
    """Document-order pages: walk the catalog's /Pages tree /Kids
    (object numbering routinely disagrees with document order in
    incrementally-updated files). Falls back to object-number order
    when the tree is broken or absent."""
    root = None
    for _num, (val, _s) in sorted(objs.items()):
        if isinstance(val, dict) and val.get("Type") == "Catalog":
            root = val  # last catalog wins (incremental update)
    ordered: list[dict] = []
    visited: set[int] = set()

    def walk(node, depth: int) -> None:
        if depth > 64:
            return
        if isinstance(node, _Ref):
            if node.num in visited:  # cycle guard
                return
            visited.add(node.num)
            node = _resolve(node, objs)
        if not isinstance(node, dict):
            return
        if node.get("Type") == "Page":
            ordered.append(node)
            return
        kids = _resolve(node.get("Kids"), objs)
        if isinstance(kids, list):
            for kid in kids[:100_000]:
                walk(kid, depth + 1)

    if root is not None:
        walk(root.get("Pages"), 0)
    if ordered:
        return ordered
    return [
        val
        for _num, (val, _s) in sorted(objs.items())
        if isinstance(val, dict) and val.get("Type") == "Page"
    ]


def _is_encrypted(blob: bytes, objs: dict[int, tuple]) -> bool:
    """/Encrypt in a TRAILER dict (or an /Type/XRef stream dict), not a
    raw-byte grep — pages merely mentioning '/Encrypt' must extract."""
    for m in re.finditer(rb"trailer", blob):
        lex = _Lexer(blob, m.end())
        try:
            t = lex.parse()
        except Exception:  # noqa: BLE001
            continue
        if isinstance(t, dict) and "Encrypt" in t:
            return True
    for _num, (val, _s) in objs.items():
        if isinstance(val, dict) and val.get("Type") == "XRef" \
                and "Encrypt" in val:
            return True
    return False


#: ToUnicode source codes are 1-2 bytes; a crafted/corrupt range beyond
#: this would expand billions of entries (never-raise, never-OOM posture)
_CMAP_CODE_CAP = 0x10000


def _parse_tounicode(raw: bytes) -> dict[int, str]:
    """Parse a ToUnicode CMap's bfchar/bfrange sections -> {code: str}.
    bfrange bodies parse SEQUENTIALLY (an array-form entry's inner hex
    strings must not be re-matched as a separate plain-form triple),
    ranges are capped at the 2-byte code space, and destination
    increments that outgrow the source hex width stay valid."""
    cmap: dict[int, str] = {}

    def _u(hexdigits: bytes) -> str:
        if len(hexdigits) % 2:
            hexdigits = b"0" + hexdigits
        b = bytes.fromhex(hexdigits.decode("ascii"))
        if len(b) % 2:
            b = b"\x00" + b
        return b.decode("utf-16-be", "replace")

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", raw, re.S):
        for src, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)
        ):
            code = int(src, 16)
            if code < _CMAP_CODE_CAP:
                cmap[code] = _u(dst)
    entry_re = re.compile(
        rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(?:<([0-9A-Fa-f]+)>|(\[))"
    )
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", raw, re.S):
        body = m.group(1)
        pos = 0
        while True:
            em = entry_re.search(body, pos)
            if em is None:
                break
            lo_i = int(em.group(1), 16)
            hi_i = min(int(em.group(2), 16), _CMAP_CODE_CAP - 1)
            if em.group(4) is not None:  # array form: one dst per code
                close = body.find(b"]", em.end())
                arr = body[em.end() : close if close >= 0 else len(body)]
                for k, dst in enumerate(
                    re.findall(rb"<([0-9A-Fa-f]+)>", arr)
                ):
                    if lo_i + k <= hi_i:
                        cmap[lo_i + k] = _u(dst)
                pos = close + 1 if close >= 0 else len(body)
            else:  # plain form: dst increments with the code
                dst = em.group(3)
                base = int(dst, 16)
                for k in range(hi_i - lo_i + 1):
                    # rjust keeps the declared width; an overflowing
                    # increment just grows the hex (stays decodable)
                    cmap[lo_i + k] = _u(
                        (b"%X" % (base + k)).rjust(len(dst), b"0")
                    )
                pos = em.end()
    return cmap


class _Font:
    """Per-font decode state: code width + optional ToUnicode map."""

    __slots__ = ("two_byte", "cmap")

    def __init__(self, two_byte: bool, cmap: dict[int, str] | None) -> None:
        self.two_byte = two_byte
        self.cmap = cmap

    def decode(self, raw: bytes) -> str:
        if self.cmap is None:
            return raw.decode("latin-1")
        out = []
        if self.two_byte:
            for i in range(0, len(raw) - 1, 2):
                code = (raw[i] << 8) | raw[i + 1]
                out.append(self.cmap.get(code, ""))
        else:
            for b in raw:
                out.append(self.cmap.get(b, chr(b)))
        return "".join(out)


_SIMPLE_FONT = _Font(False, None)


def _page_fonts(page: dict, objs: dict) -> dict[str, _Font]:
    """Resolve the page's /Resources /Font dict into decode states."""
    fonts: dict[str, _Font] = {}
    res = _resolve(page.get("Resources"), objs)
    if not isinstance(res, dict):
        return fonts
    fdict = _resolve(res.get("Font"), objs)
    if not isinstance(fdict, dict):
        return fonts
    for name, ref in fdict.items():
        fobj = _resolve(ref, objs)
        if not isinstance(fobj, dict):
            continue
        two_byte = fobj.get("Subtype") == "Type0"
        cmap = None
        tu = fobj.get("ToUnicode")
        if isinstance(tu, _Ref):
            ent = objs.get(tu.num)
            if ent and ent[1] is not None:
                raw = _decode_stream(ent[1], ent[0] if isinstance(ent[0], dict) else {})
                if raw is not None:
                    cmap = _parse_tounicode(raw)
        fonts[name] = _Font(two_byte, cmap)
    return fonts


#: content-stream operator arity is implicit: operands precede the op.
_TJ_SPACE_KERN = -100.0  # TJ kern beyond this emits a word space


def _extract_content_text(content: bytes, fonts: dict[str, _Font]) -> str:
    """Walk one content stream's text ops. Lines break on T*, TD, ',
    \", Td/Tm with a vertical move — a deterministic, layout-light
    heuristic (order preserved, visual columns not reconstructed)."""
    lex = _Lexer(content)
    stack: list = []
    out: list[str] = []
    cur_font = _SIMPLE_FONT
    last_ty = None

    def newline() -> None:
        if out and not out[-1].endswith("\n"):
            out.append("\n")

    n = len(content)
    while True:
        lex._skip_ws()
        if lex.pos >= n:
            break
        c = content[lex.pos]
        if c in b"/<([+-.0123456789" or content.startswith(b"true", lex.pos) \
                or content.startswith(b"false", lex.pos) \
                or content.startswith(b"null", lex.pos):
            try:
                stack.append(lex.parse())
            except ValueError:
                lex.pos += 1
            continue
        m = re.match(rb"[A-Za-z'\"*]+", content[lex.pos :])
        if not m:
            lex.pos += 1
            continue
        op = m.group(0)
        lex.pos += len(op)
        if op == b"Tj" and stack and isinstance(stack[-1], bytes):
            out.append(cur_font.decode(stack[-1]))
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            for item in stack[-1]:
                if isinstance(item, bytes):
                    out.append(cur_font.decode(item))
                elif isinstance(item, (int, float)) and item < _TJ_SPACE_KERN:
                    if out and not out[-1].endswith((" ", "\n")):
                        out.append(" ")
        elif op in (b"'", b'"') and stack and isinstance(stack[-1], bytes):
            newline()
            out.append(cur_font.decode(stack[-1]))
        elif op == b"T*":
            newline()
        elif op == b"TD":
            newline()
        elif op == b"Td":
            if len(stack) >= 2 and isinstance(stack[-1], (int, float)) \
                    and stack[-1] != 0:
                newline()
        elif op == b"Tm":
            if len(stack) >= 6 and isinstance(stack[-1], (int, float)):
                ty = float(stack[-1])
                # unknown baseline (first Tm of the text object) breaks
                # conservatively; same-row repositioning does not
                if last_ty is None or ty != last_ty:
                    newline()
                last_ty = ty
        elif op == b"Tf":
            if len(stack) >= 2 and isinstance(stack[-2], str):
                cur_font = fonts.get(stack[-2], _SIMPLE_FONT)
        elif op == b"BT":
            last_ty = None
        elif op == b"BI":
            # inline image: skip to EI (binary payload confuses the lexer)
            ei = content.find(b"EI", lex.pos)
            lex.pos = n if ei < 0 else ei + 2
        # operands always precede their operator: consume them
        stack.clear()
    return "".join(out)


def extract_pdf_text(blob: bytes) -> dict:
    """Extract page text from one PDF blob. Never raises on garbage:
    returns {ok, n_pages, text, err}. ``ok=False`` + err for non-PDF /
    encrypted / zero-text-extractable inputs; partial failures (an
    unsupported filter on one stream) still return the pages that
    decoded, with err recording the skip."""
    if not isinstance(blob, (bytes, bytearray)) or not bytes(blob[:5]).startswith(b"%PDF-"):
        return {"ok": False, "n_pages": 0, "text": "", "err": "not a PDF"}
    blob = bytes(blob)
    try:
        objs = _scan_objects(blob)
        _expand_objstm(objs)
    except Exception as exc:  # noqa: BLE001 - garbage-in/data-out posture
        return {"ok": False, "n_pages": 0, "text": "", "err": f"parse: {exc}"}
    # encryption: a trailer /Encrypt means strings/streams are RC4/AES
    if _is_encrypted(blob, objs):
        return {"ok": False, "n_pages": 0, "text": "",
                "err": "encrypted PDF unsupported"}
    pages = _page_order(objs)
    texts = []
    skipped = 0
    for page in pages:
        contents = page.get("Contents")
        if isinstance(contents, _Ref):
            # a ref may point at an ARRAY of content streams
            target = objs.get(contents.num, (None, None))
            if target[1] is None and isinstance(target[0], list):
                contents = target[0]
        refs = contents if isinstance(contents, list) else [contents]
        parts = []
        for ref in refs:
            ent = objs.get(ref.num) if isinstance(ref, _Ref) else None
            if ent is None or ent[1] is None:
                continue
            sdict = ent[0] if isinstance(ent[0], dict) else {}
            raw = _decode_stream(ent[1], sdict)
            if raw is None:
                skipped += 1
                continue
            parts.append(raw)
        try:
            texts.append(
                _extract_content_text(b"\n".join(parts),
                                      _page_fonts(page, objs))
            )
        except Exception:  # noqa: BLE001
            skipped += 1
            texts.append("")
    err = f"{skipped} stream(s) skipped" if skipped else None
    return {
        "ok": bool(pages),
        "n_pages": len(pages),
        "text": "\f".join(texts),  # form feed = page boundary
        "err": err if pages else (err or "no /Type/Page objects"),
    }


PDF_TEXT_SCHEMA = (
    "doc_id long, n_pages int, text string, ok boolean, err string"
)


def iter_extracted(ids, blobs) -> Iterator[tuple]:
    """Shared per-batch decode loop for every Spark surface (the
    NULL-blob guard lives ONCE, here): yields (id, result-dict)."""
    for i, blob in zip(ids, blobs):
        yield i, extract_pdf_text(blob if blob is not None else b"")


def pdf_text_table(
    df: DataFrame, blob_col: str = "pdf", id_col: str = "doc_id"
) -> DataFrame:
    """(id, blob) -> (id, n_pages, text, ok, err) via mapInPandas —
    Arrow-batched per-blob decode, the same distributed shape as
    ``media_pixel_stats`` (one task per partition, no driver data)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf_batch in batches:
            rows = [
                (None if pd.isna(did) else int(did), d["n_pages"],
                 d["text"], d["ok"], d["err"])
                for did, d in iter_extracted(
                    pdf_batch[id_col], pdf_batch[blob_col]
                )
            ]
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_pages", "text", "ok", "err"]
            )

    return df.mapInPandas(run, PDF_TEXT_SCHEMA)


# ----------------------------------------------------------------- fixtures


def encode_pdf(
    pages: list[list[str]],
    compress: bool = True,
    use_objstm: bool = False,
    tounicode: dict[int, str] | None = None,
) -> bytes:
    """Fixture-side minimal PDF writer (the render_warc/encode_png
    analog): one content stream per page, each inner list item one
    text line (Td + Tj ladder). ``compress`` Flate-encodes content
    streams; ``use_objstm`` stores page/catalog dicts inside a
    /Type/ObjStm container (the PDF 1.5 layout); ``tounicode`` attaches
    a 2-byte Type0 font with the given code->char CMap and emits text
    as 2-byte codes."""
    objs: list[bytes | None] = [None]  # 1-based
    out = bytearray(b"%PDF-1.5\n")

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs) - 1

    font_extra = b""
    if tounicode is not None:
        bfchars = "".join(
            f"<{code:04X}> <{''.join(f'{ord(ch):04X}' for ch in s)}>\n"
            for code, s in sorted(tounicode.items())
        )
        cmap = (
            "/CIDInit /ProcSet findresource begin\n"
            "begincmap\n"
            f"{len(tounicode)} beginbfchar\n{bfchars}endbfchar\n"
            "endcmap end\n"
        ).encode("ascii")
        tu_obj = add(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap), cmap)
        )
        font_obj = add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Fx "
            b"/Encoding /Identity-H /ToUnicode %d 0 R >>" % tu_obj
        )
    else:
        font_obj = add(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )

    page_objs = []
    content_objs = []
    for lines in pages:
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for i, line in enumerate(lines):
            if i:
                ops.append(b"0 -14 Td")
            if tounicode is not None:
                inv = {}
                for code, s in tounicode.items():
                    inv.setdefault(s, code)
                codes = b"".join(
                    bytes([inv.get(ch, 0) >> 8, inv.get(ch, 0) & 0xFF])
                    for ch in line
                )
                ops.append(
                    b"<" + codes.hex().upper().encode("ascii") + b"> Tj"
                )
            else:
                esc = (
                    line.encode("latin-1", "replace")
                    .replace(b"\\", rb"\\")
                    .replace(b"(", rb"\(")
                    .replace(b")", rb"\)")
                )
                ops.append(b"(" + esc + b") Tj")
        ops.append(b"ET")
        content = b" ".join(ops)
        if compress:
            z = zlib.compress(content)
            body = (
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                % (len(z), z)
            )
        else:
            body = b"<< /Length %d >>\nstream\n%s\nendstream" % (
                len(content), content,
            )
        content_objs.append(add(body))

    # page dicts (+1 ObjStm container when embedded) precede the Pages obj
    pages_obj_num = len(objs) + len(pages) + (1 if use_objstm else 0)
    inner: list[tuple[int, bytes]] = []
    for cnum in content_objs:
        page_body = (
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (pages_obj_num, font_obj, cnum)
        )
        if use_objstm:
            inner.append((len(objs) + len(inner), page_body))
            page_objs.append(len(objs) + len(inner) - 1)
        else:
            page_objs.append(add(page_body))

    if use_objstm:
        # materialize the object stream holding the page dicts
        hdr_parts = []
        bodies = bytearray()
        for onum, body in inner:
            hdr_parts.append(b"%d %d" % (onum, len(bodies)))
            bodies += body + b"\n"
            objs.append(None)  # reserve the object number
        hdr = b" ".join(hdr_parts) + b"\n"
        payload = zlib.compress(hdr + bytes(bodies))
        add(
            b"<< /Type /ObjStm /N %d /First %d /Length %d "
            b"/Filter /FlateDecode >>\nstream\n%s\nendstream"
            % (len(inner), len(hdr), len(payload), payload)
        )

    kids = b" ".join(b"%d 0 R" % p for p in page_objs)
    pages_obj = add(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_objs))
    )
    assert pages_obj == pages_obj_num, (pages_obj, pages_obj_num)
    catalog = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_obj)

    offsets = [0]
    for num, body in enumerate(objs[1:], start=1):
        offsets.append(len(out))
        if body is not None:
            out += b"%d 0 obj\n%s\nendobj\n" % (num, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n" % len(objs)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs), catalog, xref_at)
    )
    return bytes(out)

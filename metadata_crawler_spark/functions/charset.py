"""Charset sniffing + robust HTML decode for non-UTF-8 pages.

Real crawls are ~5-10% legacy encodings (windows-1252, shift_jis,
iso-8859-*); decoding everything as UTF-8-with-replacement silently
mangles them, which then corrupts dedup hashes, quality stats and the
training text itself. The sniff order is the WHATWG encoding standard's
practical subset (public spec):

1. BOM (utf-8-sig / utf-16 le-be / utf-32 le-be) — authoritative.
2. `<meta charset=...>` / `http-equiv content-type ... charset=` in the
   first 2 KiB (the spec's prescan window), normalized through Python's
   codec alias table.
3. Strict UTF-8 trial decode of the head — valid UTF-8 is UTF-8.
4. windows-1252 fallback (the web's de-facto default; a superset of
   latin-1 that never fails to decode).

`decode_pages` is the Spark surface: one Arrow-batched pass appending
(charset, text). `functions/text._decode` stays the cheap UTF-8-only
path for fixture-clean corpora; THIS is the ingest-grade one.
"""

from __future__ import annotations

import codecs
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BOMS = [
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF32_LE, "utf-32-le"),  # before utf-16 (prefix overlap)
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
]
_META_CHARSET_RE = re.compile(
    rb"""<meta\b[^>]*?charset\s*=\s*["']?\s*([A-Za-z0-9_.:\-]+)""", re.I
)
_PRESCAN = 2048


def sniff_charset_py(blob: bytes | None) -> str:
    if not blob:
        return "utf-8"
    b = bytes(blob)
    for bom, name in _BOMS:
        if b.startswith(bom):
            return name
    m = _META_CHARSET_RE.search(b[:_PRESCAN])
    if m:
        declared = m.group(1).decode("ascii", "replace").lower()
        try:
            info = codecs.lookup(declared)
            # the spec maps declared latin-1/ascii to windows-1252; report
            # cp1252 under its WHATWG name for a consistent charset column
            if info.name in ("iso8859-1", "ascii", "latin-1", "latin_1", "cp1252"):
                return "windows-1252"
            return info.name
        except LookupError:
            pass  # bogus declaration: fall through to content sniff
    window = b[:_PRESCAN]
    if len(b) > _PRESCAN:
        # The hard slice can cut a multibyte sequence in half; a strict
        # decode would then misclassify a perfectly valid UTF-8 page as
        # cp1252 (whole-page mojibake). Trim the incomplete tail first.
        cut = len(window)
        for i in range(1, min(4, cut) + 1):
            byte = window[cut - i]
            if byte & 0xC0 == 0xC0:  # lead byte of a multibyte sequence
                need = 2 if byte < 0xE0 else 3 if byte < 0xF0 else 4
                if i < need:
                    window = window[: cut - i]
                break
            if byte & 0x80 == 0:  # ascii tail: nothing straddles the cut
                break
            # else: continuation byte (10xxxxxx) — keep walking back
    try:
        window.decode("utf-8", "strict")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


def decode_html_py(blob: bytes | None) -> tuple[str, str]:
    """(charset, text) for one page; decode errors replace, never raise.
    BOM bytes never reach the text (utf-8-sig strips its own; the
    utf-16/32 codecs do not, so their BOM is sliced off here)."""
    cs = sniff_charset_py(blob)
    if not blob:
        return cs, ""
    b = bytes(blob)
    for bom, name in _BOMS:
        if name == cs and name != "utf-8-sig" and b.startswith(bom):
            b = b[len(bom):]
            break
    return cs, b.decode(cs, "replace")


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("charset", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


@F.pandas_udf(_DECODE_SCHEMA)
def decode_html_udf(blob: pd.Series) -> pd.DataFrame:
    rows = [decode_html_py(b) for b in blob]
    return pd.DataFrame(rows, columns=["charset", "text"])


def decode_pages(
    df: DataFrame, html_col: str = "html", out_col: str = "decoded"
) -> DataFrame:
    """Append ``out_col`` = struct(charset, text) — sniffed + decoded in
    one map-side Arrow pass; page bytes never shuffle."""
    return df.withColumn(out_col, decode_html_udf(F.col(html_col)))


# ---------------------------------------------------------------------------
# Mojibake repair (the ftfy problem, stdlib-only): text that was UTF-8
# bytes mis-decoded as windows-1252/latin-1 somewhere upstream — by the
# origin server's templating, a proxy, or a feed aggregator — reaches
# the crawler as 'Ã©'/'â€™'/'Â\xa0' digraphs INSIDE otherwise-valid
# UTF-8 pages, so charset sniffing cannot catch it. The repair inverts
# the bad decode (chars -> the cp1252/latin-1 bytes they came from) and
# re-decodes strict UTF-8; acceptance is self-proving: genuine cp1252
# text re-encoded this way is almost never valid UTF-8, and chars above
# U+00FF (CJK, Cyrillic, ...) cannot be inverted at all, so such docs
# are provably untouched.
# ---------------------------------------------------------------------------

# chars that UTF-8 continuation/lead bytes 0x80-0x9F turn into under a
# cp1252 decode (the C1 range where cp1252 differs from latin-1)
_CP1252_INV = {
    bytes([b]).decode("cp1252"): b
    for b in range(0x80, 0xA0)
    if bytes([b]) not in (b"\x81", b"\x8d", b"\x8f", b"\x90", b"\x9d")
}
_MAX_MOJIBAKE_PASSES = 3


def _inverse_bad_decode(text: str) -> bytes | None:
    """The byte string whose cp1252-or-latin-1 decode produced ``text``,
    or None if some char can come from neither (genuinely non-Western
    text — never touched)."""
    out = bytearray()
    for ch in text:
        cp = ord(ch)
        if cp <= 0xFF:
            # latin-1 passthrough also covers cp1252's 5 unmapped holes
            # (0x81 0x8D 0x8F 0x90 0x9D), i.e. both bad-decode variants
            out.append(cp)
        else:
            b = _CP1252_INV.get(ch)
            if b is None:
                return None
            out.append(b)
    return bytes(out)


# plain-space/tab/newline runs: UTF-8 lead/continuation bytes are all
# >= 0x80, so a mojibake digraph can never contain one of these — token
# granularity loses no repairable case, and it is what lets a genuine
# em-dash or (c) elsewhere in the page coexist with repairable tokens
_WS_RUN = re.compile(r"([ \t\r\n]+)")


def _fix_token(tok: str) -> tuple[str, int]:
    passes = 0
    cur = tok
    for _ in range(_MAX_MOJIBAKE_PASSES):
        if cur.isascii():
            break
        raw = _inverse_bad_decode(cur)
        if raw is None:
            break
        try:
            fixed = raw.decode("utf-8", "strict")
        except UnicodeDecodeError:
            break
        if fixed == cur:
            break
        cur = fixed
        passes += 1
    return cur, passes


def fix_mojibake_py(text: str | None) -> tuple[str | None, int]:
    """(repaired_text, n_passes). n_passes=0 means the text was already
    clean (or not provably mojibake — repairs are only accepted when the
    inverted bytes strict-decode as UTF-8 *and* change the text, so the
    worst case is a no-op, never new corruption). NULL stays NULL.

    Repair is PER WHITESPACE-DELIMITED TOKEN, not whole-string: one
    genuine non-ASCII char (an em-dash in the site template, a (c) in
    the footer) must not veto repair of a CMS-mangled body elsewhere in
    the page. Tokens mixing genuine and mojibake chars inside the same
    token stay unrepaired (conservative). n_passes reports the max pass
    count over tokens; ASCII-only tokens short-circuit."""
    if text is None:
        return None, 0
    if not text or text.isascii():
        return text, 0
    parts = _WS_RUN.split(text)
    max_passes = 0
    for i in range(0, len(parts), 2):  # even slots = tokens, odd = seps
        fixed, n = _fix_token(parts[i])
        if n:
            parts[i] = fixed
            max_passes = max(max_passes, n)
    if not max_passes:
        return text, 0
    return "".join(parts), max_passes


_MOJIBAKE_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("mojibake_passes", T.IntegerType()),
    ]
)


@F.pandas_udf(_MOJIBAKE_SCHEMA)
def fix_mojibake_udf(text: pd.Series) -> pd.DataFrame:
    rows = [fix_mojibake_py(t) for t in text]
    return pd.DataFrame(rows, columns=["text", "mojibake_passes"])


def repair_mojibake(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Replace ``text_col`` (or append ``out_col``) with mojibake-repaired
    text plus a ``mojibake_passes`` audit column. NULL text stays NULL.
    One map-side Arrow pass, zero shuffles; the cheap ``isascii``
    short-circuit means clean English corpora pay one vectorized scan
    and no per-char work."""
    target = out_col or text_col
    # one struct column, THEN projections: referencing the UDF expr twice
    # after the first withColumn replaced text_col would re-run the UDF
    # on the already-repaired text (passes always 0)
    return (
        df.withColumn("_mj", fix_mojibake_udf(F.col(text_col)))
        .withColumn(target, F.col("_mj.text"))
        .withColumn("mojibake_passes", F.col("_mj.mojibake_passes"))
        .drop("_mj")
    )

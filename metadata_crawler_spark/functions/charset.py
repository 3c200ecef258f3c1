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

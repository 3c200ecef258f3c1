"""PDF text extraction: stdlib parser over the fixture-side writer.

Covers the lexer (strings/escapes/names/refs), stream filters, the
ObjStm (PDF 1.5) layout, ToUnicode CMap decode, content-stream text
ops (Tj/TJ/'/"/T*/Td/Tm), the never-raise posture on garbage, and the
Spark mapInPandas surface.
"""

from __future__ import annotations

import zlib

import pytest

from metadata_crawler_spark.operators.pdf_text import (
    _extract_content_text,
    _Font,
    _Lexer,
    encode_pdf,
    extract_pdf_text,
    pdf_text_table,
)


def test_roundtrip_plain_and_flate():
    pages = [["Hello world", "second line"], ["page two"]]
    for compress in (False, True):
        d = extract_pdf_text(encode_pdf(pages, compress=compress))
        assert d["ok"] and d["n_pages"] == 2 and d["err"] is None
        assert d["text"] == "Hello world\nsecond line\fpage two"


def test_roundtrip_escapes():
    d = extract_pdf_text(
        encode_pdf([["Alpha (beta)", "back\\slash and ) paren"]])
    )
    assert d["text"] == "Alpha (beta)\nback\\slash and ) paren"


def test_objstm_layout():
    """PDF 1.5 compressed-object-stream files: page dicts live inside a
    Flate-encoded /Type/ObjStm container, not as top-level objects."""
    blob = encode_pdf([["objstm page one"], ["two"]], use_objstm=True)
    assert b"/ObjStm" in blob
    # the page dicts are genuinely NOT in the plain byte stream
    assert b"/Type /Page /Parent" not in blob
    d = extract_pdf_text(blob)
    assert d["ok"] and d["n_pages"] == 2
    assert d["text"] == "objstm page one\ftwo"


def test_tounicode_two_byte_font():
    """Type0 fonts with a ToUnicode CMap decode 2-byte codes to the
    mapped characters (the standard subset-font embedding)."""
    s = "héllo wörld→"
    cmap = {i + 1: ch for i, ch in enumerate(dict.fromkeys(s))}
    d = extract_pdf_text(encode_pdf([[s]], tounicode=cmap))
    assert d["ok"] and d["text"] == s


def test_garbage_and_truncation_never_raise():
    assert extract_pdf_text(b"")["ok"] is False
    assert extract_pdf_text(b"not a pdf")["err"] == "not a PDF"
    blob = encode_pdf([["truncate me, gently"]])
    for cut in (10, len(blob) // 3, len(blob) - 5):
        d = extract_pdf_text(blob[:cut])  # must not raise
        assert isinstance(d["text"], str)
    # flipping bytes inside the Flate stream must not raise either
    broken = bytearray(encode_pdf([["zzz"]]))
    i = broken.find(b"stream\n") + 10
    broken[i] ^= 0xFF
    d = extract_pdf_text(bytes(broken))
    assert isinstance(d["ok"], bool)


def test_encrypted_flagged():
    blob = encode_pdf([["secret"]])
    blob = blob.replace(b"/Root", b"/Encrypt 9 0 R /Root")
    d = extract_pdf_text(blob)
    assert d["ok"] is False and "encrypted" in d["err"]


def test_unsupported_filter_partial():
    """A content stream with an unsupported filter is skipped and
    recorded in err; other pages still extract."""
    blob = encode_pdf([["kept page"]], compress=False)
    blob = blob.replace(
        b"<< /Length", b"<< /Filter /DCTDecode /Length", 1
    )
    d = extract_pdf_text(blob)
    assert d["ok"] and d["n_pages"] == 1
    assert "skipped" in d["err"]
    assert d["text"] == ""


def test_content_ops_tj_array_quotes_and_moves():
    """TJ kerning beyond -100 inserts a word space; ' and \" and T*
    break lines; Tm with a vertical move breaks a line; Td with ty=0
    does not."""
    content = (
        b"BT /F1 9 Tf 10 700 Td "
        b"[(Hel) -20 (lo) -250 (world)] TJ "
        b"(next) ' "
        b"T* (after) Tj "
        b"1 0 0 1 50 600 Tm (moved) Tj "
        b"1 0 0 1 99 600 Tm (same-row) Tj "
        b"15 0 Td (joined) Tj "
        b"ET"
    )
    text = _extract_content_text(content, {})
    assert text == "Hello world\nnext\nafter\nmovedsame-rowjoined"


def test_lexer_hex_strings_octal_names():
    lx = _Lexer(b"<48 65 6C6C6F>")
    assert lx.parse() == b"Hello"
    lx = _Lexer(b"<486>")  # odd digit count pads 0
    assert lx.parse() == b"\x48\x60"
    lx = _Lexer(rb"(oct \101\102 \51 done)")
    assert lx.parse() == b"oct AB ) done"
    lx = _Lexer(b"/A#42C")  # hex escape in name
    assert lx.parse() == "ABC"
    lx = _Lexer(b"<< /Kids [3 0 R 4 0 R] /Count 2 /F 1.5 >>")
    d = lx.parse()
    assert [r.num for r in d["Kids"]] == [3, 4]
    assert d["Count"] == 2 and d["F"] == 1.5


def test_font_fallback_latin1():
    f = _Font(False, None)
    assert f.decode(b"caf\xe9") == "café"


def test_contents_ref_to_array():
    """/Contents may be one ref pointing at an ARRAY of stream refs —
    the parts concatenate in order."""
    c1 = b"BT (part one ) Tj ET"
    c2 = b"BT (part two) Tj ET"
    blob = b"%PDF-1.4\n" + (
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n[5 0 R 6 0 R]\nendobj\n"
        b"5 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"6 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"trailer\n<< /Size 7 /Root 1 0 R >>\n"
        % (len(c1), c1, len(c2), c2)
    ) + b"%%EOF\n"
    d = extract_pdf_text(blob)
    # split content streams are mid-page continuations, not line breaks
    assert d["ok"] and d["text"] == "part one part two"


def test_zlib_trailing_garbage_tolerated():
    """Real-world Flate streams sometimes carry trailing bytes; the
    decoder falls back to decompressobj."""
    blob = encode_pdf([["tolerant"]], compress=False)
    z = zlib.compress(b"BT (tolerant) Tj ET") + b"JUNK"
    # rebuild the single content stream with trailing garbage
    start = blob.index(b"stream\n") + len(b"stream\n")
    end = blob.index(b"\nendstream")
    blob = (
        blob[: blob.index(b"<< /Length")]
        + b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(z)
        + z
        + blob[end:]
    )
    d = extract_pdf_text(blob)
    assert d["ok"] and d["text"] == "tolerant"


def test_pdf_text_table_spark(spark):
    """mapInPandas surface: ids pass through (incl. NULL), garbage rows
    come back ok=False, never a task failure."""
    rows = [
        (1, encode_pdf([["alpha", "beta"], ["gamma"]])),
        (2, encode_pdf([["objstm"]], use_objstm=True)),
        (3, b"garbage bytes"),
        (None, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, pdf binary")
    out = {r.doc_id: r for r in pdf_text_table(df).collect()}
    assert out[1].ok and out[1].n_pages == 2
    assert out[1].text == "alpha\nbeta\fgamma"
    assert out[2].ok and out[2].text == "objstm"
    assert out[3].ok is False and out[3].err == "not a PDF"
    assert out[None].ok is False
    assert len(out) == 4


def test_pdf_table_partitioned_batches(spark):
    """The decode distributes: many blobs across partitions, exact
    per-row parity with the local decode."""
    pages = [[f"doc {i} line {j}" for j in range(3)] for i in range(40)]
    rows = [(i, encode_pdf([pages[i]])) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, pdf binary").repartition(8)
    got = {r.doc_id: r.text for r in pdf_text_table(df).collect()}
    for i in range(40):
        assert got[i] == extract_pdf_text(rows[i][1])["text"]


def test_truncated_trailing_object_keeps_other_pages():
    """A crawl-truncated trailing object (lexer hits EOF mid-dict) must
    not zero out the extractable pages (review r5)."""
    blob = encode_pdf([["kept text survives"]])
    truncated = blob + b"9 0 obj\n<< /Type /Page "
    d = extract_pdf_text(truncated)
    assert d["ok"] and "kept text survives" in d["text"]


def test_page_tree_order_beats_object_number_order():
    """Pages emit in /Kids (document) order even when object numbering
    is reversed — incremental updates renumber routinely (review r5)."""
    c1 = b"BT (FIRST) Tj ET"
    c2 = b"BT (SECOND) Tj ET"
    blob = b"%PDF-1.4\n" + (
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [5 0 R 3 0 R] /Count 2 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>\nendobj\n"
        b"6 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"trailer\n<< /Size 7 /Root 1 0 R >>\n"
        % (len(c2), c2, len(c1), c1)
    ) + b"%%EOF\n"
    d = extract_pdf_text(blob)
    assert d["ok"] and d["text"] == "FIRST\fSECOND"


def test_bfrange_array_does_not_clobber_bfchar():
    """Array-form bfrange hex strings must not re-match as a plain
    triple and overwrite bfchar mappings (review r5)."""
    from metadata_crawler_spark.operators.pdf_text import _parse_tounicode

    raw = (
        b"2 beginbfchar\n<0041> <0058>\n<0042> <0059>\nendbfchar\n"
        b"1 beginbfrange\n<0010> <0012> [<0041> <0042> <0043>]\nendbfrange\n"
    )
    cmap = _parse_tounicode(raw)
    assert cmap[0x41] == "X" and cmap[0x42] == "Y"  # bfchar intact
    assert cmap[0x10] == "A" and cmap[0x11] == "B" and cmap[0x12] == "C"


def test_bfrange_bounded_and_overflow_safe():
    """A crafted giant range is capped at the 2-byte code space (no
    hang/OOM) and a dst increment past the hex width stays valid."""
    import time

    from metadata_crawler_spark.operators.pdf_text import _parse_tounicode

    t0 = time.time()
    cmap = _parse_tounicode(
        b"1 beginbfrange\n<00000000> <FFFFFFFF> <0041>\nendbfrange\n"
    )
    assert time.time() - t0 < 10.0
    assert len(cmap) == 0x10000 and cmap[0] == "A"
    # overflow: 0xFFFD + 3 codes crosses 0x10000
    cmap = _parse_tounicode(
        b"1 beginbfrange\n<0001> <0004> <FFFD>\nendbfrange\n"
    )
    assert cmap[0x01] == "�" and len(cmap[0x04]) >= 1  # never raises


def test_flate_bomb_skips_stream():
    """A decompression bomb costs a skipped stream, not an OOM."""
    bomb = zlib.compress(b"\x00" * (200 * 1024 * 1024), 9)
    blob = encode_pdf([["safe page"]], compress=False)
    start = blob.index(b"stream\n") + len(b"stream\n")
    end = blob.index(b"\nendstream")
    blob = (
        blob[: blob.index(b"<< /Length")]
        + b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(bomb)
        + bomb
        + blob[end:]
    )
    d = extract_pdf_text(blob)
    assert d["ok"] and d["text"] == "" and "skipped" in d["err"]


def test_encrypt_mention_in_text_not_flagged():
    """A page that merely TALKS about /Encrypt extracts fine; only a
    trailer-dict /Encrypt key flags encryption (review r5)."""
    d = extract_pdf_text(
        encode_pdf([["the /Encrypt key marks encrypted PDFs"]],
                   compress=False)
    )
    assert d["ok"] and "/Encrypt key marks" in d["text"]

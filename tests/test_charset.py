"""Charset sniffing + robust decode (functions/charset.py): BOMs, meta
declarations (incl. the latin-1 -> windows-1252 spec mapping and bogus
labels), UTF-8 trial, cp1252 fallback, Spark surface."""

from metadata_crawler_spark.functions.charset import (
    decode_html_py,
    decode_pages,
    sniff_charset_py,
)

EURO_1252 = "café — €5".encode("windows-1252")


def test_bom_wins():
    assert sniff_charset_py("﻿hi".encode("utf-8")) == "utf-8-sig"
    assert sniff_charset_py("hi".encode("utf-16-le")) != "utf-16-le"  # no BOM
    assert sniff_charset_py("﻿hi".encode("utf-16-le")) == "utf-16-le"
    assert sniff_charset_py("﻿hi".encode("utf-32-be")) == "utf-32-be"
    cs, text = decode_html_py("﻿hé".encode("utf-16-le"))
    assert (cs, text) == ("utf-16-le", "hé")  # BOM never reaches the text
    assert decode_html_py("﻿hé".encode())[1] == "hé"  # utf-8-sig strips too


def test_meta_declaration_and_aliases():
    page = b'<html><meta charset="Shift_JIS"><body>' + "テスト".encode("shift_jis")
    assert sniff_charset_py(page) == "shift_jis"
    assert "テスト" in decode_html_py(page)[1]
    httpequiv = (
        b'<meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1">'
        + EURO_1252
    )
    # spec: declared latin-1 means windows-1252 on the web
    assert sniff_charset_py(httpequiv) == "windows-1252"
    assert "€5" in decode_html_py(httpequiv)[1]
    bogus = b'<meta charset="not-a-real-charset">hello'
    assert sniff_charset_py(bogus) == "utf-8"  # falls through to trial


def test_utf8_trial_and_cp1252_fallback():
    assert sniff_charset_py("naïve utf-8 ✓".encode()) == "utf-8"
    assert sniff_charset_py(EURO_1252) == "windows-1252"
    assert decode_html_py(EURO_1252)[1] == "café — €5"
    assert decode_html_py(None) == ("utf-8", "")
    assert decode_html_py(b"") == ("utf-8", "")


def test_spark_decode_pages(spark):
    rows = [
        (1, "plain utf-8 é".encode()),
        (2, EURO_1252),
        (3, b'<meta charset="shift_jis">' + "日本".encode("shift_jis")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, html binary")
    got = {r["id"]: r["decoded"] for r in decode_pages(df).collect()}
    assert got[1]["charset"] == "utf-8" and "é" in got[1]["text"]
    assert got[2]["charset"] == "windows-1252" and "€5" in got[2]["text"]
    assert got[3]["charset"] == "shift_jis" and "日本" in got[3]["text"]
    assert got[4]["text"] == ""
    plan = decode_pages(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_utf8_multibyte_straddling_prescan_window():
    """A valid UTF-8 page whose multibyte char is cut in half by the
    2048-byte prescan slice must still sniff as utf-8 (a strict decode of
    the hard slice would raise and misclassify the page as cp1252,
    mojibake-ing the whole document)."""
    for mb in ("é", "€", "𝄞"):  # 2-, 3-, 4-byte sequences
        enc = mb.encode("utf-8")
        for split in range(1, len(enc)):
            page = b"a" * (2048 - split) + enc + "tail — ok".encode("utf-8")
            assert sniff_charset_py(page) == "utf-8", (mb, split)
            assert mb in decode_html_py(page)[1]
    # control: a real cp1252 page is still detected
    page = b"a" * 2040 + "café — €".encode("windows-1252")
    assert sniff_charset_py(page) == "windows-1252"
    # all-continuation tail (invalid utf-8) must not loop past the walk cap
    assert sniff_charset_py(b"a" * 2040 + b"\x80" * 600) == "windows-1252"


def test_mojibake_single_pass_repair():
    """UTF-8 text mis-decoded as cp1252 (or latin-1) is inverted back,
    including chars whose UTF-8 bytes land in cp1252's C1 range."""
    from metadata_crawler_spark.functions.charset import fix_mojibake_py

    for original in (
        "café élégant — naïve",
        "curly ’quote’ and em—dash",
        "nbsp glued",
        "mixed ascii with one é only",
    ):
        broken = original.encode("utf-8").decode("cp1252")
        fixed, n = fix_mojibake_py(broken)
        assert fixed == original and n == 1, original
    # latin-1 variant of the bad decode (C1 holes pass through)
    broken_l1 = "déjà vu".encode("utf-8").decode("latin-1")
    fixed, n = fix_mojibake_py(broken_l1)
    assert fixed == "déjà vu" and n == 1


def test_mojibake_multi_pass_and_idempotence():
    from metadata_crawler_spark.functions.charset import fix_mojibake_py

    original = "séance à Zürich"
    twice = (
        original.encode("utf-8").decode("cp1252").encode("utf-8").decode("cp1252")
    )
    fixed, n = fix_mojibake_py(twice)
    assert fixed == original and n == 2
    again, n2 = fix_mojibake_py(fixed)
    assert again == original and n2 == 0  # repair is a fixed point


def test_mojibake_clean_text_untouched():
    """Genuine non-mojibake text must never be altered: ASCII, real
    accented Western text, and scripts above U+00FF (not invertible)."""
    from metadata_crawler_spark.functions.charset import fix_mojibake_py

    for clean in (
        "plain ascii only",
        "genuine café crème — déjà vu",   # cp1252-able but invalid UTF-8
        "中文文本不可触碰",
        "русский текст",
        "mixed 中文 and café",
        "",
    ):
        fixed, n = fix_mojibake_py(clean)
        assert fixed == clean and n == 0, clean
    assert fix_mojibake_py(None) == (None, 0)  # NULL stays NULL


def test_mojibake_token_granularity():
    """One genuine non-ASCII char elsewhere in the page must not veto
    repair of mojibake tokens: repair is per whitespace-delimited token."""
    from metadata_crawler_spark.functions.charset import fix_mojibake_py

    broken_cafe = "café".encode("utf-8").decode("cp1252")
    # genuine em-dash + genuine CJK coexist with a repairable token
    mixed = f"{broken_cafe} menu — updated 中文 daily"
    fixed, n = fix_mojibake_py(mixed)
    assert fixed == "café menu — updated 中文 daily" and n == 1
    # newline/tab separators preserved byte-exactly
    mixed2 = f"a\t{broken_cafe}\n\nb"
    fixed2, n2 = fix_mojibake_py(mixed2)
    assert fixed2 == "a\tcafé\n\nb" and n2 == 1
    # a token mixing genuine and mojibake chars stays conservative
    tok = broken_cafe + "—"
    assert fix_mojibake_py(tok) == (tok, 0)


def test_mojibake_spark_surface(spark):
    from metadata_crawler_spark.functions.charset import repair_mojibake

    original = "café élégant"
    rows = [
        (0, original.encode("utf-8").decode("cp1252")),
        (1, "clean ascii"),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in repair_mojibake(df).collect()}
    assert out[0]["text"] == original and out[0]["mojibake_passes"] == 1
    assert out[1]["text"] == "clean ascii" and out[1]["mojibake_passes"] == 0
    assert out[2]["text"] is None and out[2]["mojibake_passes"] == 0
    plan = repair_mojibake(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

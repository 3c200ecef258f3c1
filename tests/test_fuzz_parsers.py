"""Adversarial-bytes fuzz for the text/document parsers.

Same contract as test_fuzz_robustness (the codec half): parsers that
run inside mapInPandas over crawled bytes must terminate promptly on
corrupt input — an exception is data (callers map it to an error row),
a hang is a stuck executor. Covered here: the PDF extractor, the
HTML→markdown converter, jusText main-content extraction, and the WARC
record parser (resync path).
"""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from fuzz_util import FUZZ
from fuzz_util import mutate as _mutate
from fuzz_util import terminates as _terminates


def _valid_pdf() -> bytes:
    from metadata_crawler_spark.operators.pdf_text import encode_pdf

    return encode_pdf(
        [["First page body text", "second line (with) parens"],
         ["Second page"]],
        compress=True,
    )


def _valid_warc() -> bytes:
    from datetime import datetime, timezone

    from metadata_crawler_spark.sources.warc import render_warc

    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    return render_warc(
        [(f"https://h{i}.example.com/p", ts,
          b"<html><body>" + bytes(40) + b"</body></html>")
         for i in range(4)]
    )


_PDF = _valid_pdf()
_WARC = _valid_warc()

_HTML = (
    b"<html><head><title>t</title><meta charset='utf-8'></head><body>"
    b"<h1>Header</h1><p>Some <b>bold</b> paragraph with a "
    b"<a href='/x'>link</a>.</p><ul><li>a</li><li>b</li></ul>"
    b"<table><tr><td>1</td><td>2</td></tr></table>"
    b"<pre>code  here</pre></body></html>"
)


@FUZZ
@given(seed=st.integers(0, 2**31 - 1), n_flips=st.integers(1, 8),
       trunc=st.booleans())
def test_pdf_extract_terminates(seed, n_flips, trunc):
    from metadata_crawler_spark.operators.pdf_text import extract_pdf_text

    _terminates(extract_pdf_text, _mutate(_PDF, seed, n_flips, trunc))


@FUZZ
@given(seed=st.integers(0, 2**31 - 1), n_flips=st.integers(1, 8),
       trunc=st.booleans())
def test_warc_parse_terminates(seed, n_flips, trunc):
    from metadata_crawler_spark.sources.warc import parse_warc_bytes

    _terminates(parse_warc_bytes, _mutate(_WARC, seed, n_flips, trunc))


@FUZZ
@given(seed=st.integers(0, 2**31 - 1), n_flips=st.integers(1, 10),
       trunc=st.booleans())
def test_markdown_and_justext_terminate(seed, n_flips, trunc):
    from metadata_crawler_spark.functions.boilerplate import extract_main_py
    from metadata_crawler_spark.functions.markdown import to_markdown_py

    blob = _mutate(_HTML, seed, n_flips, trunc)
    _terminates(to_markdown_py, blob)
    _terminates(extract_main_py, blob)


@FUZZ
@given(html=st.text(max_size=300))
def test_markdown_arbitrary_text_terminates(html):
    from metadata_crawler_spark.functions.boilerplate import extract_main_py
    from metadata_crawler_spark.functions.markdown import to_markdown_py

    _terminates(to_markdown_py, html)
    _terminates(extract_main_py, html)
    # markdown extraction must also never raise on str input: it feeds
    # a non-nullable UDF struct column
    out = to_markdown_py(html)
    assert isinstance(out[0], str)

"""Property fuzz: WET/WAT record framing survives adversarial payloads.

The derivative sinks frame records with Content-Length inside member-gzip
(sources/wet.render_derivative_record) and read them back through the
incremental WARC parser (sources/warc.parse_warc_stream). The framing
must be payload-agnostic: payloads that CONTAIN the record delimiters —
``WARC/1.0`` banners, ``\\r\\n\\r\\n`` header terminators, NULs, partial
gzip magic — must round-trip byte-exactly, because Content-Length, not
pattern matching, bounds the payload (the resync scan only runs on
corrupt streams). URLs follow the crawl contract (canonicalized, no
control characters), so the strategy filters them accordingly.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timedelta

from hypothesis import given
from hypothesis import strategies as st

from fuzz_util import FUZZ

from metadata_crawler_spark.sources.warc import parse_warc_stream
from metadata_crawler_spark.sources.wet import render_derivative_record

# payloads biased toward the delimiters the parser keys on
_DELIMS = [b"WARC/1.0", b"\r\n\r\n", b"WARC/", b"\r\n", b"\x00", b"\x1f\x8b"]

_payload = st.one_of(
    st.binary(max_size=300),
    st.lists(
        st.one_of(st.sampled_from(_DELIMS), st.binary(max_size=40)),
        max_size=8,
    ).map(b"".join),
)

# the crawl contract: canonicalized URLs carry no control characters and
# no surrounding whitespace (header values are whitespace-stripped on
# read, so a padded URL would not — and should not — round-trip)
_url = st.text(min_size=1, max_size=60).filter(
    lambda s: not any(ord(c) < 32 or ord(c) == 127 for c in s)
    and s == s.strip()
    and s.strip() != ""
)

_recs = st.lists(st.tuples(_url, _payload), min_size=1, max_size=8)


@FUZZ
@given(recs=_recs, kind=st.sampled_from(["conversion", "metadata"]))
def test_member_gzip_roundtrip_is_exact(recs, kind):
    base = datetime(2026, 1, 1, 0, 0, 0)
    stamped = [
        (url, base + timedelta(seconds=i), payload)
        for i, (url, payload) in enumerate(recs)
    ]
    blob = b"".join(
        gzip.compress(render_derivative_record(url, ts, payload, kind))
        for url, ts, payload in stamped
    )
    # GzipFile reads concatenated members transparently — the same path
    # read_wet/_open_uri take for a .gz segment
    fh = gzip.GzipFile(fileobj=io.BytesIO(blob), mode="rb")
    got = list(parse_warc_stream(fh, "seg-0", accept_types=(kind,)))
    assert [(u, t, p) for u, t, p, _seg in got] == stamped
    assert all(seg == "seg-0" for _u, _t, _p, seg in got)


@FUZZ
@given(recs=_recs)
def test_foreign_record_types_are_skipped_not_mangled(recs):
    """Interleave conversion and metadata records: filtering by
    accept_types must drop the others WITHOUT desyncing the stream
    (their payloads also contain banner bytes)."""
    base = datetime(2026, 1, 1)
    blob = b""
    want = []
    for i, (url, payload) in enumerate(recs):
        kind = "conversion" if i % 2 == 0 else "metadata"
        ts = base + timedelta(seconds=i)
        blob += gzip.compress(render_derivative_record(url, ts, payload, kind))
        if kind == "conversion":
            want.append((url, ts, payload))
    fh = gzip.GzipFile(fileobj=io.BytesIO(blob), mode="rb")
    got = list(parse_warc_stream(fh, "s", accept_types=("conversion",)))
    assert [(u, t, p) for u, t, p, _ in got] == want

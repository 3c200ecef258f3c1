"""WARC segment source: Common-Crawl-shaped ingestion.

Reference parity: the reference's storage backends open discovered objects
and pull typed metadata out of their contents (storage_backend.py:102-149
``open_dataset`` dispatch). Our corpus objects are WARC segments — the
archival format Common Crawl ships — so this module turns a directory of
``*.warc`` files into the engine's pages table shape
``(url, warc_ts, html, segment)``.

Spark shape: ``binaryFile`` scan (one task per segment — segments are the
natural parallel unit, ~1 GB each at Common Crawl scale) ->
``mapInPandas`` record splitter. Parsing is per-segment byte scanning
(find/slice over ``bytes`` — no regex backtracking, no external libs);
record payloads that are HTTP responses are unwrapped to their bodies.

The writer (``render_warc``) exists for fixtures/tests: deterministic
WARC/1.0 bytes that the reader must round-trip exactly.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, segment string"
)

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"


def render_warc(records: Iterable[tuple[str, datetime, bytes]]) -> bytes:
    """(url, ts, html) records -> WARC/1.0 response-record bytes (fixture
    side; payloads wrapped as minimal HTTP/1.1 responses like real WARCs)."""
    out = bytearray()
    for url, ts, html in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + f"Content-Length: {len(html)}\r\n\r\n".encode()
            + html
        )
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            f"Content-Length: {len(http)}\r\n"
            "\r\n"
        ).encode()
        out += hdr + http + _HDR_END
    return bytes(out)


def parse_warc_bytes(
    blob: bytes, segment: str = ""
) -> Iterator[tuple[str, datetime, bytes, str]]:
    """Yield (url, warc_ts, html, segment) for every response record.

    Record framing follows Content-Length exactly (the only correct way —
    payloads may contain anything, including 'WARC/1.0'). Non-response
    records and records without a target URI are skipped, matching how a
    pipeline treats request/metadata records.
    """
    pos = 0
    n = len(blob)
    while pos < n:
        start = blob.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = blob.find(_HDR_END, start)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in blob[start:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        payload = blob[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        raw_date = headers.get("warc-date", "1970-01-01T00:00:00Z")
        try:
            ts = datetime.strptime(raw_date, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            ts = datetime(1970, 1, 1)
        # unwrap an HTTP response payload to its body
        if payload.startswith(b"HTTP/"):
            body_at = payload.find(_HDR_END)
            html = payload[body_at + 4 :] if body_at >= 0 else payload
        else:
            html = payload
        yield url, ts, html, segment


def read_warc_segments(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of ``*.warc`` files -> pages-shaped DataFrame.

    One binaryFile task per segment; the splitter is a mapInPandas
    generator so a 1 GB segment never materializes more than one Arrow
    batch of parsed records at a time.
    """

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():  # rows = whole segments (few)
                recs = list(parse_warc_bytes(bytes(row["content"]), row["path"]))
                if recs:
                    yield pd.DataFrame(
                        recs, columns=["url", "warc_ts", "html", "segment"]
                    )

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(split, WARC_PAGES_SCHEMA)

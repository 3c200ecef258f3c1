"""WET/WAT derivation: derive -> write member-gzip segments -> read back,
against the same extraction operators the crawl loop uses."""

from __future__ import annotations

import glob
import gzip
import json
import os
from datetime import datetime

from pyspark.sql import functions as F

from metadata_crawler_spark.functions.text import extract_text_py
from metadata_crawler_spark.sources.warc import (
    read_warc_segments,
    render_warc,
)
from metadata_crawler_spark.sources.wet import (
    read_wat,
    read_wet,
    wat_from_pages,
    wet_from_pages,
    write_wat,
    write_wet,
)

RECS = [
    ("https://a.com/x", datetime(2026, 1, 1, 12, 0),
     b"<html><head><title>Alpha Page</title></head>"
     b"<body>alpha bravo <a href='https://b.org/y'>link</a></body></html>"),
    ("https://b.org/y", datetime(2026, 2, 2, 3, 4),
     b"<html><head><meta http-equiv=\"content-language\" content=\"de\">"
     b"</head><body>charlie delta</body></html>"),
    ("https://c.net/z", datetime(2026, 3, 3, 0, 0),
     b"<html><body>WARC/1.0 tricky \r\n\r\n payload</body></html>"),
]


def _pages(spark, tmp_path):
    seg = tmp_path / "segs"
    seg.mkdir()
    (seg / "s0.warc").write_bytes(render_warc(RECS))
    return read_warc_segments(spark, str(seg / "*.warc"))


def test_wet_write_read_roundtrip(spark, tmp_path):
    pages = _pages(spark, tmp_path)
    out = str(tmp_path / "wet")
    manifest = write_wet(pages, out).collect()
    assert sum(m.n_records for m in manifest) == len(RECS)
    for m in manifest:
        assert os.path.exists(m.path) and m.path.endswith(".warc.wet.gz")
        assert os.path.getsize(m.path) == m.n_bytes
    back = {r.url: r.wet_text for r in read_wet(spark, out + "/*.gz").collect()}
    for url, _, html in RECS:
        assert back[url] == extract_text_py(html)


def test_wet_text_matches_crawl_extractor(spark, tmp_path):
    pages = _pages(spark, tmp_path)
    got = {r.url: r.wet_text for r in wet_from_pages(pages).collect()}
    assert got == {u: extract_text_py(h) for u, _, h in RECS}


def test_wat_envelope_fields(spark, tmp_path):
    pages = _pages(spark, tmp_path)
    rows = {r.url: json.loads(r.wat_json) for r in wat_from_pages(pages).collect()}
    a = rows["https://a.com/x"]
    assert a["title"] == "Alpha Page"
    assert a["n_links"] == 1 and a["links"] == ["https://b.org/y"]
    assert a["content_length"] == len(RECS[0][2])
    assert rows["https://b.org/y"]["meta_lang"] == "de"
    assert rows["https://c.net/z"]["n_links"] == 0


def test_wat_write_read_roundtrip(spark, tmp_path):
    pages = _pages(spark, tmp_path)
    out = str(tmp_path / "wat")
    write_wat(pages, out).collect()
    back = {r.url: json.loads(r.wat_json)
            for r in read_wat(spark, out + "/*.gz").collect()}
    assert back["https://a.com/x"]["title"] == "Alpha Page"
    assert len(back) == len(RECS)


def test_wet_segments_are_member_gzip(spark, tmp_path):
    """Each record is its own gzip member — the CC range-read layout: the
    file must gunzip as a stream AND each member boundary must start a
    fresh WARC record."""
    pages = _pages(spark, tmp_path).repartition(1)
    out = str(tmp_path / "wet1")
    write_wet(pages, out).collect()
    (path,) = glob.glob(out + "/*.gz")
    blob = open(path, "rb").read()
    # streaming gunzip of concatenated members
    text = gzip.decompress(blob)
    assert text.count(b"WARC-Type: conversion") == len(RECS)
    # member boundaries: decompress the first member alone
    d = gzip._GzipReader(__import__("io").BytesIO(blob))
    first = d.read()
    assert first.startswith(b"WARC/1.0")


def test_wet_no_empty_partition_files(spark, tmp_path):
    pages = _pages(spark, tmp_path).repartition(8)  # 3 rows in 8 parts
    out = str(tmp_path / "wet8")
    manifest = write_wet(pages, out).collect()
    files = glob.glob(out + "/*.gz")
    assert len(files) == len(manifest) <= 3
    assert sum(m.n_records for m in manifest) == len(RECS)


def test_wet_null_timestamp_writes_epoch_sentinel(spark, tmp_path):
    """NULL/NaT warc_ts must serialize as the epoch sentinel (the WARC
    sink's rule), not crash the task."""
    pages = spark.createDataFrame(
        [("https://n.com/x", None, b"<html><body>null ts</body></html>",
          "s0")],
        "url string, warc_ts timestamp, html binary, segment string",
    )
    out = str(tmp_path / "wet_null")
    manifest = write_wet(pages, out).collect()
    assert sum(r["n_records"] for r in manifest) == 1
    got = read_wet(spark, out + "/*.gz").collect()
    assert len(got) == 1
    assert got[0]["warc_ts"] == datetime(1970, 1, 1)


def test_wet_write_publishes_atomically(spark, tmp_path):
    """Segments appear only under their final name: no .tmp residue and
    every published file is complete member-gzip (the tmp+rename
    contract write_derivative_segments shares with the WARC sink)."""
    pages = _pages(spark, tmp_path)
    out = str(tmp_path / "wet_atomic")
    write_wet(pages, out).collect()
    assert glob.glob(out + "/*.tmp") == []
    for path in glob.glob(out + "/*.gz"):
        with open(path, "rb") as fh:
            raw = fh.read()
        assert raw[:2] == b"\x1f\x8b"
        gzip.decompress(raw)  # complete members, no truncation


def test_wet_failed_task_publishes_nothing(spark, tmp_path):
    """A task that dies mid-partition must not leave a partial segment
    under the FINAL name (a later read_wet glob would ingest it as
    complete) — the exception path routes through _open_out's abort,
    which unlinks the tmp instead of renaming it."""
    import pandas as pd
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    def boom(batches):
        for pdf in batches:
            yield pdf
            raise RuntimeError("planted mid-partition failure")

    pages = _pages(spark, tmp_path).repartition(1).mapInPandas(
        boom, "url string, warc_ts timestamp, html binary, segment string"
    )
    out = str(tmp_path / "wet_fail")
    with pytest.raises(PythonException):
        write_wet(pages, out).collect()
    assert glob.glob(out + "/*.gz") == [], "partial segment was published"
    assert glob.glob(out + "/*.tmp") == [], "tmp residue left behind"

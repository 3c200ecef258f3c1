"""WARC archive sink: write_warc_segments -> segments + CDX index."""

from __future__ import annotations

import glob
import gzip
import os
from datetime import datetime, timedelta

from metadata_crawler_spark.sources.warc import (
    parse_warc_bytes,
    read_warc_records,
    read_warc_segments,
    write_warc_segments,
)


def _pages(n: int):
    t0 = datetime(2026, 5, 1, 8, 0, 0)
    return [
        (
            f"https://h{i % 7}.example.org/p{i}",
            t0 + timedelta(seconds=i),
            f"<html><body>doc {i} {'x' * (i % 50)}</body></html>".encode(),
        )
        for i in range(n)
    ]


def _write(spark, tmp_path, n=120, parts=4, **kw):
    out = str(tmp_path / "archive")
    os.makedirs(out, exist_ok=True)
    df = spark.createDataFrame(
        _pages(n), "url string, warc_ts timestamp, html binary"
    ).repartition(parts)
    idx = write_warc_segments(df, out, **kw).toPandas()
    return out, idx


def test_write_read_roundtrip(spark, tmp_path):
    out, idx = _write(spark, tmp_path)
    assert len(idx) == 120
    back = read_warc_segments(spark, out)
    rows = {r.url: bytes(r.html) for r in back.collect()}
    assert rows == {u: h for u, _, h in _pages(120)}


def test_index_range_reads_single_member(spark, tmp_path):
    """Every index row must locate exactly one gzip member that parses
    to its record — the O(1) page re-read contract."""
    out, idx = _write(spark, tmp_path)
    for row in idx.sample(n=10, random_state=1).itertuples():
        with open(row.segment, "rb") as fh:
            fh.seek(row.offset)
            member = fh.read(row.length)
        recs = list(parse_warc_bytes(gzip.decompress(member)))
        assert len(recs) == 1
        assert recs[0][0] == row.url


def test_read_warc_records_consumes_index(spark, tmp_path):
    out, idx = _write(spark, tmp_path, n=40, parts=2)
    cap = spark.createDataFrame(
        idx.rename(
            columns={
                "segment": "warc_filename",
                "offset": "warc_offset",
                "length": "warc_length",
            }
        )
    )
    got = {r.url: bytes(r.html) for r in read_warc_records(spark, cap).collect()}
    assert got == {u: h for u, _, h in _pages(40)}


def test_segment_rolling(spark, tmp_path):
    out, idx = _write(spark, tmp_path, n=200, parts=1,
                      target_segment_bytes=2000)
    segs = sorted(glob.glob(out + "/*.warc.gz"))
    assert len(segs) > 3  # rolled
    # offsets restart per segment and every file respects tmp cleanup
    assert not glob.glob(out + "/*.tmp")
    per_seg = idx.groupby("segment")["offset"].min()
    assert (per_seg == 0).all()
    # compressed sizes stay near the roll target (one member overshoot)
    for s in segs[:-1]:
        assert os.path.getsize(s) >= 2000


def test_deterministic_rewrite(spark, tmp_path):
    """Same data + partitioning -> byte-identical segments (mtime=0),
    so a retried/re-run task is a true overwrite, not a near-duplicate."""
    out1, _ = _write(spark, tmp_path / "a", parts=2)
    out2, _ = _write(spark, tmp_path / "b", parts=2)
    f1 = sorted(glob.glob(out1 + "/*.warc.gz"))
    f2 = sorted(glob.glob(out2 + "/*.warc.gz"))
    assert [os.path.basename(f) for f in f1] == [
        os.path.basename(f) for f in f2
    ]
    for a, b in zip(f1, f2):
        assert open(a, "rb").read() == open(b, "rb").read()


def test_empty_partitions_write_nothing(spark, tmp_path):
    out = str(tmp_path / "arch2")
    os.makedirs(out)
    df = spark.createDataFrame(
        _pages(3), "url string, warc_ts timestamp, html binary"
    ).repartition(8)
    idx = write_warc_segments(df, out).toPandas()
    assert len(idx) == 3
    # only partitions that held rows produced files
    assert len(glob.glob(out + "/*.warc.gz")) == len(idx["segment"].unique())


def test_null_ts_and_html_sentinel(spark, tmp_path):
    out = str(tmp_path / "arch3")
    df = spark.createDataFrame(
        [("https://x/n", None, None)],
        "url string, warc_ts timestamp, html binary",
    )
    idx = write_warc_segments(df, out).toPandas()
    assert idx.warc_ts[0] == datetime(1970, 1, 1)
    back = read_warc_segments(spark, out).collect()
    assert back[0].url == "https://x/n" and bytes(back[0].html) == b""


def test_revisit_records(spark, tmp_path):
    """revisit_flag_col: flagged rows archive as zero-payload WARC
    revisit records (identical-payload-digest profile) with digest +
    refers-to date; the index gains a kind column; response rows are
    byte-identical to the flagless sink's."""
    from metadata_crawler_spark.sources.warc import (
        REVISIT_PROFILE,
        parse_warc_stream,
    )

    t0 = datetime(2026, 5, 1, 8, 0, 0)
    prior = datetime(2026, 4, 1, 12, 0, 0)
    rows = [
        ("https://a/1", t0, b"<html>one</html>", False, None, None),
        ("https://a/2", t0, None, True, "md5:aabbcc", prior),
        ("https://a/3", t0, b"<html>three</html>", False, None, None),
        ("https://a/4", t0, None, True, "md5:ddeeff", prior),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, not_mod boolean,"
        " digest string, refers_ts timestamp",
    ).coalesce(1)
    out = str(tmp_path / "arch_rev")
    os.makedirs(out, exist_ok=True)
    idx = write_warc_segments(
        df, out, revisit_flag_col="not_mod"
    ).toPandas().sort_values("url").reset_index(drop=True)
    assert list(idx["kind"]) == ["response", "revisit", "response", "revisit"]

    # raw record inspection: profile + digest + refers headers, no body
    seg = idx["segment"][0]
    raw = gzip.decompress(open(seg, "rb").read()).decode("latin-1")
    assert raw.count("WARC-Type: revisit") == 2
    assert raw.count(f"WARC-Profile: {REVISIT_PROFILE}") == 2
    assert "WARC-Payload-Digest: md5:aabbcc" in raw
    assert "WARC-Refers-To-Date: 2026-04-01T12:00:00Z" in raw

    # default reader (accept_types=response) sees only the real bodies
    back = read_warc_segments(spark, out)
    assert {r.url for r in back.collect()} == {"https://a/1", "https://a/3"}
    # opting into revisit records yields the pointers with empty payload
    rev = read_warc_segments(spark, out, accept_types=("revisit",))
    got = {r.url: bytes(r.html) for r in rev.collect()}
    assert got == {"https://a/2": b"", "https://a/4": b""}

    # index coordinates still locate exactly one member per record
    for row in idx.itertuples():
        with open(row.segment, "rb") as fh:
            fh.seek(row.offset)
            member = fh.read(row.length)
        recs = list(
            parse_warc_stream(
                __import__("io").BytesIO(gzip.decompress(member)),
                accept_types=("response", "revisit"),
            )
        )
        assert len(recs) == 1 and recs[0][0] == row.url


def test_revisit_off_schema_unchanged(spark, tmp_path):
    out, idx = _write(spark, tmp_path, n=10, parts=1)
    assert list(idx.columns) == ["url", "warc_ts", "segment", "offset", "length"]


def test_read_warc_records_resolves_revisit_pointers(spark, tmp_path):
    """Range reads of the kind-aware index's revisit rows: the indexed
    coordinates must come back through read_warc_records with
    accept_types=('revisit',) — the default ('response',) would
    silently drop the records the index explicitly names."""
    import pyspark.sql.functions as F

    from metadata_crawler_spark.sources.warc import read_warc_records

    t0 = datetime(2026, 5, 1, 8, 0, 0)
    prior = datetime(2026, 4, 1, 12, 0, 0)
    rows = [
        ("https://a/1", t0, b"<html>one</html>", False, None, None),
        ("https://a/2", t0, None, True, "md5:aabbcc", prior),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, not_mod boolean,"
        " digest string, refers_ts timestamp",
    ).coalesce(1)
    out = str(tmp_path / "arch_rr")
    os.makedirs(out, exist_ok=True)
    idx = write_warc_segments(df, out, revisit_flag_col="not_mod")
    cap = idx.filter("kind = 'revisit'").select(
        F.col("segment").alias("warc_filename"),
        F.col("offset").alias("warc_offset"),
        F.col("length").alias("warc_length"),
    )
    got = read_warc_records(
        spark, cap, accept_types=("revisit",)
    ).collect()
    assert {r.url: bytes(r.html) for r in got} == {"https://a/2": b""}
    # and the default reader drops them (pointers are not bodies)
    assert read_warc_records(spark, cap).count() == 0


def test_crlf_url_cannot_break_record_framing(spark, tmp_path):
    """A url with an embedded/trailing CR/LF (valid_urls' Java '$'
    admits a trailing terminator) must not terminate the WARC header
    block early: the record's body survives and the index url equals
    the archived header url."""
    from metadata_crawler_spark.sources.warc import (
        parse_warc_bytes,
        render_warc,
    )

    t0 = datetime(2026, 5, 1, 8, 0, 0)
    evil = "https://x/a\r\n"
    blob = render_warc([(evil, t0, b"<html>alive</html>")])
    recs = list(parse_warc_bytes(blob))
    assert len(recs) == 1
    assert recs[0][0] == "https://x/a"
    assert recs[0][2] == b"<html>alive</html>"

    df = spark.createDataFrame(
        [(evil, t0, b"<html>alive</html>")],
        "url string, warc_ts timestamp, html binary",
    ).coalesce(1)
    out = str(tmp_path / "arch_crlf")
    os.makedirs(out, exist_ok=True)
    idx = write_warc_segments(df, out).collect()
    assert idx[0]["url"] == "https://x/a"  # index == archive header
    back = read_warc_segments(spark, out).collect()
    assert {r.url: bytes(r.html) for r in back} == {
        "https://x/a": b"<html>alive</html>"
    }

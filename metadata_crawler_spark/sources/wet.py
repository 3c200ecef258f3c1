"""WET / WAT derivation: the Common Crawl sidecar formats.

Common Crawl ships three artifacts per segment: the raw ``.warc.gz``
(response records), the ``.warc.wet.gz`` (WARC *conversion* records whose
payload is the extracted plain text) and the ``.warc.wat.gz`` (WARC
*metadata* records whose payload is a JSON envelope of head metadata and
outlinks). This module closes that loop for the engine: pages read from
WARC segments (sources/warc.py) flow through the SAME extraction operators
the crawl loop uses (functions/text.py — one implementation, no fork) and
are re-serialized as range-readable member-gzip WET/WAT segments.

Spark shape:

- derivation is columnar: extract_text / outlinks / meta-lang are the
  existing Arrow-batched UDFs; the JSON envelope is built with
  ``F.to_json(F.struct(...))`` JVM-side — no new Python in the hot path.
- writing is one ``mapInPandas`` pass: each task streams its partition
  into ONE ``part-<pid>.warc.{wet,wat}.gz`` (each record its own gzip
  member, exactly like the Common Crawl layout, so a future CDX index can
  range-read single records), then yields a one-row manifest. Task retries
  rewrite the same deterministic path — idempotent like the round-loop
  sinks. Nothing is collected to the driver.

Reference analog: stage-2 catalogue write (api/stores/jsonlines.py
write path) — same "derive then persist per batch" shape, WARC-framed.
"""

from __future__ import annotations

import gzip
import os
from datetime import datetime
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    extract_meta_lang_udf,
    extract_outlinks_udf,
    extract_text_udf,
)

WET_SCHEMA = "url string, warc_ts timestamp, wet_text string, segment string"
WAT_SCHEMA = "url string, warc_ts timestamp, wat_json string, segment string"
MANIFEST_SCHEMA = "path string, n_records long, n_bytes long"

_TYPE_OF = {"wet": "conversion", "wat": "metadata"}


def wet_from_pages(pages: DataFrame) -> DataFrame:
    """(url, warc_ts, html, segment) -> WET rows: extracted plain text."""
    return pages.select(
        "url",
        "warc_ts",
        extract_text_udf(F.col("html")).alias("wet_text"),
        "segment",
    )


def wat_from_pages(pages: DataFrame) -> DataFrame:
    """(url, warc_ts, html, segment) -> WAT rows: JSON metadata envelope
    (title, meta language, content length, outlink list + count) built
    JVM-side with to_json over the UDF-extracted fields."""
    title = F.regexp_extract(
        F.col("html").cast("string"), r"(?i)<title[^>]*>([^<]*)</title>", 1
    )
    links = extract_outlinks_udf(F.col("html"))
    envelope = F.to_json(
        F.struct(
            F.col("url").alias("target_uri"),
            F.trim(title).alias("title"),
            extract_meta_lang_udf(F.col("html")).alias("meta_lang"),
            F.length(F.col("html")).cast("long").alias("content_length"),
            F.size(links).alias("n_links"),
            links.alias("links"),
        )
    )
    return pages.select(
        "url", "warc_ts", envelope.alias("wat_json"), "segment"
    )


def render_derivative_record(
    url: str, ts: datetime, payload: bytes, warc_type: str
) -> bytes:
    """One WARC/1.0 conversion/metadata record (no HTTP wrapper — WET/WAT
    payloads are the bare converted content, per the CC layout)."""
    hdr = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode()
    return hdr + payload + b"\r\n\r\n"


def write_derivative_segments(
    df: DataFrame, out_dir: str, kind: str, payload_col: str | None = None
) -> DataFrame:
    """Serialize WET/WAT rows to ``<out_dir>/part-<pid>.warc.<kind>.gz``
    (member-gzip per record). Returns the manifest DataFrame (path,
    n_records, n_bytes) — one row per written file. The write happens on
    executors inside mapInPandas; the manifest is the only thing small
    enough to ever collect."""
    if kind not in _TYPE_OF:
        raise ValueError(f"kind must be one of {sorted(_TYPE_OF)}: {kind!r}")
    warc_type = _TYPE_OF[kind]
    col = payload_col or ("wet_text" if kind == "wet" else "wat_json")
    os.makedirs(out_dir, exist_ok=True)

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        from .warc import _open_out

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.{kind}.gz")
        n = 0
        n_bytes = 0
        # stream members to the atomic-publish stream (tmp+rename local,
        # pyarrow.fs for object stores — the WARC sink's contract):
        # peak memory = one record. Opened LAZILY on the first record so
        # an empty partition never creates (let alone publishes) a
        # zero-byte segment, and finalized ONLY on success — an
        # exception routes through abort() so a failed task never
        # publishes its partial segment under the final name.
        epoch = datetime(1970, 1, 1)
        fh = finalize = abort = None
        try:
            for pdf in batches:
                for url, ts, payload in zip(
                    pdf["url"], pdf["warc_ts"], pdf[col]
                ):
                    if fh is None:
                        fh, finalize, abort = _open_out(path)
                    rec = render_derivative_record(
                        str(url),
                        # NULL/NaT ts: epoch sentinel, not a crash (same
                        # rule as the WARC sink)
                        epoch if pd.isna(ts) else ts.to_pydatetime(),
                        ("" if payload is None else str(payload)).encode(),
                        warc_type,
                    )
                    member = gzip.compress(rec)
                    fh.write(member)
                    n += 1
                    n_bytes += len(member)
        except BaseException:
            if abort is not None:
                abort()
            raise
        if fh is None:  # empty partition: no file, no manifest row
            return
        finalize()
        yield pd.DataFrame(
            {"path": [path], "n_records": [n], "n_bytes": [n_bytes]}
        )

    return df.mapInPandas(write_part, MANIFEST_SCHEMA)


def write_wet(pages: DataFrame, out_dir: str) -> DataFrame:
    """pages -> WET segments in one pass; returns the manifest."""
    return write_derivative_segments(wet_from_pages(pages), out_dir, "wet")


def write_wat(pages: DataFrame, out_dir: str) -> DataFrame:
    """pages -> WAT segments in one pass; returns the manifest."""
    return write_derivative_segments(wat_from_pages(pages), out_dir, "wat")


def read_wet(spark, path_glob: str) -> DataFrame:
    """Read WET segments back to (url, warc_ts, wet_text, segment) — the
    same path-pruned binaryFile scan + incremental parse as the WARC
    reader, accepting conversion records."""
    return _read_derivatives(spark, path_glob, "wet")


def read_wat(spark, path_glob: str) -> DataFrame:
    return _read_derivatives(spark, path_glob, "wat")


def _read_derivatives(spark, path_glob: str, kind: str) -> DataFrame:
    from .warc import _open_uri, parse_warc_stream

    warc_type = _TYPE_OF[kind]
    out_col = "wet_text" if kind == "wet" else "wat_json"
    schema = WET_SCHEMA if kind == "wet" else WAT_SCHEMA
    paths = spark.read.format("binaryFile").load(path_glob).select("path")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Yield in bounded chunks off the streaming parser: buffering a
        # whole segment's rows first would hold the ENTIRE decompressed
        # segment (hundreds of MB for a Common Crawl WET file) in one
        # task and defeat parse_warc_stream's one-record memory bound.
        chunk_rows = 2_000
        cols = ["url", "warc_ts", out_col, "segment"]
        for pdf in batches:
            for uri in pdf["path"]:
                fh = _open_uri(uri)  # _open_uri already handles .gz
                try:
                    rows: list[tuple] = []
                    for url, ts, payload, seg in parse_warc_stream(
                        fh, os.path.basename(uri), accept_types=(warc_type,)
                    ):
                        rows.append(
                            (url, ts, payload.decode("utf-8", "replace"), seg)
                        )
                        if len(rows) >= chunk_rows:
                            yield pd.DataFrame(rows, columns=cols)
                            rows = []
                    if rows:
                        yield pd.DataFrame(rows, columns=cols)
                finally:
                    fh.close()

    return paths.mapInPandas(parse, schema)

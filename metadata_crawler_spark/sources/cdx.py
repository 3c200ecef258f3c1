"""Common Crawl CDXJ index source.

Common Crawl publishes a per-crawl URL index (cc-index) in CDXJ form —
one line per capture: ``<SURT urlkey> <14-digit timestamp> <JSON>`` with
the JSON carrying the original url, mime, HTTP status, content digest
and the WARC (filename, offset, length) needed to range-read exactly one
record. Real pipelines plan fetches from this index instead of scanning
whole WARC segments; this reader turns the index into a typed table the
frontier/scheduler operators consume directly.

Reference parity: stage-2 catalogue read — a line-oriented typed record
stream (api/stores/jsonlines.py:154-196); the CDXJ flavor is ours.

Spark shape: ``spark.read.text`` (transparently gzip per file, the
format CC ships), ONE regexp split + ONE codegen'd ``from_json`` — all
JVM, no UDF. Malformed lines yield NULL urls and are dropped (bad index
lines are data, not task failures); pass ``keep_malformed=True`` to
inspect them instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the JSON payload fields CC's cc-index writes (all strings on disk)
CDXJ_JSON_SCHEMA = (
    "url string, mime string, `mime-detected` string, status string, "
    "digest string, length string, offset string, filename string, "
    "languages string, encoding string, redirect string"
)

#: one line: SURT urlkey, 14-digit timestamp, JSON blob
_CDXJ_RE = r"^(\S+) (\d{14}) (\{.*\})\s*$"


def read_cdxj(
    spark: SparkSession,
    path: str,
    keep_malformed: bool = False,
) -> DataFrame:
    """Directory/glob of ``*.cdx(j)[.gz]`` index files -> typed capture
    table: (urlkey, capture_ts, url, mime, status, digest, warc_filename,
    warc_offset, warc_length, languages).

    ``warc_offset``/``warc_length`` locate the single WARC record for a
    range read; ``digest`` is CC's content hash (usable as an exact-dedup
    key BEFORE fetching anything)."""
    lines = spark.read.text(path)
    # try_to_timestamp / try_cast throughout: under Spark 4's default
    # ANSI mode a plain to_timestamp('') or a non-numeric cast THROWS —
    # one garbage line in a billions-line cc-index scan would kill the
    # whole read; bad index lines are data, not task failures (the
    # sitemaps.py convention)
    parsed = lines.select(
        F.regexp_extract("value", _CDXJ_RE, 1).alias("urlkey"),
        F.try_to_timestamp(
            F.regexp_extract("value", _CDXJ_RE, 2),
            F.lit("yyyyMMddHHmmss"),
        ).alias("capture_ts"),
        F.from_json(F.regexp_extract("value", _CDXJ_RE, 3), CDXJ_JSON_SCHEMA)
        .alias("j"),
        F.col("value"),
    ).select(
        "urlkey",
        "capture_ts",
        F.col("j.url").alias("url"),
        F.coalesce(
            F.col("j").getField("mime-detected"), F.col("j.mime")
        ).alias("mime"),
        F.col("j.status").try_cast("int").alias("status"),
        F.col("j.digest").alias("digest"),
        F.col("j.filename").alias("warc_filename"),
        F.col("j.offset").try_cast("long").alias("warc_offset"),
        F.col("j.length").try_cast("long").alias("warc_length"),
        F.col("j.languages").alias("languages"),
        "value",
    )
    if keep_malformed:
        # keep the offending line text — the whole point of the flag is
        # inspecting what the bad lines contained
        return parsed.withColumnRenamed("value", "raw_line")
    return parsed.where(F.col("url").isNotNull()).drop("value")


def surt_key_expr(url):
    """SURT urlkey for a canonical URL — the key cc-index lines carry —
    as pure JVM expressions, so an engine frontier equi-joins against
    the CC index on its native key (no re-canonicalizing CC's billions
    of lines through our URL tier).

    Shape: ``com,example,sub)/path?query`` — host lowercased, label
    order reversed, leading ``www.`` dropped, scheme and default ports
    gone, path kept (lowercased, as cc-index does), query params SORTED
    alphabetically (the surt library behavior cc-index keys are built
    with — without the sort, every multi-param URL whose args are not
    already alphabetical would silently miss the equi-join). A
    NON-default port survives canonicalization and is kept the way SURT
    keeps it — ``com,example:8080)/x`` — dropping it would both miss
    the real captures and equi-join the port-less host's captures.
    This targets canonical http(s) URLs (feed it the output of the
    canonicalize tier); exotic userinfo forms should be canonicalized
    first.
    """
    url = F.col(url) if isinstance(url, str) else url
    host = F.lower(
        F.regexp_extract(url, r"^[a-z][a-z0-9+.\-]*://(?:[^@/]*@)?([^:/?#]+)", 1)
    )
    port = F.regexp_extract(
        url, r"^[a-z][a-z0-9+.\-]*://(?:[^@/]*@)?[^:/?#]+:(\d+)", 1
    )
    host = F.regexp_replace(host, r"^www\.", "")
    rev_host = F.concat_ws(
        ",", F.reverse(F.split(host, r"\."))
    )
    rev_host = F.when(
        port != "", F.concat(rev_host, F.lit(":"), port)
    ).otherwise(rev_host)
    rest = F.lower(
        F.regexp_replace(
            F.regexp_extract(url, r"^[a-z][a-z0-9+.\-]*://[^/?#]*([^#]*)", 1),
            r"^$", "/",
        )
    )
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    path_q = F.when(
        rest.contains("?"),
        F.concat(
            path,
            F.lit("?"),
            F.array_join(F.array_sort(F.split(query, "&")), "&"),
        ),
    ).otherwise(rest)
    return F.concat(rev_host, F.lit(")"), path_q)


def render_cdxj(rows) -> str:
    """Fixture-side writer: (urlkey, ts14, dict) tuples -> CDXJ text
    (like render_warc — the reader must round-trip it)."""
    import json

    return "\n".join(
        f"{urlkey} {ts14} {json.dumps(payload, separators=(', ', ': '))}"
        for urlkey, ts14, payload in rows
    ) + "\n"


def cdx_frontier(
    captures: DataFrame,
    statuses: tuple[int, ...] = (200,),
    mime_prefixes: tuple[str, ...] = ("text/html",),
) -> DataFrame:
    """Index-planned frontier: newest OK capture per url, scored flat —
    the standard 'crawl what the index says exists' seed set. Keeps the
    WARC coordinates so the fetch stage can range-read instead of
    re-crawling."""
    from functools import reduce
    from operator import or_

    # seed with False so mime_prefixes=() is a clear no-mime-passes
    # instead of an opaque reduce-of-empty TypeError
    mime_ok = reduce(
        or_,
        [F.col("mime").startswith(p) for p in mime_prefixes],
        F.lit(False),
    )
    ok = captures.where(
        F.col("status").isin(list(statuses))
        & F.coalesce(mime_ok, F.lit(False))
    )
    newest = ok.groupBy("url").agg(
        F.max(
            F.struct("capture_ts", "digest", "warc_filename",
                     "warc_offset", "warc_length")
        ).alias("m")
    )
    return newest.select(
        "url",
        F.lit(0).alias("depth"),
        F.lit(1.0).alias("score"),
        F.col("m.capture_ts").alias("capture_ts"),
        F.col("m.digest").alias("digest"),
        F.col("m.warc_filename").alias("warc_filename"),
        F.col("m.warc_offset").alias("warc_offset"),
        F.col("m.warc_length").alias("warc_length"),
    )
"""Structured page metadata: Open Graph / Twitter Card / standard <meta>
tags, <title>, canonical link, and JSON-LD blocks.

The reference's "global attrs" stage pulls typed document-level facets
out of opened objects (P6, api/config.py:367-458 attr rules over file
headers); a web page's equivalent typed header IS its metadata markup —
og:title/og:image/article:published_time power every serious crawl's
page card, and JSON-LD carries schema.org typed records. A training
pipeline also wants these (e.g. published_time for temporal slicing,
og:type for doc-class mixing).

All extraction is Arrow-batched vectorized pandas `.str` ops (no
per-row Python loops except the JSON-LD `json.loads`, which runs only on
the blocks that exist). Map-side only — pages never shuffle.

Surface:
- `extract_page_meta(df, html_col)` — appends a ``meta`` struct:
  title, canonical, and a `map<string,string>` of meta-tag name->content
  (og:/twitter:/article:/name= all folded in, FIRST occurrence wins —
  the de-facto crawler rule), plus published_time parsed to timestamp.
- `extract_jsonld_udf` — array of raw JSON-LD payload strings (validated
  JSON only), with `jsonld_types(df)` summarizing the @type values via
  Spark's own JSON machinery (from_json/get_json_object — JVM-side).
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from metadata_crawler_spark.functions.text import _decode

# property= (OG/article) and name= (twitter/standard) meta tags, both
# attribute orders (content before or after the name/property).
_META_PC = re.compile(
    r"""<meta\b[^>]*?(?:property|name)\s*=\s*["']([^"']+)["'][^>]*?"""
    r"""content\s*=\s*["']([^"']*)["'][^>]*>""",
    re.I | re.S,
)
_META_CP = re.compile(
    r"""<meta\b[^>]*?content\s*=\s*["']([^"']*)["'][^>]*?"""
    r"""(?:property|name)\s*=\s*["']([^"']+)["'][^>]*>""",
    re.I | re.S,
)
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.I | re.S)
_CANON_RE = re.compile(
    r"""<link\b[^>]*?rel\s*=\s*["']canonical["'][^>]*?href\s*=\s*["']([^"']+)["']""",
    re.I | re.S,
)
_JSONLD_RE = re.compile(
    r"""<script\b[^>]*type\s*=\s*["']application/ld\+json["'][^>]*>(.*?)</script>""",
    re.I | re.S,
)
_WS_RE = re.compile(r"\s+")

_META_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("canonical", T.StringType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)


@F.pandas_udf(_META_SCHEMA)
def extract_meta_udf(html: pd.Series) -> pd.DataFrame:
    s = _decode(html)
    titles, canons, tag_maps = [], [], []
    for doc in s:
        m = _TITLE_RE.search(doc)
        titles.append(_WS_RE.sub(" ", m.group(1)).strip() if m else None)
        c = _CANON_RE.search(doc)
        canons.append(c.group(1).strip() if c else None)
        tags: dict[str, str] = {}
        # FIRST occurrence in DOCUMENT order wins, across both attribute
        # orders: merging by match position (not pattern-by-pattern) keeps
        # the rule honest when a page mixes name-first and content-first
        # tags for the same key.
        occurrences = [
            (m.start(), m.group(1), m.group(2)) for m in _META_PC.finditer(doc)
        ] + [
            (m.start(), m.group(2), m.group(1)) for m in _META_CP.finditer(doc)
        ]
        for _, k, v in sorted(occurrences, key=lambda t: t[0]):
            tags.setdefault(k.strip().lower(), v.strip())
        tag_maps.append(tags)
    return pd.DataFrame({"title": titles, "canonical": canons, "tags": tag_maps})


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_jsonld_udf(html: pd.Series) -> pd.Series:
    def one(doc: str) -> list[str]:
        out = []
        for block in _JSONLD_RE.findall(doc):
            block = block.strip()
            try:
                json.loads(block)
            except Exception:
                continue  # malformed publisher markup is routine; skip
            out.append(block)
        return out

    return _decode(html).map(one)


def extract_page_meta(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Append ``meta`` (title/canonical/tags) and ``published_ts``
    (article:published_time parsed leniently — NULL when absent or
    unparseable). Map-side only."""
    out = df.withColumn("meta", extract_meta_udf(F.col(html_col)))
    return out.withColumn(
        "published_ts",
        F.try_to_timestamp(
            F.element_at(F.col("meta.tags"), "article:published_time")
        ),
    )


def jsonld_types(df: DataFrame, html_col: str = "html") -> DataFrame:
    """(type, n_docs) histogram of JSON-LD @type values across the corpus
    — the parse stays JVM-side (get_json_object over the extracted block
    strings); one partial-agg shuffle of (type, count) pairs."""
    blocks = df.select(
        F.explode(extract_jsonld_udf(F.col(html_col))).alias("b")
    )
    typed = blocks.select(
        F.coalesce(
            F.get_json_object("b", "$['@type']"),
            F.get_json_object("b", "$[0]['@type']"),
        ).alias("type")
    ).filter(F.col("type").isNotNull())
    return typed.groupBy("type").agg(F.count(F.lit(1)).alias("n_docs"))

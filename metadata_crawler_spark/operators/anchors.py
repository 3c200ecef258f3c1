"""Anchor-text extraction and the per-target anchor index.

Anchor text is the classic off-page relevance signal (how the web
describes a page, not how the page describes itself): search engines
index it, and webtext pipelines (e.g. WebText's karma-style selection)
use inlink counts + anchor language as quality features. The reference's
analog is the link-edge discovery feeding its frontier
(data_collector.py:192-230 children walk); here the edge also carries
the anchor's words.

Three pieces:

- **extract_anchors_udf**: `(href, anchor_text)` pairs from the raw HTML
  (Arrow-batched regex pass; nested markup inside <a> is stripped,
  whitespace collapsed).
- **resolve_href**: RFC 3986-ish reference resolution, TIERED like the
  P14 canonicalizer (functions/urls.py:74-206): absolute, protocol-
  relative, and root-relative hrefs — the overwhelming majority on real
  pages — resolve with pure JVM conditionals; ONLY the residual slice
  (dot-segments, sibling-relative, query-only) reaches the stdlib
  `urljoin` Pandas UDF, and the UDF input is NULLed for JVM-handled rows
  so Python work is proportional to the hard slice, not the corpus.
- **anchor_index**: per canonical target — inlink count, distinct source
  hosts, and the top-k anchor terms. All aggregations are partial-agg
  friendly (hot targets like home pages arrive map-side combined); the
  per-target term top-k uses a window over the (target)-partitioned
  term counts, so the whole index is 3 keyed shuffles of small rows —
  page bodies never move past the anchor explode.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from metadata_crawler_spark.functions.text import _decode
from metadata_crawler_spark.functions.urls import canonicalize_expr, host_expr

# the closing quote is a BACKREFERENCE to the opening one: closing on
# either quote char truncated double-quoted hrefs at the first
# apostrophe ("/obrien's-page" -> "/obrien")
_A_RE = re.compile(
    r"""<a\b[^>]*?href\s*=\s*(["'])([^#].*?)\1[^>]*>(.*?)</a>""",
    re.I | re.S,
)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")

_ANCHOR_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("href", T.StringType()),
            T.StructField("anchor", T.StringType()),
        ]
    )
)


@F.pandas_udf(_ANCHOR_TYPE)
def extract_anchors_udf(html: pd.Series) -> pd.Series:
    def one(doc: str) -> list[dict]:
        out = []
        for _q, href, inner in _A_RE.findall(doc):
            text = _WS_RE.sub(" ", _TAG_RE.sub(" ", inner)).strip()
            out.append({"href": href.strip(), "anchor": text})
        return out

    return _decode(html).map(one)


# scheme per RFC 3986: ALPHA *( ALPHA / DIGIT / "+" / "-" / "." ) then ":"
_ABS_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:"


@F.pandas_udf(T.StringType())
def _urljoin_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    # href is NULL for rows the JVM tiers already resolved — skip them.
    mask = href.notna() & base.notna()
    out = pd.Series([None] * len(base), dtype=object)
    out[mask] = [urljoin(b, h) for b, h in zip(base[mask], href[mask])]
    return out


def resolve_href(base: Column, href: Column) -> Column:
    """Absolute URL for ``href`` found on page ``base`` (both string
    columns). JVM tiers first; stdlib urljoin only for the hard slice."""
    scheme = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1)
    origin = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1)
    is_abs = href.rlike(_ABS_RE)
    is_proto_rel = href.startswith("//")
    is_root_rel = href.startswith("/") & ~is_proto_rel
    jvm_handled = is_abs | is_proto_rel | is_root_rel
    hard = F.when(~jvm_handled, href)  # NULL where JVM already resolved
    return (
        F.when(is_abs, href)
        .when(is_proto_rel, F.concat(scheme, F.lit(":"), href))
        .when(is_root_rel, F.concat(origin, href))
        .otherwise(_urljoin_udf(base, hard))
    )


def page_anchors(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src, src_host, target, anchor) — one row per link, targets
    resolved + canonicalized. Map-side only (explode off the scan)."""
    a = pages.select(
        F.col(url_col).alias("src"),
        F.explode(extract_anchors_udf(F.col(html_col))).alias("a"),
    )
    return a.select(
        "src",
        host_expr(F.col("src")).alias("src_host"),
        canonicalize_expr(resolve_href(F.col("src"), F.col("a.href"))).alias(
            "target"
        ),
        F.col("a.anchor").alias("anchor"),
    )


def anchor_index(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    top_terms: int = 5,
) -> DataFrame:
    """Per-target anchor summary: (target, n_inlinks, n_src_hosts,
    top_terms) — the anchor-text index. Deterministic top-k: term count
    DESC, term ASC."""
    # unresolvable links (NULL target) would both emit a bogus index
    # row and funnel the corpus-wide junk group through one window task
    anchors = page_anchors(pages, url_col, html_col).filter(
        F.col("target").isNotNull()
    )
    stats = anchors.groupBy("target").agg(
        F.count(F.lit(1)).alias("n_inlinks"),
        F.countDistinct("src_host").alias("n_src_hosts"),
    )
    terms = anchors.select(
        "target",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("anchor")), r"[^a-z0-9]+"),
                lambda t: t != "",
            )
        ).alias("term"),
    )
    tc = terms.groupBy("target", "term").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("target").orderBy(
        F.col("n").desc(), F.col("term").asc()
    )
    top = (
        tc.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= top_terms)
        .groupBy("target")
        .agg(F.array_sort(F.collect_list(F.struct("r", "term"))).alias("ts"))
        .select(
            "target",
            F.transform("ts", lambda s: s["term"]).alias("top_terms"),
        )
    )
    return stats.join(top, "target", "left").select(
        "target",
        "n_inlinks",
        "n_src_hosts",
        F.coalesce("top_terms", F.array().cast("array<string>")).alias(
            "top_terms"
        ),
    )

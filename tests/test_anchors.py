"""Anchor extraction + resolution + index (operators/anchors.py)."""

from pyspark.sql import functions as F

from metadata_crawler_spark.operators.anchors import (
    anchor_index,
    extract_anchors_udf,
    page_anchors,
    resolve_href,
)

PAGE_A = b"""
<html><body>
<a href="https://other.example.org/x">Absolute <b>link</b></a>
<a href="//cdn.example.net/lib.js">proto relative</a>
<a href="/about">Root Relative</a>
<a href="sub/page.html">sibling relative</a>
<a href="../up.html">dot dot</a>
<a href="?page=2">query only</a>
<a href="#frag">fragment only skipped</a>
<a href="/about">Root   Relative</a>
</body></html>
"""


def test_extract_anchors(spark):
    df = spark.createDataFrame([(1, PAGE_A)], "id long, html binary")
    rows = df.select(F.explode(extract_anchors_udf("html")).alias("a")).collect()
    pairs = [(r["a"]["href"], r["a"]["anchor"]) for r in rows]
    # fragment-only href is excluded by the extractor; nested tags stripped
    assert ("https://other.example.org/x", "Absolute link") in pairs
    assert ("/about", "Root Relative") in pairs
    assert len([p for p in pairs if p[0].startswith("#")]) == 0
    assert len(pairs) == 7


def test_resolve_href_tiers(spark):
    base = "https://www.example.com/a/b/page.html?q=1"
    cases = [
        ("https://abs.example.org/p", "https://abs.example.org/p"),
        ("//cdn.example.net/x", "https://cdn.example.net/x"),
        ("/rooted", "https://www.example.com/rooted"),
        ("sib.html", "https://www.example.com/a/b/sib.html"),
        ("../up.html", "https://www.example.com/a/up.html"),
        ("?page=2", "https://www.example.com/a/b/page.html?page=2"),
        ("mailto:x@example.com", "mailto:x@example.com"),
    ]
    df = spark.createDataFrame([(base, h) for h, _ in cases], "base string, href string")
    got = [
        r["out"]
        for r in df.select(
            resolve_href(F.col("base"), F.col("href")).alias("out")
        ).collect()
    ]
    assert got == [want for _, want in cases]


def test_resolve_href_python_slice_is_minimal(spark):
    """JVM-handled rows pass NULL to the urljoin UDF (work proportional
    to the hard slice): verified by the NULL-in/NULL-out contract."""
    from metadata_crawler_spark.operators.anchors import _urljoin_udf

    df = spark.createDataFrame(
        [("https://e.com/a/", None), (None, "x.html")], "base string, href string"
    )
    got = df.select(_urljoin_udf("base", "href").alias("o")).collect()
    assert [r["o"] for r in got] == [None, None]


def test_anchor_index(spark):
    pages = [
        ("https://a.example.com/", PAGE_A),
        ("https://b.example.org/", b'<a href="https://www.example.com/about">about page</a>'),
        ("https://c.example.net/", b'<a href="https://www.example.com/about">the about page</a>'),
    ]
    # PAGE_A's two /about links resolve against a.example.com, so the
    # cross-host target is the explicit one on b/c.
    df = spark.createDataFrame(pages, "url string, html binary")
    idx = {r["target"]: r for r in anchor_index(df).collect()}
    t = idx["https://www.example.com/about"]
    assert t["n_inlinks"] == 2 and t["n_src_hosts"] == 2
    assert t["top_terms"][:2] == ["about", "page"]  # count desc, term asc
    own = idx["https://a.example.com/about"]
    assert own["n_inlinks"] == 2 and own["n_src_hosts"] == 1
    assert own["top_terms"] == ["relative", "root"]


def test_anchor_index_plan_partial_agg(spark):
    df = spark.createDataFrame(
        [("https://a.example.com/", PAGE_A)], "url string, html binary"
    )
    plan = anchor_index(df)._jdf.queryExecution().executedPlan().toString()
    # counts are map-side combined before the target shuffle
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan


def test_page_anchors_null_html(spark):
    df = spark.createDataFrame(
        [("https://a.example.com/", None)], "url string, html binary"
    )
    assert page_anchors(df).count() == 0

"""Structured page metadata (functions/metadata.py): OG/Twitter/meta
tags both attribute orders, title/canonical, published-time parsing,
JSON-LD validation + @type histogram."""

from pyspark.sql import functions as F

from metadata_crawler_spark.functions.metadata import (
    extract_jsonld_udf,
    extract_page_meta,
    jsonld_types,
)

PAGE = b"""
<html><head>
<title>  The Example
  Article </title>
<link rel="canonical" href="https://www.example.com/article" />
<meta property="og:title" content="OG Example Article">
<meta content="summary_large_image" name="twitter:card">
<meta property="article:published_time" content="2026-03-01T12:30:00">
<meta name="description" content="A page about examples.">
<meta property="og:title" content="SECOND should not win">
<script type="application/ld+json">{"@type": "NewsArticle", "headline": "x"}</script>
<script type="application/ld+json">not valid json {{{</script>
<script type="application/ld+json">[{"@type": "BreadcrumbList"}]</script>
</head><body>hello</body></html>
"""


def test_extract_page_meta(spark):
    df = spark.createDataFrame([(1, PAGE), (2, b"<p>no meta</p>"), (3, None)],
                               "id long, html binary")
    rows = {r["id"]: r for r in extract_page_meta(df).collect()}
    m = rows[1]["meta"]
    assert m["title"] == "The Example Article"
    assert m["canonical"] == "https://www.example.com/article"
    assert m["tags"]["og:title"] == "OG Example Article"  # first wins
    assert m["tags"]["twitter:card"] == "summary_large_image"  # content-first order
    assert m["tags"]["description"] == "A page about examples."
    ts = rows[1]["published_ts"]
    assert ts is not None and ts.year == 2026 and ts.month == 3
    assert rows[2]["meta"]["title"] is None and rows[2]["published_ts"] is None
    assert rows[3]["meta"]["tags"] == {}


def test_jsonld_extraction_and_types(spark):
    df = spark.createDataFrame([(1, PAGE), (2, PAGE)], "id long, html binary")
    blocks = df.select(F.explode(extract_jsonld_udf("html")).alias("b")).collect()
    assert len(blocks) == 4  # 2 valid blocks x 2 docs; malformed skipped
    hist = {r["type"]: r["n_docs"] for r in jsonld_types(df).collect()}
    assert hist == {"NewsArticle": 2, "BreadcrumbList": 2}


def test_meta_plan_map_side_only(spark):
    df = spark.createDataFrame([(1, PAGE)], "id long, html binary")
    plan = extract_page_meta(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_meta_first_occurrence_wins_across_attr_orders(spark):
    """'First occurrence wins' must hold in DOCUMENT order even when the
    page mixes content-first and name-first attribute orders for the same
    key (pattern-by-pattern scanning would let the later name-first tag
    win)."""
    from pyspark.sql import functions as F

    from metadata_crawler_spark.functions.metadata import extract_meta_udf

    html = (
        b'<meta content="A" name="og:title">'
        b'<meta property="og:title" content="B">'
        b'<meta name="author" content="C">'
        b'<meta content="D" name="author">'
    )
    df = spark.createDataFrame([(html,)], "html binary")
    tags = df.select(extract_meta_udf(F.col("html")).alias("m")).first()["m"]["tags"]
    assert tags["og:title"] == "A"
    assert tags["author"] == "C"

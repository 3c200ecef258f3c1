"""Boilerplate removal (functions/boilerplate.py): block segmentation,
jusText rule attribution, neighbor smoothing, and the Spark UDF path."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from metadata_crawler_spark.functions.boilerplate import (
    _classify,
    _smooth,
    extract_main_py,
    with_main_content,
)

ARTICLE = (
    "This is the main article body and it talks at length about the "
    "subject of the page with plenty of the usual English stopwords in it."
)
ARTICLE2 = (
    "A second long paragraph that is also part of the content and has "
    "the kind of stopword density that a real written paragraph has."
)
NAVLIST = (
    '<ul><li><a href="/a">Home</a></li><li><a href="/b">Products</a></li>'
    '<li><a href="/c">About us</a></li><li><a href="/d">Contact</a></li></ul>'
)
PAGE = f"""
<html><head><title>t</title><script>var x = "the the the ignored";</script>
<style>p {{ color: red }}</style></head>
<body>
<nav>{NAVLIST}</nav>
<h2>Section heading</h2>
<p>{ARTICLE}</p>
<p>{ARTICLE2}</p>
<div>Copyright 2026 SomeCorp All Rights Reserved Terms Privacy Sitemap
Careers Press Investors Partners Legal Accessibility Cookies Settings</div>
<footer><a href="/x">Terms</a> <a href="/y">Privacy</a></footer>
</body></html>
"""


def test_extract_main_keeps_content_drops_chrome():
    main, n_blocks, n_good, frac = extract_main_py(PAGE)
    assert ARTICLE in main and ARTICLE2 in main
    assert "Home" not in main and "Privacy" not in main  # link lists gone
    assert "Copyright" not in main  # long but stopword-poor -> bad
    assert "ignored" not in main  # script subtree invisible
    assert 0.0 < frac < 1.0 and n_good < n_blocks


def test_heading_inherits_from_good_neighbor():
    # heading precedes a good paragraph -> kept by the smoothing pass
    main, *_ = extract_main_py(PAGE)
    assert "Section heading" in main
    # the same heading with only boilerplate around it is dropped
    lone = f"<nav>{NAVLIST}</nav><h2>Section heading</h2><footer>{NAVLIST}</footer>"
    main2, *_ = extract_main_py(lone)
    assert "Section heading" not in main2


def test_link_density_rule():
    linky = '<p><a href="/a">click here for more of the offers now</a> ok</p>'
    assert _classify([("click here for more of the offers now ok", 38)]) == ["bad"]
    main, *_ = extract_main_py(linky)
    assert main == ""


def test_smooth_scans_past_consecutive_shorts():
    assert _smooth(["good", "short", "short", "bad"]) == [
        "good",
        "good",
        "good",
        "bad",
    ]
    assert _smooth(["bad", "short", "bad"]) == ["bad", "bad", "bad"]


def test_degenerate_inputs():
    assert extract_main_py("") == ("", 0, 0, 0.0)
    assert extract_main_py("<p></p><div></div>") == ("", 0, 0, 0.0)
    # malformed markup salvages parsed prefix instead of raising
    main, n, _, _ = extract_main_py(f"<p>{ARTICLE}</p><x" + "<" * 50)
    assert ARTICLE in main


def test_spark_udf_matches_python_reference(spark):
    docs = [
        (1, PAGE.encode()),
        (2, f"<p>{ARTICLE}</p>".encode()),
        (3, None),
        (4, b"<nav>" + NAVLIST.encode() + b"</nav>"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, html binary")
    out = {
        r["doc_id"]: r["main"]
        for r in with_main_content(df, "html").select("doc_id", "main").collect()
    }
    for i, h in docs:
        want = extract_main_py(h if h is not None else "")
        got = out[i]
        assert (
            got["main_text"],
            got["n_blocks"],
            got["n_content_blocks"],
            got["boilerplate_frac"],
        ) == want
    # map-side only: no exchange anywhere in the plan
    plan = (
        with_main_content(df, "html")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan

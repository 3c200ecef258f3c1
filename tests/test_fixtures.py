"""Fixture generator invariants: determinism, schema, skew, dup rate."""

from __future__ import annotations

import numpy as np

from metadata_crawler_spark.functions.urls import canon_url_py
from metadata_crawler_spark.sources.fixtures import gen_fixtures


def test_deterministic():
    a = gen_fixtures(300)
    b = gen_fixtures(300)
    assert a["pages"]["url"].tolist() == b["pages"]["url"].tolist()
    assert a["pages"]["html"].tolist() == b["pages"]["html"].tolist()
    assert a["seeds"]["url"].tolist() == b["seeds"]["url"].tolist()


def test_shapes_and_skew():
    t = gen_fixtures(2000)
    pages, seeds, robots, hosts = t["pages"], t["seeds"], t["robots"], t["hosts"]
    assert list(pages.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert len(pages) == 2000
    canon = pages["url"].map(canon_url_py)
    host = canon.str.extract(r"://([^/:]+)")[0]
    top_share = host.value_counts(normalize=True).iloc[0]
    assert top_share > 0.10  # hot-host skew present
    # ~2% duplicates modulo canonicalization
    dup_rate = 1 - canon.nunique() / len(canon)
    assert 0.005 < dup_rate < 0.06
    assert (seeds["depth"] == 0).all()
    assert set(robots["crawl_delay_ms"]).issubset({0, 100, 500, 1000})
    assert set(hosts["budget"]).issubset({2, 8, 32})
    # ~10% of hosts deny everything
    deny_all = robots["disallow"].map(lambda d: list(d) == ["/"]).mean()
    assert 0.02 < deny_all < 0.25


def test_text_is_extraction_oracle():
    t = gen_fixtures(100)
    from metadata_crawler_spark.functions.text import extract_text_py

    for _, row in t["pages"].iterrows():
        assert extract_text_py(row["html"]) == row["text"]


def test_warc_ts_deterministic_per_url():
    t = gen_fixtures(150)
    p = t["pages"]
    m = p.groupby("url")["warc_ts"].nunique()
    assert (m == 1).all()
    assert np.issubdtype(p["warc_ts"].dtype, np.datetime64)

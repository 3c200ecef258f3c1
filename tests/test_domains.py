"""Public-suffix registered-domain extraction (functions/domains.py).

Reference analog: per-root grouping of harvest paths
(/root/reference/src/metadata_crawler/api/config.py:303-359); our crawl
analog keys politeness/budget on the REGISTRABLE domain per the PSL
algorithm (longest rule, wildcards, exceptions, implicit ``*``)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from metadata_crawler_spark.functions.domains import (
    compile_rules,
    py_public_suffix,
    py_registered_domain,
    registered_domain_join,
    suffix_table,
    with_registered_domain,
)

# host -> (public suffix, registered domain) with the BUILTIN rule subset
PSL_CASES = {
    "www.bbc.co.uk": ("co.uk", "bbc.co.uk"),
    "news.images.bbc.co.uk": ("co.uk", "bbc.co.uk"),
    "bbc.co.uk": ("co.uk", "bbc.co.uk"),
    "co.uk": ("co.uk", None),
    "uk": ("uk", None),
    "example.com": ("com", "example.com"),
    "a.b.example.com": ("com", "example.com"),
    "com": ("com", None),
    # unknown TLD -> implicit "*" default rule
    "foo.unknowntld": ("unknowntld", "foo.unknowntld"),
    "a.foo.unknowntld": ("unknowntld", "foo.unknowntld"),
    # private registries: each user site is its own registrable domain
    "foo.github.io": ("github.io", "foo.github.io"),
    "a.foo.github.io": ("github.io", "foo.github.io"),
    "github.io": ("github.io", None),
    "b.blogspot.com": ("blogspot.com", "b.blogspot.com"),
    "blogspot.com": ("blogspot.com", None),
    "bucket.s3.amazonaws.com": ("s3.amazonaws.com", "bucket.s3.amazonaws.com"),
    "s3.amazonaws.com": ("s3.amazonaws.com", None),
    # wildcard family *.ck and its !www.ck exception (PSL spec examples)
    "foo.ck": ("foo.ck", None),
    "a.foo.ck": ("foo.ck", "a.foo.ck"),
    "www.ck": ("ck", "www.ck"),
    "b.www.ck": ("ck", "www.ck"),
    "city.kawasaki.jp": ("kawasaki.jp", "city.kawasaki.jp"),
    "x.city.kawasaki.jp": ("kawasaki.jp", "city.kawasaki.jp"),
    "y.kawasaki.jp": ("y.kawasaki.jp", None),
    "z.y.kawasaki.jp": ("y.kawasaki.jp", "z.y.kawasaki.jp"),
    # invalid / excluded shapes
    "192.168.0.1": (None, None),
    "single": ("single", None),
    "": (None, None),
    "weird..dots": (None, None),
    # case / trailing-dot normalization
    "Example.COM.": ("com", "example.com"),
    "xn--bcher-kva.de": ("de", "xn--bcher-kva.de"),
}


@pytest.mark.parametrize("host,want", sorted(PSL_CASES.items()))
def test_py_psl_algorithm(host, want):
    assert py_public_suffix(host) == want[0]
    assert py_registered_domain(host) == want[1]


def test_py_none_and_comment_rules():
    assert py_registered_domain(None) is None
    compiled = compile_rules(
        ["// a comment", "", "co.uk", "*.ck", "!www.ck"]
    )
    assert py_registered_domain("a.co.uk", compiled) == "a.co.uk"
    assert py_registered_domain("x.y.ck", compiled) == "x.y.ck"
    assert py_registered_domain("b.www.ck", compiled) == "www.ck"


def test_tiered_matches_py_on_probe_set(spark):
    hosts = [h for h in PSL_CASES if h]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: r["reg_domain"]
        for r in with_registered_domain(df, host_col="host").collect()
    }
    for h in hosts:
        assert got[h] == py_registered_domain(h), h


def test_tiered_from_url_and_zero_shuffle(spark):
    df = spark.createDataFrame(
        [
            (1, "https://WWW.BBC.co.uk:443/news?x=1"),
            (2, "http://a.blogspot.com/post"),
            (3, "https://deep.a.b.example.com/"),
            (4, None),
        ],
        "id long, url string",
    )
    out = with_registered_domain(df, url_col="url")
    rows = {r["id"]: r["reg_domain"] for r in out.collect()}
    assert rows == {
        1: "bbc.co.uk",
        2: "a.blogspot.com",
        3: "example.com",
        4: None,
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"\bExchange ", plan), plan


def test_join_variant_matches_py_on_plain_rules(spark):
    # join variant handles plain rules + the implicit default only
    hosts = [
        h
        for h, (ps, _) in PSL_CASES.items()
        if h and ps is not None and not h.rstrip(".").endswith(("ck", "kawasaki.jp"))
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: r["reg_domain"]
        for r in registered_domain_join(
            df, suffix_table(spark), host_col="host"
        ).collect()
    }
    for h in hosts:
        assert got[h] == py_registered_domain(h), h


def test_join_variant_on_fixture_pages(spark, tables):
    """End-to-end over the fixture corpus: join variant == tiered UDF
    (fixture hosts are all plain/default shapes)."""
    pages = tables["pages"].select("url").limit(400)
    a = with_registered_domain(pages, url_col="url").collect()
    b = registered_domain_join(pages, suffix_table(spark), url_col="url").collect()
    am = {r["url"]: r["reg_domain"] for r in a}
    bm = {r["url"]: r["reg_domain"] for r in b}
    assert am == bm
    # sanity: the fixture corpus actually produced domains
    assert sum(v is not None for v in am.values()) > 300


def test_site_politeness_serializes_subdomains(spark):
    """schedule_round(site_politeness=True): offsets accumulate across
    ALL subdomains of one registrable domain (running sum of prior
    delays), while per-host mode restarts at 0 per host."""
    from metadata_crawler_spark.operators.frontier import schedule_round

    frontier = spark.createDataFrame(
        [
            (f"https://{sub}.bbc.co.uk/p{i}", 0, 0.5)
            for sub in ("www", "news")
            for i in range(3)
        ]
        + [("https://other.example.com/x", 0, 0.9)],
        "url string, depth int, score double",
    )
    hosts = spark.createDataFrame([], "host string, budget int")
    robots = spark.createDataFrame(
        [
            ("www.bbc.co.uk", [], 100),
            ("news.bbc.co.uk", [], 250),
            ("other.example.com", [], 50),
        ],
        "host string, disallow array<string>, crawl_delay_ms long",
    )
    out = schedule_round(
        frontier, hosts, robots, default_budget=10, site_politeness=True
    ).collect()
    by_site = {}
    for r in out:
        by_site.setdefault(r["site"], []).append(r)
    assert set(by_site) == {"bbc.co.uk", "example.com"}
    # order within the site: (depth, -score, url) -> all news.* before
    # www.*; the offset is the running sum of PRIOR rows' own delays
    bbc = sorted(by_site["bbc.co.uk"], key=lambda r: r["fetch_offset_ms"])
    assert [r["url"].split("/")[2].split(".")[0] for r in bbc] == [
        "news", "news", "news", "www", "www", "www",
    ]
    assert [r["fetch_offset_ms"] for r in bbc] == [0, 250, 500, 750, 850, 950]
    # the other site starts at 0 independently
    assert by_site["example.com"][0]["fetch_offset_ms"] == 0
    # per-host mode unchanged: each host restarts at 0
    per_host = schedule_round(
        frontier, hosts, robots, default_budget=10
    ).collect()
    zero_offsets = [r for r in per_host if r["fetch_offset_ms"] == 0]
    assert len(zero_offsets) == 3  # www, news, other each rank-1 at 0


def test_tier_consistency_on_malformed_hosts(spark):
    """Review fix: both tiers share py_registered_domain's normalization
    sequence (strip whitespace, then dots) — a leading-dot host resolves
    identically whether or not its TLD is in the trigger set."""
    hosts = [
        ".a.github.io", ".a.example.com", " b.example.com ",
        "c.example.com.", " .d.example.com", "e.co.uk.",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: r["reg_domain"]
        for r in with_registered_domain(df, host_col="host").collect()
    }
    for h in hosts:
        assert got[h] == py_registered_domain(h), h
    assert got[".a.github.io"] == "a.github.io"
    assert got[".a.example.com"] == "example.com"


def test_trigger_sets_skip_single_label_plain_rules():
    """Review fix: a full-PSL config (every TLD as a 1-label plain rule)
    must NOT route every row to the Python tier — 1-label plain rules
    equal the implicit default; wildcards/exceptions stay hard."""
    from metadata_crawler_spark.functions.domains import _trigger_sets

    compiled = compile_rules(["com", "org", "uk", "co.uk", "*.ck", "!www.ck"])
    t1, t2 = _trigger_sets(compiled)
    assert t1 == {"ck"}
    assert t2 == {"co.uk", "www.ck"}


def test_crawl_loop_site_politeness(spark, fixture_dir, tables, tmp_path_factory):
    """CrawlConfig(site_politeness=True): the loop runs end-to-end and
    every round's offsets are non-decreasing running sums within each
    registrable domain (fixture hosts are distinct example domains, so
    site == per-host grouping there — the invariant still must hold)."""
    import os

    from metadata_crawler_spark.plans.round_loop import CrawlConfig, Crawler

    ckpt = str(tmp_path_factory.mktemp("ckpt_site"))
    crawler = Crawler(
        spark=spark,
        pages_path=os.path.join(fixture_dir, "pages.parquet"),
        robots=tables["robots"],
        hosts=tables["hosts"],
        checkpoint_dir=ckpt,
        config=CrawlConfig(
            n_shards=8, bloom_expected_per_shard=4096, salt_parts=4,
            site_politeness=True,
        ),
    )
    results = crawler.run(tables["seeds"], rounds=2)
    assert results[0]["scheduled"] > 0
    sched = spark.read.parquet(
        os.path.join(ckpt, "round=00000", "scheduled")
    )
    from metadata_crawler_spark.functions.domains import py_registered_domain

    rows = sched.select("url", "host", "rank", "crawl_delay_ms",
                        "fetch_offset_ms").collect()
    by_site: dict = {}
    for r in rows:
        site = py_registered_domain(r["host"]) or r["host"]
        by_site.setdefault(site, []).append(r)
    for site, rs in by_site.items():
        rs = sorted(rs, key=lambda r: r["fetch_offset_ms"])
        # offsets = running sum of prior delays within the site
        acc = 0
        # reconstruct schedule order (depth missing here; offsets being a
        # valid running sum of the delays in SOME order is the invariant)
        total = sum(r["crawl_delay_ms"] for r in rs) - (
            rs[-1]["crawl_delay_ms"] if rs else 0
        )
        assert rs[0]["fetch_offset_ms"] == 0
        assert rs[-1]["fetch_offset_ms"] <= total or len(rs) == 1
        del acc

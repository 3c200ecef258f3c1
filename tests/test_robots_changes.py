"""robots.txt parsing goldens + change-detection classification."""

from __future__ import annotations

import pyspark.sql.functions as F

from metadata_crawler_spark.functions.robots import (
    parse_robots_txt,
    render_robots_txt,
    robots_table,
)
from metadata_crawler_spark.operators.changes import change_stats, detect_changes
from metadata_crawler_spark.operators.frontier import apply_robots, with_host


def test_parse_robots_golden():
    body = """# comment
User-agent: GoogleBot
Disallow: /google-only

User-agent: *
Disallow: /private
Disallow: /tmp/   # trailing comment
Crawl-delay: 1.5

User-agent: OtherBot
Disallow: /
"""
    dis, delay = parse_robots_txt(body)
    assert dis == ["/private", "/tmp/"]
    assert delay == 1500


def test_parse_empty_and_allow_all():
    assert parse_robots_txt("") == ([], 0)
    assert parse_robots_txt("User-agent: *\nDisallow:") == ([], 0)
    assert parse_robots_txt("garbage without colons\n???") == ([], 0)


def test_render_parse_roundtrip():
    for dis, delay in ([["/a", "/b/c"], 500], [[], 0], [["/"], 2000]):
        body = render_robots_txt(dis, delay)
        got_dis, got_delay = parse_robots_txt(body)
        assert got_dis == dis
        assert got_delay == delay


def test_robots_table_feeds_scheduler(spark):
    rows = [
        ("a.com", render_robots_txt(["/private"], 100).encode()),
        ("b.com", render_robots_txt(["/"], 0).encode()),
        ("c.com", render_robots_txt([], 0).encode()),
    ]
    pages = spark.createDataFrame(rows, "host string, robots_txt binary")
    rules = robots_table(pages)
    got = {r.host: (list(r.disallow), r.crawl_delay_ms) for r in rules.collect()}
    assert got == {
        "a.com": (["/private"], 100),
        "b.com": (["/"], 0),
        "c.com": ([], 0),
    }
    frontier = with_host(
        spark.createDataFrame(
            [
                ("https://a.com/private/x", 0, 1.0),
                ("https://a.com/ok", 0, 1.0),
                ("https://b.com/x", 0, 1.0),
                ("https://c.com/y", 0, 1.0),
            ],
            "url string, depth int, score double",
        )
    )
    kept = sorted(r.url for r in apply_robots(frontier, rules).collect())
    assert kept == ["https://a.com/ok", "https://c.com/y"]


def test_detect_changes(spark):
    old = spark.createDataFrame(
        [("u1", "same"), ("u2", "before"), ("u3", "gone-soon")],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("u1", "same"), ("u2", "after"), ("u4", "brand new")],
        "url string, text string",
    )
    ch = {r.url: r.status for r in detect_changes(old, new).collect()}
    assert ch == {"u1": "unchanged", "u2": "changed", "u3": "gone", "u4": "new"}
    stats = {r.status: r.n_urls for r in change_stats(detect_changes(old, new)).collect()}
    assert stats == {"unchanged": 1, "changed": 1, "gone": 1, "new": 1}

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
    allow, dis, delay = parse_robots_txt(body)
    assert allow == []
    assert dis == ["/private", "/tmp/"]
    assert delay == 1500


def test_parse_empty_and_allow_all():
    assert parse_robots_txt("") == ([], [], 0)
    assert parse_robots_txt("User-agent: *\nDisallow:") == ([], [], 0)
    assert parse_robots_txt("garbage without colons\n???") == ([], [], 0)


def test_parse_allow_directive():
    body = "User-agent: *\nAllow: /public/\nDisallow: /\nCrawl-delay: 2"
    assert parse_robots_txt(body) == (["/public/"], ["/"], 2000)


def test_parse_multi_agent_group_run():
    # consecutive UA lines share ONE rule block (RFC 9309): the '*' token
    # inside the run makes the whole block apply to us
    body = "User-agent: *\nUser-agent: somebot\nDisallow: /x\n"
    assert parse_robots_txt(body) == ([], ["/x"], 0)
    # reversed order inside the run must behave identically
    body2 = "User-agent: somebot\nUser-agent: *\nDisallow: /x\n"
    assert parse_robots_txt(body2) == ([], ["/x"], 0)


def test_parse_specific_agent_precedence():
    body = (
        "User-agent: *\nDisallow: /everyone\n\n"
        "User-agent: mcsbot\nDisallow: /just-us\nCrawl-delay: 3\n"
    )
    # the specific group REPLACES the * group for our agent
    assert parse_robots_txt(body, agent="mcsbot") == ([], ["/just-us"], 3000)
    # other agents fall back to *
    assert parse_robots_txt(body, agent="strangerbot") == ([], ["/everyone"], 0)
    # token-prefix match: 'mcsbot/1.2' still selects the mcsbot group
    assert parse_robots_txt(body, agent="mcsbot/1.2") == ([], ["/just-us"], 3000)


def test_parse_same_token_groups_merge():
    body = "User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\n"
    assert parse_robots_txt(body) == ([], ["/a", "/b"], 0)


def test_parse_rules_before_any_agent_ignored():
    assert parse_robots_txt("Disallow: /x\nUser-agent: *\nDisallow: /y\n") == (
        [], ["/y"], 0
    )


def test_render_parse_roundtrip():
    for dis, delay, allow in (
        [["/a", "/b/c"], 500, []],
        [[], 0, []],
        [["/"], 2000, ["/public/"]],
    ):
        body = render_robots_txt(dis, delay, allow=allow)
        got_allow, got_dis, got_delay = parse_robots_txt(body)
        assert got_dis == dis
        assert got_allow == allow
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


def test_apply_robots_allow_longest_match(spark):
    # Allow overrides Disallow when its pattern is longer (RFC 9309
    # longest-match); allow wins exact-length ties
    robots = spark.createDataFrame(
        [("a.com", ["/public/"], ["/"], 0), ("t.com", ["/p"], ["/p"], 0)],
        "host string, allow array<string>, disallow array<string>, "
        "crawl_delay_ms long",
    )
    frontier = with_host(
        spark.createDataFrame(
            [
                ("https://a.com/public/page", 0, 1.0),
                ("https://a.com/private/page", 0, 1.0),
                ("https://t.com/page", 0, 1.0),
            ],
            "url string, depth int, score double",
        )
    )
    kept = sorted(r.url for r in apply_robots(frontier, robots).collect())
    assert kept == ["https://a.com/public/page", "https://t.com/page"]


def test_apply_robots_wildcards(spark):
    robots = spark.createDataFrame(
        [("w.com", [], ["/*.pdf$", "/tmp*", "/exact$"], 0)],
        "host string, allow array<string>, disallow array<string>, "
        "crawl_delay_ms long",
    )
    urls = [
        ("https://w.com/docs/file.pdf", False),   # *.pdf$ matches
        ("https://w.com/docs/file.pdfx", True),   # $ anchors the end
        ("https://w.com/tmp/scratch", False),     # /tmp* prefix-with-star
        ("https://w.com/tmpfile", False),
        ("https://w.com/exact", False),           # anchored exact
        ("https://w.com/exactly", True),
        ("https://w.com/ok.html", True),
    ]
    frontier = with_host(
        spark.createDataFrame(
            [(u, 0, 1.0) for u, _ in urls], "url string, depth int, score double"
        )
    )
    kept = {r.url for r in apply_robots(frontier, robots).collect()}
    for u, want_kept in urls:
        assert (u in kept) == want_kept, u


def test_apply_robots_shuffle_switch_plan(spark):
    """broadcast=False must produce a non-broadcast join (the 10^8-host
    path); broadcast=True a BroadcastHashJoin."""
    robots = spark.createDataFrame(
        [("a.com", ["/x"], 10)],
        "host string, disallow array<string>, crawl_delay_ms long",
    )
    frontier = with_host(
        spark.createDataFrame(
            [("https://a.com/y", 0, 1.0)], "url string, depth int, score double"
        )
    )
    bcast_plan = apply_robots(frontier, robots, broadcast=True)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in bcast_plan
    shuf_plan = apply_robots(frontier, robots, broadcast=False)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in shuf_plan
    # same rows either way
    a = sorted(r.url for r in apply_robots(frontier, robots, broadcast=True).collect())
    b = sorted(r.url for r in apply_robots(frontier, robots, broadcast=False).collect())
    assert a == b == ["https://a.com/y"]


def test_parse_robots_udf_null_first_row(spark):
    """A batch whose FIRST robots body is NULL must still decode the rest
    (the old first-element sniff raised TypeError here)."""
    rows = [
        ("n.com", None),
        ("a.com", b"User-agent: *\nDisallow: /x\nCrawl-delay: 1\n"),
    ]
    pages = spark.createDataFrame(rows, "host string, robots_txt binary").coalesce(1)
    got = {r.host: (list(r.disallow), r.crawl_delay_ms) for r in robots_table(pages).collect()}
    assert got == {"n.com": ([], 0), "a.com": (["/x"], 1000)}


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


def test_estimate_change_rate_hand_computed(spark):
    import math
    from datetime import datetime, timedelta

    from metadata_crawler_spark.operators.changes import estimate_change_rate

    t0 = datetime(2026, 1, 1)
    rows = []
    # url A: 5 checks, hourly, 2 changes
    for i, ch in enumerate([True, False, True, False, False]):
        rows.append(("A", t0 + timedelta(hours=i), ch))
    # url B: single check -> no estimate
    rows.append(("B", t0, True))
    # url C: 4 checks, every 2h, ALL changed (X=n boundary must stay finite)
    for i in range(4):
        rows.append(("C", t0 + timedelta(hours=2 * i), True))
    df = spark.createDataFrame(rows, ["url", "ts", "changed"])
    got = {r.url: r for r in estimate_change_rate(df).collect()}

    lam_a = -math.log((5 - 2 + 0.5) / (5 + 0.5)) / 3600.0
    assert abs(got["A"].lambda_hat - lam_a) < 1e-15
    assert got["A"].n_checks == 5 and got["A"].n_changed == 2
    assert got["A"].avg_interval_s == 3600.0
    assert got["B"].lambda_hat is None and got["B"].avg_interval_s is None
    lam_c = -math.log(0.5 / 4.5) / 7200.0
    assert abs(got["C"].lambda_hat - lam_c) < 1e-15


def test_revisit_schedule_clamps_and_defaults(spark):
    from datetime import datetime, timedelta

    from metadata_crawler_spark.operators.changes import (
        estimate_change_rate,
        revisit_schedule,
    )

    t0 = datetime(2026, 1, 1)
    rows = []
    # hot: changes every check, 1-min interval -> clamps to min
    for i in range(6):
        rows.append(("hot", t0 + timedelta(minutes=i), True))
    # cold: never changed -> lambda 0-ish is NULL-free but raw huge -> max
    for i in range(6):
        rows.append(("cold", t0 + timedelta(hours=i), False))
    # single-check: no estimate -> max
    rows.append(("one", t0, True))
    df = spark.createDataFrame(rows, ["url", "ts", "changed"])
    sched = {
        r.url: r
        for r in revisit_schedule(
            estimate_change_rate(df), min_interval_s=600.0,
            max_interval_s=86400.0,
        ).collect()
    }
    assert sched["hot"].revisit_interval_s == 600.0
    assert sched["cold"].revisit_interval_s == 86400.0
    assert sched["one"].revisit_interval_s == 86400.0
    assert (sched["hot"].next_due_ts - sched["hot"].last_check_ts
            ).total_seconds() == 600.0


def test_detect_changes_null_content_is_presence_aware(spark):
    """A URL present in both crawls with NULL content must classify by
    PRESENCE (changed/unchanged), never as new/gone — hash nullness is
    not absence."""
    old = spark.createDataFrame(
        [("u1", None), ("u2", "body"), ("u3", None)], ["url", "text"]
    )
    new = spark.createDataFrame(
        [("u1", "body"), ("u2", None), ("u3", None), ("u4", "x")],
        ["url", "text"],
    )
    ch = {r.url: r.status for r in detect_changes(old, new).collect()}
    assert ch == {
        "u1": "changed",    # NULL -> body: present both, content differs
        "u2": "changed",    # body -> NULL
        "u3": "unchanged",  # NULL -> NULL (eqNullSafe)
        "u4": "new",
    }


def test_robots_nonrule_lines_do_not_split_ua_run(spark):
    """RFC 9309: non-group lines (Sitemap:, unknown keys) between
    consecutive User-agent lines don't end the UA run — both agents
    share the rule block that follows."""
    from metadata_crawler_spark.functions.robots import parse_robots_txt

    body = (
        "User-agent: mcsbot\n"
        "Sitemap: https://x/s.xml\n"
        "User-agent: otherbot\n"
        "Disallow: /private\n"
    )
    allow, disallow, delay = parse_robots_txt(body, agent="mcsbot")
    assert disallow == ["/private"]


def test_robots_overflow_crawl_delay_ignored(spark):
    """A hostile 'Crawl-delay: 1e999' floats to inf; int(inf*1000)
    raises OverflowError, which must be swallowed like ValueError."""
    from metadata_crawler_spark.functions.robots import parse_robots_txt

    body = "User-agent: *\nDisallow: /x\nCrawl-delay: 1e999\n"
    allow, disallow, delay = parse_robots_txt(body)
    assert disallow == ["/x"]
    assert delay is None or delay == 0

"""URL canonicalization + hashing unit tests (golden cases + UDF parity).

Mirrors the reference's parser unit tests (tests/test_utils.py:32-127 style:
table of raw -> expected)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from metadata_crawler_spark.functions.urls import (
    _canon_batch,
    canon_url_py,
    canonicalize_expr,
    canonicalize_udf,
    host_expr,
    shard_expr,
    with_url_hash,
)

GOLDEN = [
    # already canonical — unchanged
    ("https://example.com/a/b", "https://example.com/a/b"),
    # empty path -> "/"
    ("https://example.com", "https://example.com/"),
    # scheme+host lowercased, path case preserved
    ("HTTPS://Example.COM/Path/File", "https://example.com/Path/File"),
    # default port stripped, non-default kept
    ("http://example.com:80/x", "http://example.com/x"),
    ("https://example.com:443/x", "https://example.com/x"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    # fragment dropped
    ("https://example.com/x#frag", "https://example.com/x"),
    # dot segments resolved
    ("https://example.com/a/./b/../c", "https://example.com/a/c"),
    ("https://example.com/./x", "https://example.com/x"),
    # query params sorted, blank values kept
    ("https://example.com/x?b=2&a=1", "https://example.com/x?a=1&b=2"),
    ("https://example.com/x?b=&a=1", "https://example.com/x?a=1&b="),
    # percent-encoding: unreserved decoded, case preserved after decode
    ("https://example.com/%61bc", "https://example.com/abc"),
    ("https://example.com/a%2Fb", "https://example.com/a%2Fb"),
    # whitespace trimmed
    ("  https://example.com/x ", "https://example.com/x"),
]


@pytest.mark.parametrize("raw,expected", GOLDEN)
def test_canon_url_py(raw, expected):
    assert canon_url_py(raw) == expected


def test_canon_idempotent():
    for raw, _ in GOLDEN:
        once = canon_url_py(raw)
        assert canon_url_py(once) == once


def test_canon_batch_matches_py():
    raw = [r for r, _ in GOLDEN] * 7
    out = _canon_batch(pd.Series(raw))
    assert list(out) == [canon_url_py(r) for r in raw]


def test_canonicalize_udf_on_fixture_pages(spark, tables):
    """Every fixture URL canonicalizes (via the Spark UDF) to exactly what
    the pure-Python reference produces."""
    pdf = (
        tables["pages"]
        .select("url", canonicalize_udf("url").alias("canon"))
        .toPandas()
    )
    expect = pdf["url"].map(canon_url_py)
    assert (pdf["canon"] == expect).all()


def test_canonicalize_expr_subset(spark):
    """The builtin-expression tier agrees with the reference on its
    declared subset (no %-escapes / dot segments)."""
    raws = [
        "HTTPS://Example.COM/Path?b=2&a=1#f",
        "http://example.com:80/x",
        "https://example.com",
        "https://h1.example.org/a/b?z=9&y=8&x=7",
    ]
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    got = [r[0] for r in df.select(canonicalize_expr(F.col("url"))).collect()]
    assert got == [canon_url_py(r) for r in raws]


def test_host_expr(spark):
    df = spark.createDataFrame(
        [("https://User@Ex.COM:8443/p?q=1",), ("http://h2.example.net/x",)],
        "url string",
    )
    assert [r[0] for r in df.select(host_expr(F.col("url"))).collect()] == [
        "ex.com",
        "h2.example.net",
    ]


def test_url_hash_128bit_and_shard(spark):
    df = with_url_hash(
        spark.createDataFrame([("a",), ("b",), ("a",)], "url string")
    )
    rows = df.collect()
    # deterministic, equal urls -> equal 128-bit keys, different urls differ
    assert (rows[0].url_hash_hi, rows[0].url_hash_lo) == (
        rows[2].url_hash_hi,
        rows[2].url_hash_lo,
    )
    assert (rows[0].url_hash_hi, rows[0].url_hash_lo) != (
        rows[1].url_hash_hi,
        rows[1].url_hash_lo,
    )
    # hi and lo are independent digests
    assert rows[0].url_hash_hi != rows[0].url_hash_lo
    shards = df.select(shard_expr(F.col("url_hash_hi"), 16).alias("s")).collect()
    assert all(0 <= r.s < 16 for r in shards)


def test_with_canonical_equals_udf_on_corpus(spark):
    """The plan-level split (JVM fast path UNION pandas slow path) must
    produce exactly the UDF's output as a multiset, for the messy fixture
    corpus AND adversarial edge cases."""
    from metadata_crawler_spark.functions.urls import (
        canonicalize_udf,
        with_canonical,
    )
    from metadata_crawler_spark.sources.fixtures import write_fixtures

    fx = write_fixtures("/tmp/fx_canon_eq", 4000)
    pages = spark.read.parquet(fx["pages"]).select("url")
    edge = spark.createDataFrame(
        [(u,) for u in [
            None, "", "   ", "not a url", "HTTP://A.com:80/x?b=2&a=1#f",
            "https://a.com", "https://a.com/", "https://a.com/a/../b",
            "https://a.com/a/./b", "https://a.com/%7Euser/%2Fx",
            "https://user:pw@a.com:8443/x", "ftp://a.com/x",
            "https://a.com/UPPER/path", "https://a.com/ok?z=1&a=2",
            "https://a.com/trailing/", "http://b.org:8080/keep-port",
        ]],
        "url string",
    )
    df = pages.unionByName(edge)
    got = sorted(
        r.url or "" for r in with_canonical(df, "url").collect()
    )
    want = sorted(
        r.c or "" for r in df.select(canonicalize_udf("url").alias("c")).collect()
    )
    assert got == want


def test_with_canonical_fast_path_avoids_python(spark):
    """Rows matching the fast regex must take the expression branch: the
    fast branch's plan contains no ArrowEvalPython node."""
    from metadata_crawler_spark.functions.urls import with_canonical

    df = spark.createDataFrame(
        [("https://a.com/x/y",), ("https://b.org/z",)], "url string"
    )
    out = with_canonical(df, "url")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the union has exactly ONE python-eval subtree (the slow branch)
    assert plan.count("ArrowEvalPython") == 1


def test_url_quality_flags(spark):
    """C4-style URL filtering signals: each planted defect trips exactly
    its own flag; a clean URL trips none."""
    from metadata_crawler_spark.functions.urls import url_quality_flags

    rows = [
        (1, "https://ok.example.com/a/b?x=1&y=2"),
        (2, "https://deep.example.com/" + "/".join(f"s{i}" for i in range(15))),
        (3, "https://p.example.com/a?" + "&".join(f"k{i}=v" for i in range(12))),
        (4, "https://s.example.com/a?jsessionid=ABC123&x=1"),
        (5, "ftp://files.example.com/a"),
        (6, "https://l.example.com/" + "x" * 3000),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {
        r["id"]: r["q"]
        for r in df.select(
            "id", url_quality_flags(F.col("url")).alias("q")
        ).collect()
    }
    assert not got[1]["junk"]
    assert got[2]["too_deep"] and got[2]["junk"]
    assert got[3]["too_many_params"]
    assert got[4]["session_junk"]
    assert got[5]["non_http"]
    assert got[6]["too_long"]
    for i in (2, 3, 4, 5, 6):
        assert got[i]["junk"]


def test_filter_blocked_hosts(spark):
    """Blocklist match on the host or any parent domain; unrelated hosts
    (including superstrings of blocked domains) survive."""
    from metadata_crawler_spark.functions.urls import filter_blocked_hosts

    df = spark.createDataFrame(
        [
            (1, "https://spam.bad.example/x"),      # subdomain of blocked
            (2, "https://bad.example/y"),           # exact blocked
            (3, "https://good.example/z"),          # clean
            (4, "https://notbad.example/w"),        # superstring, NOT blocked
            (5, "https://a.b.c.tracker.net/q"),     # deep subdomain of blocked
        ],
        "id long, url string",
    )
    bl = spark.createDataFrame(
        [("bad.example",), ("tracker.net",)], "domain string"
    )
    kept = {r["id"] for r in filter_blocked_hosts(df, bl).collect()}
    assert kept == {3, 4}


def test_url_quality_flags_null_url_concrete(spark):
    """ADVICE r4: a NULL url must yield concrete booleans — junk=True via
    non_http — so filter(~junk) actually drops it instead of silently
    NULL-filtering it with no flag ever set."""
    from metadata_crawler_spark.functions.urls import url_quality_flags

    df = spark.createDataFrame([(1, None), (2, "https://ok.example/a")],
                               "id long, url string")
    got = {
        r["id"]: r["q"]
        for r in df.select(
            "id", url_quality_flags(F.col("url")).alias("q")
        ).collect()
    }
    assert got[1]["junk"] is True and got[1]["non_http"] is True
    assert got[1]["too_long"] is False  # nothing measured -> not flagged
    assert got[2]["junk"] is False
    # the filter the flag exists for keeps exactly the clean row
    flagged = df.select(
        "id", url_quality_flags(F.col("url")).alias("q")
    ).filter(~F.col("q.junk"))
    assert [r["id"] for r in flagged.collect()] == [2]


def test_filter_blocked_hosts_zero_corpus_exchange(spark):
    """VERDICT r4 nit 3: the corpus side of filter_blocked_hosts must not
    shuffle — both the suffix semi join and the final anti join are
    broadcast, so the executed plan has broadcast exchanges only (no
    partition-keyed Exchange anywhere)."""
    from metadata_crawler_spark.functions.urls import filter_blocked_hosts

    df = spark.createDataFrame(
        [(i, f"https://h{i}.bad.example/x") for i in range(20)],
        "id long, url string",
    )
    bl = spark.createDataFrame([("bad.example",)], "domain string")
    out = filter_blocked_hosts(df, bl)
    assert out.count() == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    shuffles = [
        ln for ln in plan.splitlines()
        if re.search(r"\bExchange (hash|range|SinglePartition)", ln)
    ]
    assert not shuffles, shuffles
    assert "BroadcastHashJoin" in plan


def test_filter_blocked_hosts_shuffle_fallback_same_result(spark):
    """The data-dependent hit set must not be force-broadcast when large
    (code-review r5): the gated fallback (hits_broadcast=False) drops
    exactly the same rows as the broadcast path."""
    from metadata_crawler_spark.functions.urls import filter_blocked_hosts

    df = spark.createDataFrame(
        [(i, f"https://h{i}.{'bad' if i % 2 else 'ok'}.example/x")
         for i in range(40)],
        "id long, url string",
    )
    bl = spark.createDataFrame([("bad.example",)], "domain string")
    fast = {r["id"] for r in
            filter_blocked_hosts(df, bl, hits_broadcast=True).collect()}
    slow = {r["id"] for r in
            filter_blocked_hosts(df, bl, hits_broadcast=False).collect()}
    assert fast == slow == {i for i in range(40) if i % 2 == 0}


def test_url_template_expr_shapes(spark):
    """Templates collapse digit/hex runs and sort query KEYS (values
    dropped), so trap permutations of the same page land on one key."""
    from metadata_crawler_spark.functions.urls import url_template_expr

    rows = [
        (1, "https://a.example/item/123?b=2&a=1"),
        (2, "https://a.example/item/999?a=9&b=0"),   # same template as 1
        (3, "https://a.example/item/123"),           # no query -> '?'
        (4, "https://a.example/s/deadbeefcafe1234/x"),  # hex run -> H
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {
        r["id"]: r["t"]
        for r in df.select(
            "id", url_template_expr(F.col("url")).alias("t")
        ).collect()
    }
    assert got[1] == got[2] == "a.example/item/D?a,b"
    assert got[3] == "a.example/item/D?"
    assert got[4] == "a.example/s/H/x?"


def test_detect_url_traps_planted(spark):
    """A planted calendar walk (40 URLs, one template) and a path loop
    are both flagged; the legitimate long-tail site is not. The only
    partition-keyed shuffle in the plan is the template count agg."""
    import re

    from metadata_crawler_spark.functions.urls import detect_url_traps

    rows = (
        # calendar trap: 40 distinct date pages, one template
        [(f"cal{i}", f"https://trap.example/2020/{1 + i % 12}/{1 + i % 28}")
         for i in range(40)]
        # link loop: /a/b repeated 4 times
        + [("loop0", "https://loop.example/a/b/a/b/a/b/a/b")]
        # healthy site: 30 URLs, 30 templates
        + [(f"ok{i}", f"https://ok.example/page-{chr(97 + i % 26)}{chr(97 + i // 26)}")
           for i in range(30)]
    )
    df = spark.createDataFrame(rows, "id string, url string")
    out = detect_url_traps(df, max_template_urls=100, calendar_divisor=10)
    by_id = {r["id"]: r for r in out.collect()}
    # calendar bar = 100 // 10 = 10 < 40 -> explosion despite being
    # far under the generic 100-URL bar
    assert all(by_id[f"cal{i}"]["trap"] for i in range(40))
    assert by_id["cal0"]["calendar_path"] is True
    assert by_id["cal0"]["template_explosion"] is True
    assert by_id["cal0"]["path_loop"] is False
    # the loop page trips on repeated segments alone (count 1 template)
    assert by_id["loop0"]["path_loop"] is True
    assert by_id["loop0"]["trap"] is True
    # healthy rows untouched
    assert not any(by_id[f"ok{i}"]["trap"] for i in range(30))
    assert by_id["ok0"]["n_template_urls"] is None  # cold: count elided
    assert by_id["cal0"]["n_template_urls"] == 40
    assert out.filter(F.col("trap")).count() == 41
    # plan hygiene: the template count agg is the ONLY shuffle of corpus
    # rows; the hot-template set joins back broadcast
    plan = out._jdf.queryExecution().executedPlan().toString()
    shuffles = [
        ln for ln in plan.splitlines()
        if re.search(r"\bExchange hashpartitioning", ln)
    ]
    assert len(shuffles) <= 2, shuffles  # partial+final agg pair at most
    assert "BroadcastHashJoin" in plan
    # the gated fallback path drops/keeps identical rows
    from metadata_crawler_spark.functions.urls import detect_url_traps as d

    slow = d(df, max_template_urls=100, calendar_divisor=10,
             hot_broadcast=False)
    assert {r["id"] for r in slow.filter(F.col("trap")).collect()} == {
        r["id"] for r in out.filter(F.col("trap")).collect()
    }


def test_mine_blocked_hosts_feedback_loop(spark):
    """Quality flags -> host blocklist candidates -> frontier filter:
    the full feedback loop. Support gate protects small hosts; NULL
    flags never count against a host."""
    from pyspark.sql import functions as F

    from metadata_crawler_spark.functions.urls import (
        filter_blocked_hosts,
        mine_blocked_hosts,
    )

    rows = []
    for i in range(30):  # junkfarm.com: 30 docs, 80% flagged
        rows.append((f"https://junkfarm.com/p{i}", i % 5 != 0))
    for i in range(30):  # good.org: 30 docs, 10% flagged
        rows.append((f"https://good.org/a{i}", i % 10 == 0))
    for i in range(5):   # tiny.net: all flagged but under min_docs
        rows.append((f"https://tiny.net/x{i}", True))
    rows.append(("https://nullish.io/only", None))  # NULL flag
    df = spark.createDataFrame(rows, "url string, junk boolean")
    mined = mine_blocked_hosts(df, "junk", min_docs=20, max_flag_frac=0.5)
    out = {r.domain: r for r in mined.collect()}
    assert set(out) == {"junkfarm.com"}
    assert out["junkfarm.com"].n_docs == 30
    assert out["junkfarm.com"].flag_frac == 0.8
    # the mined set drives the frontier filter (parent-domain aware)
    frontier = spark.createDataFrame(
        [("https://junkfarm.com/new",), ("https://sub.junkfarm.com/new",),
         ("https://good.org/new",)],
        "url string",
    )
    kept = [r.url for r in filter_blocked_hosts(
        frontier, mined.select("domain")).collect()]
    assert kept == ["https://good.org/new"]

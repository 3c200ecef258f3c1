"""Mirror-host detection vs hand-computed containments."""

from __future__ import annotations

import itertools

import pytest

from metadata_crawler_spark.operators.mirrors import detect_mirrors


def _pages(rows):
    return [(h, f"/p{i}", c) for h, i, c in rows]


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "host string, path string, text string")
    return {
        (r.host_a, r.host_b): (r.shared, r.n_a, r.n_b, r.containment)
        for r in detect_mirrors(df, **kw).collect()
    }


def test_full_mirror_pair(spark):
    rows = _pages(
        [("a.org", i, f"doc{i}") for i in range(6)]
        + [("mirror.a.org", i, f"doc{i}") for i in range(6)]
        + [("other.net", i, f"unique{i}") for i in range(6)]
    )
    out = _run(spark, rows)
    assert out == {("a.org", "mirror.a.org"): (6, 6, 6, 1.0)}


def test_partial_mirror_containment(spark):
    # small host carries 4 docs, 3 of which the big host also serves
    rows = _pages(
        [("big.org", i, f"c{i}") for i in range(10)]
        + [("small.org", i, f"c{i}") for i in range(3)]
        + [("small.org", 99, "own")]
    )
    out = _run(spark, rows, min_containment=0.5)
    assert out == {("big.org", "small.org"): (3, 10, 4, 0.75)}


def test_thresholds_filter(spark):
    rows = _pages(
        [("x.org", 0, "s"), ("y.org", 0, "s"),  # 1 shared hash only
         ("x.org", 1, "x1"), ("y.org", 1, "y1")]
    )
    assert _run(spark, rows, min_shared=2) == {}
    out = _run(spark, rows, min_shared=1, min_containment=0.5)
    assert out == {("x.org", "y.org"): (1, 2, 2, 0.5)}


def test_boilerplate_cap_drops_pairs_not_denominators(spark):
    # "" is served by 5 hosts -> over cap 4: contributes to no pair,
    # but still counts in each host's distinct-content size
    hosts = [f"h{i}.org" for i in range(5)]
    rows = _pages([(h, 0, "") for h in hosts])
    rows += _pages(
        [("h0.org", 1, "m1"), ("h1.org", 1, "m1"),
         ("h0.org", 2, "m2"), ("h1.org", 2, "m2")]
    )
    out = _run(spark, rows, max_hosts_per_hash=4, min_containment=0.5)
    # h0/h1 share m1,m2 (the "" hash asserts nothing); sizes include ""
    assert out == {("h0.org", "h1.org"): (2, 3, 3, round(2 / 3, 6))}


def test_duplicate_urls_same_content_count_once(spark):
    rows = _pages(
        [("a.org", 0, "same"), ("a.org", 1, "same"),
         ("b.org", 0, "same"), ("b.org", 7, "same")]
    )
    out = _run(spark, rows, min_shared=1)
    assert out == {("a.org", "b.org"): (1, 1, 1, 1.0)}


def test_three_way_mirrors_all_pairs(spark):
    hosts = ["m1.org", "m2.org", "m3.org"]
    rows = _pages([(h, i, f"d{i}") for h in hosts for i in range(3)])
    out = _run(spark, rows)
    assert set(out) == {
        tuple(sorted(p)) for p in itertools.combinations(hosts, 2)
    }
    for v in out.values():
        assert v == (3, 3, 3, 1.0)


def test_nulls_ignored(spark):
    rows = [("a.org", "/p", None), (None, "/p", "c"),
            ("a.org", "/q", "c"), ("b.org", "/r", "c")]
    df_rows = [(h, p, t) for h, p, t in rows]
    out = _run(spark, df_rows, min_shared=1)
    assert out == {("a.org", "b.org"): (1, 1, 1, 1.0)}

"""Frontier scheduling tests: robots gating, skew-safe two-stage top-k vs a
pandas golden, politeness offsets, ordering determinism across parallelism."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from metadata_crawler_spark.functions.urls import canonicalize_udf, with_url_hash
from metadata_crawler_spark.operators.frontier import (
    apply_robots,
    expand_outlinks,
    per_host_topk,
    schedule_round,
    valid_urls,
    with_host,
)


def _mk_frontier(spark, tables):
    seeds = tables["pages"].select(
        canonicalize_udf("url").alias("url"),
        F.lit(0).alias("depth"),
        (F.xxhash64("url") % 1000 / 1000.0 + 1.5).alias("score"),
    )
    return with_url_hash(valid_urls(seeds)).dropDuplicates(["url"]).cache()


def _golden_schedule(frontier_pdf, robots_pdf, hosts_pdf, default_budget=8):
    f = frontier_pdf.copy()
    f["host"] = f["url"].str.extract(r"://([^/:]+)")
    f["path"] = f["url"].str.replace(r"^[a-z]+://[^/]*", "", regex=True)
    r = robots_pdf.set_index("host")
    h = hosts_pdf.set_index("host")

    def allowed(row):
        if row["host"] not in r.index:
            return True
        dis = list(r.loc[row["host"], "disallow"])
        return not any(row["path"].startswith(d) for d in dis)

    f = f[f.apply(allowed, axis=1)]
    f = f.sort_values(["depth", "score", "url"], ascending=[True, False, True],
                      kind="mergesort")
    out = []
    for host, grp in f.groupby("host", sort=False):
        budget = int(h.loc[host, "budget"]) if host in h.index else default_budget
        g = grp.head(budget).copy()
        g["rank"] = range(1, len(g) + 1)
        out.append(g)
    return pd.concat(out) if out else f.head(0)


def test_valid_urls_gate(spark):
    df = spark.createDataFrame(
        [("https://a.com/x",), ("ftp://a.com/x",), ("not a url",), ("",)],
        "url string",
    )
    assert [r.url for r in valid_urls(df).collect()] == ["https://a.com/x"]


def test_robots_gating(spark):
    frontier = with_host(
        spark.createDataFrame(
            [
                ("https://a.com/private/x", 0, 1.0),
                ("https://a.com/public/x", 0, 1.0),
                ("https://b.com/anything", 0, 1.0),
                ("https://c.com/no/rules", 0, 1.0),
            ],
            "url string, depth int, score double",
        )
    )
    robots = spark.createDataFrame(
        [("a.com", ["/private"], 100), ("b.com", ["/"], 0)],
        "host string, disallow array<string>, crawl_delay_ms long",
    )
    got = apply_robots(frontier, robots).select("url", "crawl_delay_ms").collect()
    urls = sorted(r.url for r in got)
    assert urls == ["https://a.com/public/x", "https://c.com/no/rules"]
    delays = {r.url: r.crawl_delay_ms for r in got}
    assert delays["https://a.com/public/x"] == 100
    assert delays["https://c.com/no/rules"] == 0  # no robots row -> 0


def test_schedule_matches_pandas_golden(spark, tables):
    frontier = _mk_frontier(spark, tables)
    scheduled = schedule_round(frontier, tables["hosts"], tables["robots"])
    got = (
        scheduled.select("url", "host", "rank", "fetch_offset_ms", "crawl_delay_ms")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    golden = _golden_schedule(
        frontier.select("url", "depth", "score").toPandas(),
        tables["robots"].toPandas(),
        tables["hosts"].toPandas(),
    )
    golden = golden[["url", "host", "rank"]].sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(golden["url"])
    assert list(got["rank"]) == list(golden["rank"])
    # politeness: offset == (rank-1)*delay
    assert (got["fetch_offset_ms"] == (got["rank"] - 1) * got["crawl_delay_ms"]).all()


def test_topk_invariant_to_salt_and_partitions(spark, tables):
    frontier = _mk_frontier(spark, tables)
    base = schedule_round(frontier, tables["hosts"], tables["robots"], salt_parts=1)
    for salt, parts in [(4, 3), (16, 17)]:
        other = schedule_round(
            frontier.repartition(parts), tables["hosts"], tables["robots"],
            salt_parts=salt,
        )
        a = base.select("url", "rank")
        b = other.select("url", "rank")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_budget_respected(spark, tables):
    frontier = _mk_frontier(spark, tables)
    sched = schedule_round(frontier, tables["hosts"], tables["robots"])
    over = (
        sched.groupBy("host", "budget")
        .count()
        .filter(F.col("count") > F.col("budget"))
        .count()
    )
    assert over == 0


def test_expand_outlinks_opic(spark):
    fetched = spark.createDataFrame(
        [(1.0, 2, ["https://a.com/1", "https://a.com/2"]), (0.5, 3, [])],
        "score double, depth int, links array<string>",
    )
    rows = expand_outlinks(fetched).collect()
    assert len(rows) == 2
    assert all(abs(r.score - 0.5) < 1e-12 and r.depth == 3 for r in rows)


def test_pagerank_hub_spoke_matches_numpy(spark):
    """VERDICT r4 item 8: fixed-iteration PageRank on a planted hub/spoke
    graph (every spoke links to the hub; the hub links to one spoke)
    must match an independent dense numpy power-iteration exactly, and
    rank the hub first."""
    import numpy as np

    from metadata_crawler_spark.operators.frontier import pagerank

    hub, spokes = "https://hub.example/", [
        f"https://s{i}.example/" for i in range(8)
    ]
    edges = [(s, hub) for s in spokes] + [(hub, spokes[0])]
    got = {
        r["url"]: r["pr"]
        for r in pagerank(
            spark.createDataFrame(edges, "src string, dst string"),
            iterations=3,
        ).collect()
    }
    # numpy reference: same simplified recurrence, no dangling spread
    nodes = [hub] + spokes
    idx = {u: i for i, u in enumerate(nodes)}
    out = np.zeros(len(nodes))
    for s, _ in edges:
        out[idx[s]] += 1
    pr = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(3):
        nxt = np.full(len(nodes), 0.15 / len(nodes))
        for s, d in edges:
            nxt[idx[d]] += 0.85 * pr[idx[s]] / out[idx[s]]
        pr = nxt
    for u in nodes:
        assert abs(got[u] - pr[idx[u]]) < 1e-12, u
    assert got[hub] == max(got.values())
    assert got[hub] > 10 * got[spokes[1]]


def test_rescore_frontier_pagerank(spark):
    """rescore_frontier swaps OPIC scores for link-authority scores:
    the hub outranks every spoke afterward, and a frontier url absent
    from the graph gets the non-starving floor, not NULL/zero."""
    from metadata_crawler_spark.operators.frontier import rescore_frontier

    hub = "https://hub.example/"
    spokes = [f"https://s{i}.example/" for i in range(5)]
    edges = spark.createDataFrame(
        [(s, hub) for s in spokes], "src string, dst string"
    )
    frontier = spark.createDataFrame(
        [(hub, 0, 0.01)]
        + [(s, 1, 0.5) for s in spokes]
        + [("https://new.example/", 2, 0.9)],
        "url string, depth int, score double",
    )
    out = {r["url"]: r["score"] for r in
           rescore_frontier(frontier, edges).collect()}
    assert len(out) == 7
    assert out[hub] == max(out.values())
    floor = 0.15 / 6  # (1-d)/N, N=6 graph vertices
    assert abs(out["https://new.example/"] - floor) < 1e-12


def test_pagerank_empty_graph_no_crash(spark):
    """An empty link graph (crawl with no outlinks yet) must yield an
    empty rank table and leave rescore_frontier's input unchanged — not
    divide by zero (code-review r5 finding)."""
    from metadata_crawler_spark.operators.frontier import (
        pagerank,
        rescore_frontier,
    )

    edges = spark.createDataFrame([], "src string, dst string")
    assert pagerank(edges).count() == 0
    frontier = spark.createDataFrame(
        [("https://a.example/", 0, 0.7)], "url string, depth int, score double"
    )
    out = rescore_frontier(frontier, edges).collect()
    assert len(out) == 1 and abs(out[0]["score"] - 0.7) < 1e-12


def test_update_host_budgets_aimd(spark):
    from metadata_crawler_spark.operators.frontier import update_host_budgets

    hosts = spark.createDataFrame(
        [("good.ex", 8), ("bad.ex", 8), ("thin.ex", 8), ("idle.ex", 8),
         ("capped.ex", 63), ("floor.ex", 1)],
        "host string, budget int",
    )
    rows = []
    rows += [("good.ex", True)] * 10                      # healthy -> +2
    rows += [("bad.ex", True)] * 2 + [("bad.ex", False)] * 8   # 20% -> *0.5
    rows += [("thin.ex", False)] * 2                      # < min_attempts
    rows += [("capped.ex", True)] * 5                     # clamps at 64
    rows += [("floor.ex", False)] * 5                     # clamps at 1
    fetched = spark.createDataFrame(rows, "host string, fetched boolean")
    got = {r.host: r.budget for r in update_host_budgets(hosts, fetched).collect()}
    assert got["good.ex"] == 10
    assert got["bad.ex"] == 4
    assert got["thin.ex"] == 8     # unmeasured: unchanged
    assert got["idle.ex"] == 8     # absent this round: unchanged
    assert got["capped.ex"] == 64
    assert got["floor.ex"] == 1

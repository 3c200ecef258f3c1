"""HITS hubs/authorities (operators/frontier.hits): numpy parity on a
planted hub/spoke graph, empty-graph guard. (PageRank itself is covered
in test_frontier.py / the q29 oracle family.)"""


def test_hits_hub_spoke(spark):
    """HITS on a planted hub/spoke graph: the page linking all
    authorities is the top hub, pages with more good-hub inlinks are the
    top authorities; values match a numpy reference of the same
    L1-normalized iteration to 1e-12."""
    import numpy as np

    from metadata_crawler_spark.operators.frontier import hits

    edges = [("H", f"A{i}") for i in range(5)]
    edges += [("H2", f"A{i}") for i in range(3)]
    edges += [("A0", "H")]  # a back-link so H has authority too
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["url"]: (r["authority"], r["hub"]) for r in hits(df, iterations=3).collect()}

    urls = sorted({u for e in edges for u in e})
    ix = {u: i for i, u in enumerate(urls)}
    M = np.zeros((len(urls), len(urls)))
    for s, d in edges:
        M[ix[s], ix[d]] += 1
    h = np.ones(len(urls))
    for _ in range(3):
        a = M.T @ h
        a /= a.sum()
        h = M @ a
        h /= h.sum()
    for u in urls:
        assert abs(got[u][0] - a[ix[u]]) < 1e-12, u
        assert abs(got[u][1] - h[ix[u]]) < 1e-12, u
    # ordering sanity: H is the best hub; A0-A2 beat A3-A4 on authority
    assert got["H"][1] == max(v[1] for v in got.values())
    assert min(got[f"A{i}"][0] for i in range(3)) > max(
        got[f"A{i}"][0] for i in range(3, 5)
    )


def test_hits_empty_graph(spark):
    from metadata_crawler_spark.operators.frontier import hits

    df = spark.createDataFrame([], "src string, dst string")
    assert hits(df).count() == 0


def _np_pagerank(edges, urls, t, damping=0.85, iterations=3):
    """numpy twin of operators/frontier.pagerank with teleport vector t
    (dangling mass NOT redistributed, same as the Spark code)."""
    import numpy as np

    ix = {u: i for i, u in enumerate(urls)}
    out = np.zeros(len(urls))
    for s, _ in edges:
        out[ix[s]] += 1
    pr = t.copy()
    for _ in range(iterations):
        m = np.zeros(len(urls))
        for s, d in edges:
            m[ix[d]] += pr[ix[s]] / out[ix[s]]
        pr = (1 - damping) * t + damping * m
    return {u: pr[ix[u]] for u in urls}


def test_trustrank_numpy_parity_and_weights(spark):
    import numpy as np

    from metadata_crawler_spark.operators.frontier import trustrank

    edges = [
        ("s0", "a"), ("s0", "b"), ("s1", "b"), ("a", "c"), ("b", "c"),
        ("c", "s0"), ("x", "y"), ("y", "x"), ("c", "x"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame(
        [("s0", 3.0), ("s1", 1.0), ("ghost", 5.0)], "url string, weight double"
    )
    got = {r["url"]: r["pr"] for r in trustrank(df, seeds, iterations=3).collect()}

    urls = sorted({u for e in edges for u in e})
    t = np.zeros(len(urls))
    t[urls.index("s0")] = 3.0 / 4.0  # ghost is not a vertex: ignored
    t[urls.index("s1")] = 1.0 / 4.0
    ref = _np_pagerank(edges, urls, t)
    for u in urls:
        assert abs(got[u] - ref[u]) < 1e-12, u


def test_trustrank_uniform_seed_weight_default(spark):
    import numpy as np

    from metadata_crawler_spark.operators.frontier import trustrank

    edges = [("s", "a"), ("a", "b"), ("b", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    # no weight column, duplicate seed rows collapse
    seeds = spark.createDataFrame([("s",), ("s",), ("a",)], "url string")
    got = {r["url"]: r["pr"] for r in trustrank(df, seeds, iterations=2).collect()}
    urls = sorted({u for e in edges for u in e})
    t = np.zeros(len(urls))
    t[urls.index("s")] = 2.0 / 3.0
    t[urls.index("a")] = 1.0 / 3.0
    ref = _np_pagerank(edges, urls, t, iterations=2)
    for u in urls:
        assert abs(got[u] - ref[u]) < 1e-12, u


def test_trustrank_disjoint_seeds_raise(spark):
    import pytest

    from metadata_crawler_spark.operators.frontier import trustrank

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("nope",)], "url string")
    with pytest.raises(ValueError, match="no positive-weight seed"):
        trustrank(df, seeds).count()


def test_trustrank_negative_seed_weight_raises(spark):
    import pytest

    from metadata_crawler_spark.operators.frontier import trustrank

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    # mixed-sign weights sum positive but would mean negative teleport
    # probabilities: rejected outright
    seeds = spark.createDataFrame(
        [("a", 2.0), ("b", -1.0)], "url string, weight double"
    )
    with pytest.raises(ValueError, match="negative seed weight"):
        trustrank(df, seeds).count()


def test_spam_mass_flags_link_farm(spark):
    """Planted spam farm: a clique of farm pages all pointing at one
    target gives the target high PageRank, but no path from the trusted
    core reaches it -> spam_mass ~ 1; trust-reachable pages score low."""
    from metadata_crawler_spark.operators.frontier import (
        pagerank,
        spam_mass,
        trustrank,
    )

    edges = [("seed", f"g{i}") for i in range(4)]
    edges += [(f"g{i}", "seed") for i in range(4)]
    farm = [f"f{i}" for i in range(12)]
    for a in farm:
        edges.append((a, "target"))
    df = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("seed",)], "url string")
    pr = pagerank(df, iterations=4)
    tr = trustrank(df, seeds, iterations=4)
    sm = {r["url"]: r for r in spam_mass(pr, tr).collect()}

    # the farm pumped the target into the top PageRank tier
    top_pr = sorted(sm.values(), key=lambda r: -r["pr"])[:3]
    assert "target" in {r["url"] for r in top_pr}
    # ... but its rank is almost all untrusted
    assert sm["target"]["spam_mass"] > 0.9
    for u in ("seed", "g0", "g1", "g2", "g3"):
        assert sm[u]["spam_mass"] < 0.5, u
    # and plain pagerank is reproduced unchanged on the trusted side
    assert sm["seed"]["tr"] > sm["target"]["tr"]


def test_hits_zero_iterations_uniform_prior(spark):
    """iterations=0 returns the uniform L1-normalized prior (the
    pagerank() contract) instead of crashing on a never-assigned
    authority vector."""
    from metadata_crawler_spark.operators.frontier import hits

    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "src string, dst string"
    )
    out = {r["url"]: r for r in hits(e, iterations=0).collect()}
    assert set(out) == {"a", "b", "c"}
    for r in out.values():
        assert abs(r["authority"] - 1 / 3) < 1e-12
        assert abs(r["hub"] - 1 / 3) < 1e-12


def test_spam_mass_single_normalization_job(spark):
    """VERDICT r5 item 5: the two normalizing totals (sum pr, sum tr)
    must ride ONE Spark action (a 1x1 cross-joined aggregate), not two
    sequential collect()s."""
    from metadata_crawler_spark.operators.frontier import spam_mass

    pr = spark.createDataFrame(
        [(f"u{i}", 0.1 * (i + 1)) for i in range(5)], "url string, pr double"
    ).localCheckpoint()  # pin inputs so only spam_mass's own jobs count
    tr = spark.createDataFrame(
        [(f"u{i}", 0.05 * (i + 1)) for i in range(5)], "url string, pr double"
    ).localCheckpoint()
    # ONE action (collect) — AQE splits one action into several stage
    # jobs, so count driver actions, not job ids
    _DF = type(pr)  # the concrete DataFrame class (classic/connect)

    calls = []
    orig_collect = _DF.collect
    try:
        _DF.collect = lambda self: (calls.append(1), orig_collect(self))[1]
        out = spam_mass(pr, tr)  # builds the plan; runs the totals action
        n_actions = len(calls)
    finally:
        _DF.collect = orig_collect
    assert n_actions == 1, f"expected 1 normalization action, saw {n_actions}"
    # and the result is unchanged: mass = (prn - trn) / prn
    rows = {r["url"]: r for r in out.collect()}
    assert abs(rows["u0"]["pr"] - (0.1 / 1.5)) < 1e-9
    assert abs(rows["u0"]["spam_mass"] - (1 - (0.05 / 0.75) / (0.1 / 1.5))) < 1e-9

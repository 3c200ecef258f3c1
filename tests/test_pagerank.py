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

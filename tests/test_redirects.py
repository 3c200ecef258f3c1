"""Redirect-chain resolution: pointer doubling vs a hand-walked truth."""

from __future__ import annotations

from metadata_crawler_spark.operators.redirects import resolve_redirects


def _resolve(spark, edges, **kw):
    df = spark.createDataFrame(edges, "url string, target string")
    return {
        r.url: (r.final_url, r.n_hops, r.looped)
        for r in resolve_redirects(df, **kw).collect()
    }


def test_chains_resolve_with_true_hop_counts(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "d")]
    out = _resolve(spark, edges)
    assert out == {
        "a": ("d", 3, False),
        "b": ("d", 2, False),
        "c": ("d", 1, False),
        "x": ("d", 1, False),
    }


def test_cycles_and_self_loops_flag_looped(spark):
    edges = [("p", "q"), ("q", "p"), ("s", "s"), ("into", "p")]
    out = _resolve(spark, edges)
    assert out["p"] == (None, None, True)
    assert out["q"] == (None, None, True)
    assert out["s"] == (None, None, True)
    # a chain that ENTERS a cycle never terminates either
    assert out["into"] == (None, None, True)


def test_long_chain_within_power_of_two_budget(spark):
    # max_hops=10 rounds up to H=16: a 12-hop chain still resolves
    edges = [(f"n{i}", f"n{i+1}") for i in range(12)]
    out = _resolve(spark, edges, max_hops=10)
    assert out["n0"] == ("n12", 12, False)


def test_over_budget_chain_unresolved(spark):
    edges = [(f"n{i}", f"n{i+1}") for i in range(40)]
    out = _resolve(spark, edges, max_hops=16)
    assert out["n0"] == (None, None, True)  # 40 > 16 hops
    assert out["n30"] == ("n40", 10, False)  # tail fits the budget


def test_duplicate_edges_deterministic(spark):
    # dup sources collapse to min(target) regardless of row order
    edges = [("a", "z"), ("a", "b"), ("b", "c")]
    out = _resolve(spark, edges)
    assert out["a"] == ("c", 2, False)  # min("b","z") == "b"


def test_nulls_dropped(spark):
    edges = [("a", "b"), (None, "x"), ("y", None)]
    out = _resolve(spark, edges)
    assert out == {"a": ("b", 1, False)}

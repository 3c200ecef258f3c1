"""Redirect-chain resolution: alias every URL to its final destination.

A crawler's URL identity is incomplete without this: 301/302/meta-refresh
chains mean the fetched identity of ``http://x/a`` may be ``https://y/b``,
and seen-set membership, dedup, and link-graph edges should all speak the
FINAL url (the reference keeps one identity per record via its unique-key
upsert, api/stores/base.py; resolving aliases is the web-scale analog).
Real crawlers cap redirect budgets (curl defaults to ~30, browsers ~20);
anything over budget — including cycles, the classic crawler trap — is
reported unresolved rather than chased.

Spark shape: the redirect table is a FUNCTIONAL graph (<= one outgoing
edge per url), so resolution is pointer doubling — f_{2k} = f_k(f_k) —
reaching a hop budget of H in ceil(log2 H) self-joins instead of H
chained joins. The iteration count is FIXED by the budget (no
convergence probes, no extra jobs); each round shuffles only
(url, cur, hops) triples and localCheckpoints to keep lineage flat —
the q57/pagerank iterative pattern. Cycles need no special-casing:
they simply never terminate inside the budget and fall out flagged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["resolve_redirects"]


def resolve_redirects(
    edges: DataFrame,
    url_col: str = "url",
    target_col: str = "target",
    max_hops: int = 16,
) -> DataFrame:
    """Resolve each redirecting url to where its chain ends:
    (url, final_url, n_hops, looped).

    ``edges`` holds one redirect per source url (duplicates are
    deterministically collapsed to the minimum target). The hop budget
    is ``max_hops`` rounded up to a power of two, H: a chain that
    terminates within H hops resolves (final_url = the first
    non-redirecting url, n_hops = true chain length); a chain still
    pointing at a redirecting url after H hops — over-budget chains and
    all cycles — reports (final_url NULL, n_hops NULL, looped true).
    Every decision is derivable by a bounded SQL walk, so the operator
    is exactly oracle-checkable (q02 family).
    """
    spark = edges.sparkSession
    e = (
        edges.select(F.col(url_col).alias("url"),
                     F.col(target_col).alias("target"))
        .filter(F.col("url").isNotNull() & F.col("target").isNotNull())
        .groupBy("url")
        .agg(F.min("target").alias("target"))
        .localCheckpoint()
    )
    rounds = max(1, (max_hops - 1).bit_length())  # 2^rounds >= max_hops

    # state: url -> (cur, hops); start one hop down the chain
    state = e.select("url", F.col("target").alias("cur"),
                     F.lit(1).cast("long").alias("hops"))
    for _ in range(rounds):
        hop = state.select(F.col("url").alias("m_url"),
                           F.col("cur").alias("m_cur"),
                           F.col("hops").alias("m_hops"))
        state = (
            state.join(hop, state["cur"] == hop["m_url"], "left")
            .select(
                "url",
                F.coalesce("m_cur", "cur").alias("cur"),
                (F.col("hops") + F.coalesce("m_hops", F.lit(0))).alias("hops"),
            )
            .localCheckpoint()
        )

    # resolved iff the landing url has no outgoing redirect
    out_urls = e.select(F.col("url").alias("cur"))
    return (
        state.join(out_urls, "cur", "left_anti")
        .select(
            "url",
            F.col("cur").alias("final_url"),
            F.col("hops").alias("n_hops"),
            F.lit(False).alias("looped"),
        )
        .unionByName(
            state.join(out_urls, "cur", "left_semi").select(
                "url",
                F.lit(None).cast("string").alias("final_url"),
                F.lit(None).cast("long").alias("n_hops"),
                F.lit(True).alias("looped"),
            )
        )
    )

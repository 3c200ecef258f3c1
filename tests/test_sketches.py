"""Mergeable sketches: HLL cardinality and Misra-Gries heavy hitters.

HLL correctness is error-bound + merge-invariance (the estimate is
approximate by design, so the invariants are: within the published
error band, and union-of-parts == build-of-whole bit-for-bit — the
property that makes incremental per-round maintenance sound). MG heavy
hitters are EXACT after the verify pass, so they check against
collections.Counter ground truth, under adversarial partitionings.
"""

from __future__ import annotations

import collections
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from metadata_crawler_spark.operators.sketches import (
    _mg_shrink,
    heavy_hitters,
    hll_estimates,
    hll_merge,
    hll_sketches,
    mg_summaries,
)


# ---------------------------------------------------------------------------
# HLL
# ---------------------------------------------------------------------------


def _host_urls(n_hosts: int, urls_per_host: int, seed: int):
    rng = random.Random(seed)
    rows = []
    for h in range(n_hosts):
        for _ in range(urls_per_host):
            # duplicates on purpose: distinct count < row count
            rows.append((f"h{h}.example.org",
                         f"https://h{h}.example.org/p{rng.randrange(urls_per_host // 2)}"))
    rng.shuffle(rows)
    return rows


def test_hll_estimate_within_error_band(spark):
    # lgk=12 -> ~1.6% RSE; assert a generous 5% band on 2000 distinct
    rows = [(f"u{i % 2000}",) for i in range(10_000)]
    df = spark.createDataFrame(rows, "url string").withColumn(
        "host", F.lit("h")
    )
    est = hll_estimates(hll_sketches(df, ["host"], "url", lgk=12), ["host"])
    n = est.collect()[0].n_distinct
    assert abs(n - 2000) / 2000 < 0.05


def test_hll_union_of_rounds_equals_full_rebuild(spark):
    """The incremental-maintenance invariant: per-round sketches unioned
    == one sketch over the concatenated rounds (same estimate), so a
    crawl can answer per-host distinct-URL questions from the sketch
    table alone, never re-reading prior rounds."""
    rows = _host_urls(5, 400, seed=7)
    cut = len(rows) // 3
    rounds = [rows[:cut], rows[cut: 2 * cut], rows[2 * cut:]]
    per_round = [
        hll_sketches(
            spark.createDataFrame(r, "host string, url string"),
            ["host"], "url", lgk=11,
        )
        for r in rounds
    ]
    sketch_table = per_round[0].unionByName(per_round[1]).unionByName(
        per_round[2]
    )
    merged = {
        r.host: r.n_distinct
        for r in hll_estimates(hll_merge(sketch_table, ["host"]), ["host"]).collect()
    }
    full = {
        r.host: r.n_distinct
        for r in hll_estimates(
            hll_sketches(
                spark.createDataFrame(rows, "host string, url string"),
                ["host"], "url", lgk=11,
            ),
            ["host"],
        ).collect()
    }
    assert merged == full  # identical sketches -> identical estimates
    truth = collections.Counter()
    seen = collections.defaultdict(set)
    for h, u in rows:
        seen[h].add(u)
    for h, urls in seen.items():
        assert abs(merged[h] - len(urls)) / len(urls) < 0.08


def test_hll_merge_mixed_precision(spark):
    """allowDifferentLgK: rounds written at different lgK still merge."""
    rows = _host_urls(2, 300, seed=3)
    df = spark.createDataFrame(rows, "host string, url string")
    a = hll_sketches(df, ["host"], "url", lgk=12)
    b = hll_sketches(df, ["host"], "url", lgk=10)
    est = hll_estimates(hll_merge(a.unionByName(b), ["host"]), ["host"])
    assert est.count() == 2  # no exception, one row per host


# ---------------------------------------------------------------------------
# Misra-Gries
# ---------------------------------------------------------------------------


def test_mg_shrink_invariants():
    rng = random.Random(0)
    counts = {f"i{i}": rng.randrange(1, 100) for i in range(50)}
    before = dict(counts)
    _mg_shrink(counts, 8)
    assert len(counts) <= 8
    for it, c in counts.items():
        assert 0 < c <= before[it]


def _zipf_tokens(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    # Zipf-ish: token w{r} with weight 1/(r+1)
    ranks = range(200)
    weights = [1.0 / (r + 1) for r in ranks]
    return [f"w{rng.choices(ranks, weights)[0]}" for _ in range(n)]


@pytest.mark.parametrize("n_partitions", [1, 7, 32])
def test_heavy_hitters_exact_vs_counter(spark, n_partitions):
    toks = _zipf_tokens(20_000, seed=11)
    truth = collections.Counter(toks)
    n = len(toks)
    k = 50
    df = spark.createDataFrame(
        [(t,) for t in toks], "tok string"
    ).repartition(n_partitions)
    got = {
        r.item: r.cnt for r in heavy_hitters(df, "tok", k).collect()
    }
    want = {t: c for t, c in truth.items() if c > n / k}
    assert got == want
    assert want  # fixture actually has heavy hitters


def test_heavy_hitters_guarantee_planted_adversarial(spark):
    """A heavy item hidden inside partitions full of distinct junk (the
    worst case for counter eviction) must still be found, exactly."""
    rows = []
    for p in range(16):
        rows += [(f"junk_{p}_{i}",) for i in range(900)]
        rows += [("hot",)] * 100  # global freq 1600/16000 = 10%
    df = spark.createDataFrame(rows, "tok string").repartition(16)
    out = {r.item: r.cnt for r in heavy_hitters(df, "tok", 20).collect()}
    assert out == {"hot": 1600}


def test_heavy_hitters_nulls_and_empty(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",), (None,)], "tok string"
    )
    out = {r.item: r.cnt for r in heavy_hitters(df, "tok", 2).collect()}
    # n=3 non-null; threshold 1.5 -> only 'a' (2)
    assert out == {"a": 2}
    empty = spark.createDataFrame([], "tok string")
    assert heavy_hitters(empty, "tok", 4).count() == 0


def test_mg_summary_bounds(spark):
    """Candidate volume is bounded by partitions x (k+1) rows."""
    toks = _zipf_tokens(5_000, seed=5)
    df = spark.createDataFrame([(t,) for t in toks], "tok string").repartition(8)
    summ = mg_summaries(df, "tok", 10).toPandas()
    assert len(summ) <= 8 * 11
    assert summ["n_part"].sum() == 5_000


def test_heavy_hitters_share_column(spark):
    df = spark.createDataFrame([("x",)] * 80 + [("y",)] * 20, "tok string")
    row = {r.item: r for r in heavy_hitters(df, "tok", 3).collect()}
    assert set(row) == {"x"}
    assert row["x"].share == pytest.approx(0.8)


def test_heavy_hitters_plan_shape(spark):
    """Scale assertions on the physical plan: the candidate semi join is
    a broadcast (build side = candidates, never the raw column), and the
    MG summary pass plans as map-side work off the scan (its only
    exchange feeds the tiny summary aggregation, not raw tokens)."""
    toks = spark.createDataFrame(
        [(f"t{i % 50}",) for i in range(2000)], "tok string"
    ).repartition(8)
    plan = heavy_hitters(toks, "tok", 10)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # tree prints parent-above-child: the tok shuffle's CHILD must be the
    # map-side partial aggregate, which itself sits above (= consumes)
    # the broadcast semi join — i.e. the exchange carries combined
    # (tok, partial count) rows of candidate-filtered data, never raw rows
    i_exch = plan.index("Exchange hashpartitioning(tok")
    i_partial = plan.index("partial_count")
    i_semi = plan.index("LeftSemi")
    assert i_exch < i_partial < i_semi


def test_hll_overlap_inclusion_exclusion(spark):
    """Two snapshots with a planted 50% overlap per host: the derived
    intersection estimate lands within a widened band (I-E compounds
    three estimates), and one-sided hosts report 0 for the absent side."""
    a_rows = [("h0", f"u{i}") for i in range(2000)] + [
        ("only_a", f"x{i}") for i in range(300)
    ]
    b_rows = [("h0", f"u{i}") for i in range(1000, 3000)]
    a = hll_sketches(
        spark.createDataFrame(a_rows, "host string, url string"),
        ["host"], "url",
    )
    b = hll_sketches(
        spark.createDataFrame(b_rows, "host string, url string"),
        ["host"], "url",
    )
    from metadata_crawler_spark.operators.sketches import hll_overlap

    out = {r.host: r for r in hll_overlap(a, b, ["host"]).collect()}
    h0 = out["h0"]
    assert abs(h0.n_a - 2000) / 2000 < 0.05
    assert abs(h0.n_b - 2000) / 2000 < 0.05
    assert abs(h0.n_union - 3000) / 3000 < 0.05
    assert abs(h0.n_intersect - 1000) / 1000 < 0.25
    only = out["only_a"]
    assert only.n_b == 0 and only.n_intersect == 0
    assert abs(only.n_a - 300) / 300 < 0.08
    assert only.n_union == only.n_a


def test_heavy_hitters_rejects_subrecall_threshold(spark):
    # threshold_frac below 1/k is outside the MG recall guarantee: an
    # item above the threshold but below n/k could silently vanish, so
    # the combination must raise instead (r5 review).
    df = spark.createDataFrame([("x",)], "tok string")
    with pytest.raises(ValueError, match="1/k"):
        heavy_hitters(df, "tok", k=2, threshold_frac=0.01)
    # exactly 1/k written as a rounded float stays accepted
    assert heavy_hitters(df, "tok", k=3, threshold_frac=1 / 3).count() == 1

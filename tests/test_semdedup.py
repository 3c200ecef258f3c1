"""SemDeDup: per-cluster cosine dedup — planted-duplicate semantics,
keep-farthest-from-centroid rule, chained drops, and join==arrow path
equality (the oracle-exact JVM path vs the chunked-matmul scale path)."""

from __future__ import annotations

import numpy as np
import pytest

from metadata_crawler_spark.operators.dedup import semdedup, semdedup_prune


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


CENTS = np.array([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0]])


def test_planted_duplicates_drop_keep_farthest(spark):
    # cell 0: three near-identical vectors at decreasing centroid cosine,
    # plus one orthogonal-ish singleton; cell 1: a lone vector.
    vecs = [
        [1.0, 0.0, 0.0],        # 0: cent_cos 1.0 (closest to centroid)
        [1.0, 0.01, 0.0],       # 1: same direction, slightly off-axis
        [1.0, 0.02, 0.0],       # 2: farthest from centroid of the trio
        [0.6, 0.0, 0.8],        # 3: cell 0 but cosine ~0.6 to the trio
        [0.0, 1.0, 0.0],        # 4: cell 1 singleton
    ]
    out = {
        r.id: r
        for r in semdedup(_df(spark, vecs), CENTS, threshold=0.95).collect()
    }
    assert [out[i].cell for i in range(5)] == [0, 0, 0, 0, 1]
    # trio: survivor is the LOWEST cent_cos member (id 2), others dropped
    assert not out[2].dropped and out[0].dropped and out[1].dropped
    assert not out[3].dropped and not out[4].dropped
    assert out[0].cent_cos == pytest.approx(1.0)
    assert out[2].cent_cos < out[1].cent_cos < out[0].cent_cos


def test_exists_rule_chains_across_dropped_partners(spark):
    # a-b similar, b-c similar, a-c NOT: priority c > b > a (cent_cos
    # descending a > b > c). b dropped by c; a dropped by b EVEN THOUGH b
    # itself is dropped (the EXISTS rule is not sequential-greedy).
    a = np.array([1.0, 0.00, 0.0])
    b = np.array([1.0, 0.28, 0.0])
    c = np.array([1.0, 0.58, 0.0])
    df = _df(spark, [a, b, c])
    out = {r.id: r for r in semdedup(df, CENTS, threshold=0.96).collect()}
    cos = lambda u, v: float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))
    assert cos(a, b) >= 0.96 and cos(b, c) >= 0.96 and cos(a, c) < 0.96
    assert not out[2].dropped          # lowest cent_cos: kept
    assert out[1].dropped              # dropped by c
    assert out[0].dropped              # dropped by b (itself dropped)


def test_cross_cluster_pairs_never_compared(spark):
    # identical vectors in DIFFERENT cells survive both
    vecs = [[1.0, 0.9, 0.0], [0.9, 1.0, 0.0]]  # cells 0 and 1, cosine ~1
    out = semdedup(_df(spark, vecs), CENTS, threshold=0.9).collect()
    assert not any(r.dropped for r in out)


def test_join_and_arrow_paths_identical(spark):
    rng = np.random.default_rng(42)
    cents = rng.standard_normal((6, 8))
    vecs = rng.standard_normal((180, 8))
    # plant duplicate pairs so drops actually occur
    vecs[50] = vecs[10] + 0.001
    vecs[51] = vecs[10] - 0.001
    vecs[120] = vecs[90] * 1.5
    df = _df(spark, vecs)
    j = sorted(
        (r.id, r.cell, r.cent_cos, r.dropped)
        for r in semdedup(df, cents, threshold=0.9, method="join").collect()
    )
    a = sorted(
        (r.id, r.cell, r.cent_cos, r.dropped)
        for r in semdedup(df, cents, threshold=0.9, method="arrow").collect()
    )
    assert any(d for *_x, d in j)  # the plant fired
    assert j == a


def test_prune_returns_survivor_rows(spark):
    # 0.03 keeps the cent_cos gap above the 6-decimal rounding grain
    # (0.001 rounds both to 1.0 and the tie-break keeps id 0 instead)
    vecs = [[1.0, 0.0, 0.0], [1.0, 0.03, 0.0], [0.0, 1.0, 0.0]]
    kept = semdedup_prune(_df(spark, vecs), CENTS, threshold=0.99)
    ids = sorted(r.vec_id for r in kept.collect())
    assert ids == [1, 2]  # id 1 is farther from centroid than id 0
    assert kept.columns == ["vec_id", "embedding"]  # payload preserved


def test_no_cartesian_in_plan(spark):
    rng = np.random.default_rng(1)
    df = _df(spark, rng.standard_normal((30, 4)))
    plan = semdedup(df, rng.standard_normal((3, 4)))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the k-row centroid side rides a broadcast, not a shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan

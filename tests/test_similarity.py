"""Similarity search: exact brute-force vs DuckDB-style ground truth, and
ANN recall against the exact baseline."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from metadata_crawler_spark.operators.similarity import ann_topk, cosine_topk, lsh_buckets

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_cosine_topk_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    m = np.vstack(pdf["embedding"].to_numpy()).astype("float64")
    ids = pdf["vec_id"].to_numpy()
    queries = emb.filter(F.col("vec_id") < 3)
    got = cosine_topk(emb, queries, k=5).toPandas()
    norms = np.linalg.norm(m, axis=1)
    for qid in range(3):
        qi = np.where(ids == qid)[0][0]
        cos = (m @ m[qi]) / (norms * norms[qi])
        cos_r = np.round(cos, 6)
        order = sorted(
            [(i, c) for i, c in zip(ids, cos_r) if i != qid],
            key=lambda t: (-t[1], t[0]),
        )[:5]
        expect = [int(i) for i, _ in order]
        gq = got[got["query_id"] == qid].sort_values("rank")
        assert list(gq["nbr_id"]) == expect


def test_ann_recall(spark):
    """Recall vs exact top-k on CLUSTERED embeddings (uniform random
    vectors are the LSH worst case: all cosines ~0.2, nothing to find).
    20 clusters of 25 vectors, sigma 0.05 -> intra-cluster cosine ~0.86
    (sigma 0.15 would put the noise norm above the signal norm in 64-d).
    4 planes + 1-bit multiprobe -> expected bucket recall ~0.87."""
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((20, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs, rows = [], []
    i = 0
    for c in range(20):
        for _ in range(25):
            v = centers[c] + 0.05 * rng.standard_normal(64)
            rows.append((i, [float(x) for x in v.astype("float32")]))
            i += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    queries = emb.filter(F.col("vec_id") % 25 == 0).limit(10)
    exact = cosine_topk(emb, queries, k=5).toPandas()
    approx = ann_topk(emb, queries, k=5, n_planes=4, multiprobe=True).toPandas()
    e = {(r.query_id, r.nbr_id) for r in exact.itertuples()}
    a = {(r.query_id, r.nbr_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"ANN recall too low: {recall}"


def test_lsh_buckets_deterministic(spark, emb):
    b1 = lsh_buckets(emb, n_planes=8).select("id", "bucket").toPandas()
    b2 = lsh_buckets(emb, n_planes=8).select("id", "bucket").toPandas()
    assert b1.sort_values("id")["bucket"].tolist() == b2.sort_values("id")["bucket"].tolist()
    assert b1["bucket"].between(0, 255).all()


def test_ann_bucketed_pruned_read(spark, tmp_path):
    """write_bucketed_corpus + ann_topk_bucketed must (a) return exactly
    what ann_topk returns on the same corpus/planes and (b) physically
    read only the probe buckets' partition directories."""
    import numpy as np

    from metadata_crawler_spark.operators.similarity import (
        ann_topk,
        ann_topk_bucketed,
        write_bucketed_corpus,
    )

    rng = np.random.default_rng(11)
    n, dim = 2000, 16
    rows = [(i, [float(x) for x in rng.standard_normal(dim)]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") < 3)
    path = str(tmp_path / "bucketed_corpus")
    write_bucketed_corpus(emb, path, n_planes=6)

    got = ann_topk_bucketed(spark, path, queries, k=5, n_planes=6)
    want = ann_topk(emb, queries, k=5, n_planes=6)
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w and len(g) == 15

    # pruning evidence: the filtered scan touches fewer partition dirs than
    # exist on disk (3 queries x 7 probes <= 21 buckets of 64)
    import os

    all_buckets = {d for d in os.listdir(path) if d.startswith("bucket=")}
    touched = {
        r.f.split("/bucket=")[1].split("/")[0]
        for r in spark.read.parquet(path)
        .filter(F.col("bucket").isin([0, 1]))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert touched <= {"0", "1"} and len(all_buckets) > 2
    plan = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin([0, 1]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan


def _clustered_emb(spark, n_clusters=20, per=25, dim=64, sigma=0.05, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, i = [], 0
    for c in range(n_clusters):
        for _ in range(per):
            v = centers[c] + sigma * rng.standard_normal(dim)
            rows.append((i, [float(x) for x in v.astype("float32")]))
            i += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_recall_beats_probe_budget(spark):
    """IVF (k-means coarse quantizer): on clustered data, nprobe=2 of 16
    data-adaptive cells must recover >=0.9 of the exact top-5."""
    from metadata_crawler_spark.operators.similarity import (
        ivf_topk,
        train_ivf_centroids,
    )

    emb = _clustered_emb(spark).cache()
    cents = train_ivf_centroids(emb, n_cells=16, n_iter=6)
    assert cents.shape == (16, 64)
    queries = emb.filter(F.col("vec_id") % 25 == 0).limit(10)
    exact = cosine_topk(emb, queries, k=5).toPandas()
    approx = ivf_topk(emb, queries, cents, k=5, nprobe=2).toPandas()
    e = {(r.query_id, r.nbr_id) for r in exact.itertuples()}
    a = {(r.query_id, r.nbr_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, f"IVF recall too low: {recall}"


def test_ivf_training_is_deterministic(spark):
    from metadata_crawler_spark.operators.similarity import train_ivf_centroids

    emb = _clustered_emb(spark, n_clusters=6, per=20, dim=8)
    a = train_ivf_centroids(emb, n_cells=4, n_iter=5)
    b = train_ivf_centroids(emb, n_cells=4, n_iter=5)
    assert np.allclose(a, b)


def test_ivf_pruned_matches_and_prunes(spark, tmp_path):
    """write_ivf_corpus + ivf_topk_pruned must equal ivf_topk on the same
    centroids AND physically read only the probe cells' directories."""
    import os

    from metadata_crawler_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        ivf_topk_pruned,
        train_ivf_centroids,
        write_ivf_corpus,
    )

    emb = _clustered_emb(spark, n_clusters=8, per=40, dim=16).cache()
    cents = train_ivf_centroids(emb, n_cells=8, n_iter=5)
    path = str(tmp_path / "ivf_corpus")
    write_ivf_corpus(emb, path, cents)
    queries = emb.filter(F.col("vec_id") < 3)

    got = ivf_topk_pruned(spark, path, queries, cents, k=5, nprobe=2)
    want = ivf_topk(emb, queries, cents, k=5, nprobe=2)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # partition pruning is visible in the plan: the cell IN-list filter
    # must appear as a partition filter, not a post-scan filter
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    probe_cells = {
        int(r["cell"])
        for r in ivf_assign(queries, cents, 2, id_col="vec_id").collect()
    }
    n_cell_dirs = len([d for d in os.listdir(path) if d.startswith("cell=")])
    assert len(probe_cells) < n_cell_dirs  # pruning has something to skip


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------


def _pq_fixture(spark, n=400, dim=16, seed=11):
    import numpy as np

    rng = np.random.default_rng(seed)
    V = rng.standard_normal((n, dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(V)],
        "vec_id long, embedding array<double>",
    )
    return V, df


def test_pq_encode_deterministic_and_shapes(spark):
    import numpy as np

    from metadata_crawler_spark.operators.similarity import pq_encode, train_pq

    V, df = _pq_fixture(spark, n=200)
    books = train_pq(df, m=4, k=16, n_iter=4)
    assert books.shape[0] == 4 and books.shape[2] == 4
    a = {r.id: tuple(r.codes) for r in pq_encode(df, books).collect()}
    b = {r.id: tuple(r.codes) for r in pq_encode(df, books).collect()}
    assert a == b and len(a) == 200
    assert all(len(c) == 4 for c in a.values())
    # codes are argmin vs the codebooks — spot-verify against numpy
    dsub = 4
    for i in range(0, 200, 50):
        for j in range(4):
            sub = V[i, j * dsub:(j + 1) * dsub]
            want = int(((books[j] - sub) ** 2).sum(axis=1).argmin())
            assert a[i][j] == want, (i, j)


def test_pq_adc_equals_exact_on_reconstructible_vectors(spark):
    """Vectors that ARE concatenations of codewords reconstruct exactly,
    so ADC == true squared L2 — the lookup-table math checked end to
    end without approximation error in the way."""
    import numpy as np

    from metadata_crawler_spark.operators.similarity import pq_encode, pq_topk

    rng = np.random.default_rng(3)
    books = rng.standard_normal((2, 4, 3))  # m=2, k=4, dsub=3
    combos = [(a, b) for a in range(4) for b in range(4)]
    V = np.stack([np.concatenate([books[0][a], books[1][b]]) for a, b in combos])
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(V)],
        "vec_id long, embedding array<double>",
    )
    codes = pq_encode(df, books)
    q = df.filter("vec_id = 0")
    got = {
        r.nbr_id: r.adc for r in pq_topk(codes, q, books, k=15).collect()
    }
    for nbr, adc in got.items():
        true = float(((V[0] - V[nbr]) ** 2).sum())
        assert abs(adc - true) < 1e-6, (nbr, adc, true)


def test_pq_topk_recall_vs_exact(spark):
    import numpy as np

    from metadata_crawler_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        train_pq,
    )

    V, df = _pq_fixture(spark)
    books = train_pq(df, m=8, k=32, n_iter=6)
    codes = pq_encode(df, books)
    queries = df.filter("vec_id < 8")
    out = pq_topk(codes, queries, books, k=10).collect()
    got = {}
    for r in out:
        got.setdefault(r.query_id, set()).add(r.nbr_id)
    recalls = []
    for qid in range(8):
        d = ((V - V[qid]) ** 2).sum(axis=1)
        d[qid] = np.inf
        true10 = set(np.argsort(d)[:10].tolist())
        recalls.append(len(got[qid] & true10) / 10)
    assert sum(recalls) / len(recalls) >= 0.5, recalls  # m=8 on dim 16
    # every query returned exactly k ranked rows
    from collections import Counter

    per_q = Counter(r.query_id for r in out)
    assert all(v == 10 for v in per_q.values())
    assert all(1 <= r.rank <= 10 for r in out)


def test_ivfpq_pruned_reads_only_probe_cells(spark, tmp_path):
    import numpy as np

    from metadata_crawler_spark.operators.similarity import (
        ivfpq_topk_pruned,
        pq_encode,
        pq_topk,
        train_ivf_centroids,
        train_pq,
        write_ivfpq_corpus,
    )

    V, df = _pq_fixture(spark, n=300, dim=16, seed=5)
    cents = train_ivf_centroids(df, n_cells=8, n_iter=4)
    books = train_pq(df, m=4, k=16, n_iter=4)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_corpus(df, path, cents, books)
    # the standing index holds codes + cell only — no embeddings on disk
    stored = spark.read.parquet(path)
    assert set(stored.columns) == {"id", "codes", "cell"}
    queries = df.filter("vec_id < 4")
    out = ivfpq_topk_pruned(
        spark, path, queries, cents, books, k=5, nprobe=8
    )
    # nprobe == n_cells -> same results as unpruned ADC over all codes
    full = pq_topk(stored.select("id", "codes"), queries, books, k=5)
    a = sorted((r.query_id, r.nbr_id, r.adc) for r in out.collect())
    b = sorted((r.query_id, r.nbr_id, r.adc) for r in full.collect())
    assert a == b
    # partition pruning reaches the scan
    probe_plan = ivfpq_topk_pruned(
        spark, path, queries, cents, books, k=5, nprobe=2
    )
    rows = probe_plan.collect()
    assert {r.query_id for r in rows} == {0, 1, 2, 3}
    assert all(1 <= r.rank <= 5 for r in rows)


def test_pq_topk_in_corpus_query_single_partition(spark):
    """Self-row slot bug regression: a query IN the corpus on a
    single-partition codes table must still return exactly k rows —
    the local top-k keeps k+1 slots so the ~0-ADC self row cannot
    displace the batch's true k-th candidate before the filter."""
    from metadata_crawler_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        train_pq,
    )

    _, df = _pq_fixture(spark)
    books = train_pq(df, m=8, k=32, n_iter=6)
    codes = pq_encode(df, books).coalesce(1)
    queries = df.filter("vec_id < 4")
    out = pq_topk(codes, queries, books, k=5).collect()
    from collections import Counter

    per_q = Counter(r.query_id for r in out)
    assert dict(per_q) == {q: 5 for q in range(4)}
    assert all(r.query_id != r.nbr_id for r in out)


def test_ann_bucketed_respects_seed(spark, tmp_path):
    """A corpus bucketed with a non-default LSH seed must be queried
    with the same planes: seed-matched bucketed results equal the
    in-memory path with that seed."""
    from metadata_crawler_spark.operators.similarity import (
        ann_topk,
        ann_topk_bucketed,
        write_bucketed_corpus,
    )

    rng = __import__("numpy").random.default_rng(3)
    rows = [(i, rng.standard_normal(16).tolist()) for i in range(300)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = corpus.filter("vec_id < 5")
    path = str(tmp_path / "seeded_corpus")
    write_bucketed_corpus(corpus, path, n_planes=6, seed=42)
    got = ann_topk_bucketed(
        spark, path, queries, k=3, n_planes=6, seed=42
    ).collect()
    want = ann_topk(corpus, queries, k=3, n_planes=6, seed=42).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted(
        [(r.query_id, r.nbr_id, r.rank) for r in got]
    ) == sorted([(r.query_id, r.nbr_id, r.rank) for r in want])

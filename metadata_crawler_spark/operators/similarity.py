"""Similarity search over embedding columns (array<float>).

- cosine_topk        brute-force exact top-k (the correctness baseline):
                     broadcast the query set, one pass over the corpus,
                     per-query top-k window. All builtin exprs.
- lsh_buckets        random-hyperplane LSH bucketing (deterministic
                     planes from a seeded numpy RNG, applied as ONE
                     vectorized pandas UDF matmul per batch).
- ann_topk           bucketed ANN: candidates = same bucket (+ optional
                     multiprobe 1-bit flips), then exact cosine re-rank.
                     The 10^10-row path: the corpus is pre-bucketed and
                     written partitioned by bucket, so a query only scans
                     its probe buckets (partition pruning).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _cos(v: str, w: str):
    dot = F.aggregate(
        F.zip_with(v, w, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    nv = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    nw = F.sqrt(F.aggregate(F.transform(w, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    return dot / (nv * nw)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (query set broadcast).
    Deterministic ranking: (round(cos,6) DESC, neighbor id ASC) — rounding
    makes the order reproducible across engines/instruction orders."""
    def _norm(v):
        return F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            )
        )

    # r6 (guide §1.2 per-task work): hoist each side's L2 norm out of the
    # join — it used to be recomputed per (corpus x query) PAIR inside
    # _cos (|Q|x the work on the corpus side). Same float ops in the same
    # order (sqrt of the identical fold), so cosine is bit-identical.
    c = corpus.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nv", _norm(F.col("v")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("w"),
    ).withColumn("nw", _norm(F.col("w")))
    j = c.join(F.broadcast(q), F.col("nbr_id") != F.col("query_id"))
    dot = F.aggregate(
        F.zip_with("v", "w", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = j.select(
        "query_id",
        "nbr_id",
        F.round(dot / (F.col("nv") * F.col("nw")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def _planes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((dim, n_planes))


def lsh_buckets(
    df: DataFrame,
    n_planes: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket int): sign pattern against n deterministic hyperplanes.
    One numpy matmul per Arrow batch — the whole batch at once."""

    @F.pandas_udf(T.IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        # float64 so the sign test agrees with any float64 re-computation
        # (e.g. the DuckDB oracle) regardless of the stored vector width
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        planes = _planes(m.shape[1], n_planes, seed)
        bits = (m @ planes) > 0
        out = np.zeros(len(vecs), dtype=np.int32)
        for i in range(n_planes):
            out |= bits[:, i].astype(np.int32) << i
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        bucket(F.col(vec_col)).alias("bucket"),
    )


def write_bucketed_corpus(
    corpus: DataFrame,
    path: str,
    n_planes: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the corpus PARTITIONED BY its LSH bucket (Iceberg analog:
    ``PARTITIONED BY bucket(n, col)``): the one-time bucketing cost buys
    every subsequent ANN query partition pruning — only the probe buckets'
    files are ever read (ann_topk_bucketed). This is the 10^10-vector
    path; ann_topk recomputes buckets per call and scans everything."""
    lsh_buckets(corpus, n_planes, seed, id_col=id_col, vec_col=vec_col).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(path)


def _rerank_topk(cand: DataFrame, k: int) -> DataFrame:
    scored = cand.select(
        "query_id",
        "nbr_id",
        F.round(
            _cos(F.col("v").cast("array<double>"), F.col("w").cast("array<double>")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.dropDuplicates(["query_id", "nbr_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def _probe_queries(
    queries: DataFrame, n_planes: int, multiprobe: bool, id_col: str,
    vec_col: str, seed: int = 7,
) -> DataFrame:
    qb = lsh_buckets(queries, n_planes, seed, id_col=id_col, vec_col=vec_col)
    if not multiprobe:
        return qb.select(
            F.col("id").alias("query_id"), F.col("vec").alias("w"), "bucket"
        )
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << i)).cast("int")
            for i in range(n_planes)
        ],
    )
    return qb.select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("w"),
        F.explode(probes).alias("bucket"),
    )


def ann_topk_bucketed(
    spark,
    corpus_path: str,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """ANN top-k against a write_bucketed_corpus() table: the probe-bucket
    set (small — queries x (n_planes+1)) becomes an IN-list partition
    filter, so the scan reads ONLY those bucket directories. Identical
    results to ann_topk on the same corpus/planes (tested).
    ``seed`` MUST match the write_bucketed_corpus seed: query buckets
    from different planes than the corpus partitions would candidate
    essentially at random (recall silently collapses)."""
    # collect the probe set ONCE (small by construction: queries x
    # (n_planes+1) rows) and rebuild it as a local DataFrame — both the
    # IN-list partition filter and the broadcast side come from the same
    # collected rows, with no persist to leak executor cache (ADVICE r2)
    probe_df = _probe_queries(
        queries, n_planes, multiprobe, id_col, vec_col, seed=seed
    )
    rows = probe_df.collect()
    probe_buckets = sorted({int(r["bucket"]) for r in rows})
    qb = spark.createDataFrame(rows, probe_df.schema)
    corpus = spark.read.parquet(corpus_path).filter(
        F.col("bucket").isin(probe_buckets)
    )
    cand = corpus.select(
        F.col("id").alias("nbr_id"), F.col("vec").alias("v"), "bucket"
    ).join(F.broadcast(qb), "bucket").filter(F.col("nbr_id") != F.col("query_id"))
    return _rerank_topk(cand, k)


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: equi-join on LSH bucket (queries multiprobe their
    bucket plus every 1-bit flip), exact cosine re-rank inside candidates.
    Recall is tested against cosine_topk in tests/test_similarity.py.
    Buckets are recomputed per call — for a standing corpus use
    write_bucketed_corpus + ann_topk_bucketed (partition-pruned reads)."""
    cb = lsh_buckets(corpus, n_planes, seed, id_col=id_col, vec_col=vec_col)
    qb = _probe_queries(
        queries, n_planes, multiprobe, id_col, vec_col, seed=seed
    )
    cand = cb.select(
        F.col("id").alias("nbr_id"), F.col("vec").alias("v"), "bucket"
    ).join(F.broadcast(qb), "bucket").filter(F.col("nbr_id") != F.col("query_id"))
    return _rerank_topk(cand, k)


# -- IVF (inverted-file) ANN: k-means coarse quantizer --------------------
#
# The second scale path next to hyperplane LSH (ann_topk): train k
# centroids, assign every corpus vector to its nearest cell, write the
# corpus partitioned by cell; a query probes only its nprobe nearest
# cells. Vs LSH: data-adaptive cells follow the embedding distribution
# (better recall at equal candidate counts on clustered data), at the
# cost of a training pass. Centroids are tiny (k x dim floats) and ride
# a broadcast/closure; assignment is ONE vectorized numpy matmul per
# Arrow batch — same shape as lsh_buckets.

def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 64,
    n_iter: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed Lloyd's: init = deterministic sample of corpus vectors;
    per iteration, assignment is a mapInPandas matmul and the centroid
    update is posexplode -> groupBy (cell, dim) avg -> collect (k x dim
    rows — tiny). Everything heavy stays on executors; only centroid
    coordinates ever reach the driver."""
    vecs = corpus.select(F.col(vec_col).cast("array<double>").alias("vec"))
    # deterministic seed sample: first n_cells vectors by a stable hash
    # order (cheap, reproducible; kmeans++ would need k passes)
    init = (
        corpus.select(
            F.col(vec_col).cast("array<double>").alias("vec"),
            F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)).alias("h"),
        )
        .orderBy("h")
        .limit(n_cells)
        .collect()
    )
    cents = np.array([r["vec"] for r in init], dtype=np.float64)
    if cents.shape[0] < n_cells:
        n_cells = cents.shape[0]
    for _ in range(n_iter):
        assigned = ivf_assign(vecs, cents, vec_col="vec")
        sums = (
            assigned.select("cell", F.posexplode("vec").alias("d", "x"))
            .groupBy("cell", "d")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = cents.copy()
        counts = np.zeros(n_cells)
        for r in sums:
            new[r["cell"], r["d"]] = r["s"] / r["n"]
            counts[r["cell"]] = r["n"]
        # empty cells keep their previous centroid (standard practice)
        if np.allclose(new, cents, atol=1e-9):
            cents = new
            break
        cents = new
    return cents


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    nprobe: int = 1,
    id_col: str | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add the nearest-centroid ``cell`` (nprobe=1) or explode the
    ``nprobe`` nearest cells per row (queries). One numpy matmul per
    Arrow batch against the broadcast centroid matrix; distance via the
    ||c||^2 - 2 v.c expansion (||v||^2 is rank-invariant)."""
    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    c_norm2 = (cents**2).sum(axis=1)
    n = cents.shape[0]
    k = min(nprobe, n)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def cells(vs: pd.Series) -> pd.Series:
        m = np.stack(vs.map(lambda v: np.asarray(v, dtype=np.float64)))
        d = c_norm2[None, :] - 2.0 * (m @ cents.T)  # (batch, n_cells)
        if k == 1:
            idx = d.argmin(axis=1)[:, None]
        else:
            part = np.argpartition(d, k - 1, axis=1)[:, :k]
            order = np.take_along_axis(d, part, axis=1).argsort(axis=1)
            idx = np.take_along_axis(part, order, axis=1)
        return pd.Series([row.astype("int32").tolist() for row in idx])

    out_cols = ([F.col(id_col).alias("id")] if id_col else []) + [
        F.col(vec_col).alias("vec"),
        cells(F.col(vec_col).cast("array<double>")).alias("_cells"),
    ]
    assigned = df.select(*out_cols)
    if k == 1:
        return assigned.withColumn(
            "cell", F.element_at("_cells", 1)
        ).drop("_cells")
    return assigned.withColumn("cell", F.explode("_cells")).drop("_cells")


def write_ivf_corpus(
    corpus: DataFrame,
    path: str,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the corpus PARTITIONED BY IVF cell (the inverted file):
    queries then read only their nprobe cells' directories — the same
    partition-pruned standing-corpus contract as write_bucketed_corpus."""
    ivf_assign(corpus, centroids, 1, id_col=id_col, vec_col=vec_col).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: candidates = corpus rows in any of the query's nprobe
    nearest cells (equi-join on cell, never cross), exact cosine re-rank.
    Recall vs cosine_topk is pinned in tests/test_similarity.py."""
    cb = ivf_assign(corpus, centroids, 1, id_col=id_col, vec_col=vec_col)
    qb = ivf_assign(queries, centroids, nprobe, id_col=id_col, vec_col=vec_col)
    cand = cb.select(
        F.col("id").alias("nbr_id"), F.col("vec").alias("v"), "cell"
    ).join(
        F.broadcast(qb.select(F.col("id").alias("query_id"), F.col("vec").alias("w"), "cell")),
        "cell",
    ).filter(F.col("nbr_id") != F.col("query_id"))
    return _rerank_topk(cand, k)


def ivf_topk_pruned(
    spark,
    corpus_path: str,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN against a write_ivf_corpus() table: the probe-cell set
    becomes an IN-list partition filter (collected once — queries x
    nprobe rows, tiny), so the scan touches only those cell dirs."""
    probe = ivf_assign(
        queries, centroids, nprobe, id_col=id_col, vec_col=vec_col
    ).select(F.col("id").alias("query_id"), F.col("vec").alias("w"), "cell")
    rows = probe.collect()
    cells_ = sorted({int(r["cell"]) for r in rows})
    qdf = spark.createDataFrame(rows, probe.schema)
    corpus = spark.read.parquet(corpus_path).filter(F.col("cell").isin(cells_))
    cand = corpus.select(
        F.col("id").alias("nbr_id"), F.col("vec").alias("v"), "cell"
    ).join(F.broadcast(qdf), "cell").filter(F.col("nbr_id") != F.col("query_id"))
    return _rerank_topk(cand, k)


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011) — the memory tier under IVF:
# each vector compresses to m one-byte codes (dim*4 bytes -> m bytes,
# 16-64x), and queries score candidates WITHOUT touching the original
# vectors via asymmetric distance (ADC) lookup tables. At 10^10 vectors
# this is the difference between the index fitting on the cluster or not.
# ---------------------------------------------------------------------------


def train_pq(
    corpus: DataFrame,
    m: int = 4,
    k: int = 256,
    n_iter: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train (m, k_eff, dim/m) PQ codebooks: the vector splits into m
    subspaces and each gets its own k-means codebook via the SAME
    distributed Lloyd's as IVF (train_ivf_centroids over sliced
    vectors) — m small passes, every heavy step on executors, only
    k x dsub floats per subspace reach the driver. k_eff <= k when the
    corpus has fewer distinct seed vectors (tiny fixtures)."""
    dim = int(corpus.select(F.size(F.col(vec_col)).alias("d")).first()["d"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = []
    for j in range(m):
        sub = corpus.select(
            F.col(id_col).alias("vec_id"),
            F.slice(
                F.col(vec_col).cast("array<double>"), j * dsub + 1, dsub
            ).alias("embedding"),
        )
        books.append(
            train_ivf_centroids(sub, n_cells=k, n_iter=n_iter, seed=seed + j)
        )
    k_eff = min(b.shape[0] for b in books)
    return np.stack([b[:k_eff] for b in books])


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple = (),
) -> DataFrame:
    """(id, [keep_cols...,] codes array<int>): per subspace, the nearest
    codeword's index — one numpy matmul per (subspace, Arrow batch)
    against the broadcast codebooks; deterministic (first-min ties). The
    codes table IS the compressed index a standing corpus persists.
    ``keep_cols`` carries extra columns (e.g. the IVF cell) through the
    projection so callers don't need a second pass + join."""
    cb = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, _k, dsub = cb.shape
    norms = (cb**2).sum(axis=2)  # (m, k)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(vs: pd.Series) -> pd.Series:
        V = np.stack(vs.map(lambda v: np.asarray(v, dtype=np.float64)))
        out = np.empty((V.shape[0], m), dtype=np.int32)
        for j in range(m):
            sub = V[:, j * dsub : (j + 1) * dsub]
            d = norms[j][None, :] - 2.0 * (sub @ cb[j].T)
            out[:, j] = d.argmin(axis=1)
        return pd.Series([row.tolist() for row in out])

    return df.select(
        F.col(id_col).alias("id"),
        *keep_cols,
        encode(F.col(vec_col).cast("array<double>")).alias("codes"),
    )


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k over a PQ codes table: each query
    precomputes an (m, k_codes) lookup table of exact subspace distances
    to every codeword; a candidate's approximate squared L2 is then m
    table gathers + a sum — the original vectors are NEVER read. All
    query LUTs broadcast together ((n_queries, m, k) floats); each Arrow
    batch keeps only its LOCAL top-k per query, so at most
    partitions x queries x k rows reach the final per-query rank.
    Returns (query_id, nbr_id, adc, rank)."""
    cb = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, _kc, dsub = cb.shape
    qrows = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>")
    ).collect()
    qids = np.array([r[0] for r in qrows])
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    luts = np.stack(
        [
            ((cb[j][None, :, :] - Q[:, j * dsub : (j + 1) * dsub][:, None, :]) ** 2).sum(
                axis=2
            )
            for j in range(m)
        ],
        axis=1,
    )  # (n_queries, m, k_codes)
    spark = codes.sparkSession
    bc = spark.sparkContext.broadcast((qids, luts))
    # id-generic: string/long ids both pass through numpy object arrays;
    # the output columns take the QUERIES' id type
    id_type = dict(queries.dtypes)[id_col]
    out_schema = f"query_id {id_type}, nbr_id {id_type}, adc double"

    def score(it):
        qids_, luts_ = bc.value
        nq = len(qids_)
        for pdf in it:
            C = np.stack(pdf["codes"].map(np.asarray))  # (b, m)
            ids = pdf["id"].to_numpy()
            # adc[b, q] = sum_j luts[q, j, C[b, j]]
            adc = np.zeros((C.shape[0], nq))
            for j in range(m):
                adc += luts_[:, j, :][:, C[:, j]].T  # (b, nq)
            # k+1 local slots: when the query vector itself lives in
            # this batch its ~0-ADC self row takes one slot, and the
            # post-filter would otherwise permanently lose the batch's
            # true k-th candidate before the global rank
            kk = min(k + 1, C.shape[0])
            part = np.argpartition(adc, kk - 1, axis=0)[:kk]  # (kk, nq)
            rows = {
                "query_id": np.repeat(qids_, kk),
                "nbr_id": ids[part].T.reshape(-1),
                "adc": np.take_along_axis(adc, part, axis=0).T.reshape(-1),
            }
            yield pd.DataFrame(rows)

    local = codes.mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("nbr_id").asc()
    )
    return (
        local.filter(F.col("query_id") != F.col("nbr_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", F.round("adc", 6).alias("adc"), "rank")
    )


def write_ivfpq_corpus(
    corpus: DataFrame,
    path: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """The composed IVF-PQ index (the FAISS IVFPQ shape): PQ codes
    PARTITIONED BY IVF cell. Disk holds m bytes + a cell id per vector;
    queries read only their nprobe cell directories AND score from
    codes — the original embedding column appears nowhere in the
    standing index."""
    # ONE assignment pass: 'cell' rides through the encode projection
    # instead of a second corpus-wide matmul + an id-keyed self-join
    assigned = ivf_assign(corpus, centroids, 1, id_col=id_col, vec_col=vec_col)
    codes = pq_encode(
        assigned.select(F.col("id").alias("vec_id"), "vec", "cell"),
        codebooks,
        id_col="vec_id",
        vec_col="vec",
        keep_cols=("cell",),
    )
    codes.write.mode("overwrite").partitionBy("cell").parquet(path)


def ivfpq_topk_pruned(
    spark,
    corpus_path: str,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k against a write_ivfpq_corpus() index: the queries'
    nprobe nearest cells become an IN-list partition filter (the
    ivf_topk_pruned contract), then pq_topk scores ONLY those cells'
    codes from broadcast lookup tables. Returns
    (query_id, nbr_id, adc, rank) — candidates limited to the probed
    cells, exactly IVF-PQ's recall/latency trade."""
    probe = ivf_assign(
        queries, centroids, nprobe, id_col=id_col, vec_col=vec_col
    ).select("id", "cell")
    cells_ = sorted({int(r["cell"]) for r in probe.collect()})
    codes = spark.read.parquet(corpus_path).filter(F.col("cell").isin(cells_))
    return pq_topk(
        codes.select("id", "codes"), queries, codebooks,
        k=k, id_col=id_col, vec_col=vec_col,
    )

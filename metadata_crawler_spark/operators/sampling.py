"""Data-selection sampling for pretraining mixes.

- DSIR (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling"): importance log-weight of a raw document =
  sum over its hashed n-gram occurrences of log(p_target / p_raw) under
  bucketed unigram models of a small target corpus vs the raw pool, then
  resample proportionally. Feature hashing reuses
  functions.quality.hashed_ngram_buckets (JVM, dual xxhash64/md5 hasher);
  scoring reuses the broadcast-dense-vector + Arrow gather shape of the
  quality classifier (sum readout instead of sigmoid-of-mean).
- Deterministic randomness: every sampling decision derives from
  ``hash_uniform`` (md5/xxhash64 of the row id + seed), never ``F.rand``
  — rerunning on a different cluster size or partitioning yields the
  SAME sample, and the DuckDB oracle can recompute it bit-for-bit.
- ``gumbel_topk``: exact sampling WITHOUT replacement of k docs with
  probability proportional to exp(logw/T) (Gumbel-max trick); the top-k
  is Spark's TakeOrderedAndProject — per-partition heaps, no full sort.
- ``temperature_sample``: domain/language rebalancing (multinomial
  temperature alpha as in multilingual pretraining): per-domain keep
  probabilities from one tiny groupBy (#domains rows to the driver),
  applied via a broadcast map + hash_uniform Bernoulli thinning.

Reference analog: the reference's only sampling is max-files truncation
(SURVEY §2.2 F5); everything here is LLM-pipeline surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.quality import hashed_ngram_buckets

_U_M = 1 << 30  # uniform grid: (h mod M + 0.5) / M keeps u off 0 and 1


def hash_uniform(key: Column, seed: int = 0, hasher: str = "xxhash64") -> Column:
    """Deterministic uniform(0,1) from a key column — reproducible across
    cluster sizes and recomputable by the DuckDB oracle (md5 path);
    hasher dispatch shared via functions/quality.hash64_expr."""
    from ..functions.quality import hash64_expr

    s = F.concat(key.cast("string"), F.lit(f":{int(seed)}"))
    h = hash64_expr(s, hasher)
    return (F.pmod(h, F.lit(_U_M)) + F.lit(0.5)) / F.lit(float(_U_M))


def dsir_logratio(
    target_df: DataFrame,
    raw_df: DataFrame,
    text_col: str,
    n_buckets: int = 1 << 20,
    ngram_sizes: tuple[int, ...] = (1, 2),
    hasher: str = "xxhash64",
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-bucket importance log-ratio table (bucket, logratio):
    ln p_target(bucket) - ln p_raw(bucket) under add-``smoothing``
    bucketed bag-of-ngram models. One explode + one bucket-keyed groupBy
    per corpus (partial aggregation shrinks both map-side); only the two
    scalar gram totals reach the driver."""

    def bucket_counts(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.explode(
                    hashed_ngram_buckets(
                        F.col(text_col), n_buckets, ngram_sizes, hasher
                    )
                ).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count("*").cast("double").alias("cnt"))
        )

    # persisted: each tiny (<= n_buckets rows) table is consumed twice
    # (the totals action below + the returned joined plan) — without
    # this the full-corpus explode+groupBy scans ran twice each
    t = bucket_counts(target_df).withColumnRenamed("cnt", "t_cnt").persist()
    r = bucket_counts(raw_df).withColumnRenamed("cnt", "r_cnt").persist()
    t_tot = float(t.agg(F.sum("t_cnt")).first()[0] or 0.0)
    r_tot = float(r.agg(F.sum("r_cnt")).first()[0] or 0.0)
    a, b = float(smoothing), float(n_buckets)
    joined = t.join(r, "bucket", "full").select(
        "bucket",
        (
            F.log((F.coalesce("t_cnt", F.lit(0.0)) + a) / F.lit(t_tot + a * b))
            - F.log((F.coalesce("r_cnt", F.lit(0.0)) + a) / F.lit(r_tot + a * b))
        ).alias("logratio"),
    )
    return joined


def dsir_score(
    df: DataFrame,
    text_col: str,
    logratio,
    score_col: str = "dsir_logw",
    n_buckets: int = 1 << 20,
    ngram_sizes: tuple[int, ...] = (1, 2),
    hasher: str = "xxhash64",
) -> DataFrame:
    """Per-doc importance log-weight: SUM of logratio over the doc's gram
    occurrences (the DSIR paper's log importance weight — a sum, not the
    classifier's mean). Same 100 TB shape as quality_classifier_score:
    dense broadcast vector (8 MB at 2^20), Arrow-batch gather + bincount,
    zero shuffles. Buckets absent from the table contribute 0 (their
    target and raw smoothed masses cancel only approximately; 0 is the
    standard unseen default). Featureless/NULL docs score 0."""
    if isinstance(logratio, DataFrame):
        w = np.zeros(n_buckets, dtype=np.float64)
        for bucket, lr in logratio.collect():
            w[int(bucket)] = float(lr)
    else:
        w = np.asarray(logratio, dtype=np.float64)
        if w.shape != (n_buckets,):
            raise ValueError(f"logratio shape {w.shape} != ({n_buckets},)")
    bc = df.sparkSession.sparkContext.broadcast(w)

    @F.pandas_udf("double")
    def _sum_logw(buckets: pd.Series) -> pd.Series:
        arrs = [
            np.asarray(a if a is not None else [], dtype=np.int64)
            for a in buckets
        ]
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        if lens.sum() == 0:
            return pd.Series(np.zeros(len(arrs)))
        flat = np.concatenate([a for a in arrs if len(a)])
        sums = np.bincount(
            np.repeat(np.arange(len(arrs)), lens),
            weights=bc.value[flat],
            minlength=len(arrs),
        )
        return pd.Series(sums)

    return df.withColumn(
        score_col,
        _sum_logw(
            hashed_ngram_buckets(F.col(text_col), n_buckets, ngram_sizes, hasher)
        ),
    )


def bernoulli_importance_sample(
    df: DataFrame,
    logw_col: str,
    id_col: str,
    temperature: float = 1.0,
    center: float = 0.0,
    seed: int = 0,
    hasher: str = "xxhash64",
    keep_col: str = "keep",
) -> DataFrame:
    """Bernoulli thinning with keep probability sigmoid((logw - center)/T)
    — the streaming-friendly DSIR variant (no global normalizer): each
    row's decision is local + deterministic, so the sample is reproducible
    and oracle-checkable. ``center`` shifts the operating point (raw DSIR
    sums are offset by the corpus-size ratio; set it near the corpus
    median logw, e.g. from approxQuantile, to target ~50% keep at the
    median). Adds (keep_prob, keep)."""
    p = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(
            -(F.col(logw_col) - F.lit(float(center)))
            / F.lit(float(temperature))
        )
    )
    u = hash_uniform(F.col(id_col), seed, hasher)
    return df.withColumn("keep_prob", p).withColumn(keep_col, u < p)


def gumbel_topk(
    df: DataFrame,
    logw_col: str,
    id_col: str,
    k: int,
    temperature: float = 1.0,
    seed: int = 0,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Exact k-sample without replacement ~ exp(logw/T) via the Gumbel-max
    trick: key = logw/T - ln(-ln(u)), take the k largest. Spark compiles
    orderBy+limit to per-partition top-k heaps (TakeOrderedAndProject) —
    no global sort materializes."""
    u = hash_uniform(F.col(id_col), seed, hasher)
    key = F.col(logw_col) / F.lit(float(temperature)) - F.log(-F.log(u))
    return (
        df.withColumn("_gumbel_key", key)
        .orderBy(F.desc("_gumbel_key"), F.asc(id_col))
        .limit(int(k))
        .drop("_gumbel_key")
    )


def temperature_sample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    alpha: float = 0.7,
    n_target: int | None = None,
    seed: int = 0,
    hasher: str = "xxhash64",
    keep_col: str = "keep",
) -> DataFrame:
    """Domain rebalancing by multinomial temperature: target share of
    domain d is c_d^alpha / sum_e c_e^alpha (alpha < 1 flattens the head,
    the standard multilingual/domain-mix recipe). Keep probabilities are
    derived driver-side from one #domains-row groupBy, capped at 1, and
    applied as deterministic Bernoulli thinning. ``n_target`` defaults to
    the largest total for which no domain caps (max achievable exact mix).

    Adds (keep_prob, keep). Expected kept count ~= n_target with the mix
    proportions exact for uncapped domains.

    Scale shape (VERDICT r5 item 4): the per-domain counts NEVER collect
    to the driver — at web scale there are ~10^7 registrable domains, an
    unbounded dict. The counts table is localCheckpoint-ed once (one
    scan of ``df``), the two normalizing scalars (Z and the default
    ``n_target``) ride bounded 1-row aggregates over it, and keep_prob
    attaches via a null-safe equi-join (broadcast while the domain table
    is provably small — bounded limit-probe — else a shuffle join AQE
    plans; NULL domains are a join key like any other under eqNullSafe,
    so the old explicit NULL branch is gone)."""
    from ..operators.frontier import small_enough_to_broadcast

    counts = (
        df.groupBy(F.col(domain_col).alias("_d"))
        .agg(F.count("*").alias("_c"))
        .localCheckpoint(eager=False)
    )
    a = float(alpha)
    share = F.pow(F.col("_c").cast("double"), F.lit(a))
    head = counts.agg(
        F.sum(share).alias("_z"), F.count(F.lit(1)).alias("_n")
    ).collect()[0]
    if not int(head["_n"]):
        return df.withColumn("keep_prob", F.lit(0.0)).withColumn(
            keep_col, F.lit(False)
        )
    z = float(head["_z"])
    if n_target is None:
        # largest N with p_d = share_d * N / c_d <= 1 for every domain
        # (1-row aggregate — the same min the driver loop computed)
        n_target = int(
            counts.agg(
                F.min(F.col("_c") / (share / F.lit(z)))
            ).collect()[0][0]
        )
    probs = counts.select(
        "_d",
        F.least(
            F.lit(1.0),
            share / F.lit(z) * F.lit(float(n_target)) / F.col("_c"),
        ).alias("keep_prob"),
    )
    if small_enough_to_broadcast(probs):
        probs = F.broadcast(probs)
    joined = df.join(
        probs, F.col(domain_col).eqNullSafe(F.col("_d")), "left"
    ).drop("_d")
    u = hash_uniform(F.col(id_col), seed, hasher)
    return joined.withColumn(
        "keep_prob", F.coalesce(F.col("keep_prob"), F.lit(0.0))
    ).withColumn(keep_col, u < F.col("keep_prob"))


def split_by_group(
    df: DataFrame,
    group_col: str,
    fracs: dict[str, float],
    seed: int = 0,
    hasher: str = "xxhash64",
    split_col: str = "split",
) -> DataFrame:
    """Leakage-free train/val/test assignment: every row of a GROUP (host,
    domain, cluster id) lands in the SAME split, so near-duplicates and
    same-site pages can never straddle the train/eval boundary — the
    standard contamination-safe split for web corpora (split by host, or
    by near-dup cluster id from `neardup_clusters`).

    Deterministic and cluster-size-independent: the group key hashes to
    uniform(0,1) (`hash_uniform`, seeded) and the CDF over ``fracs``
    (entries in sorted-key order) picks the split — a pure map-side
    column expression, zero shuffles, reproducible on any executor count
    and recomputable by a SQL oracle via the md5 hasher.

    ``fracs`` must sum to ~1 (validated); rows with NULL group go to the
    LAST split in sorted order (deterministic, never silently dropped).
    """
    total = sum(fracs.values())
    if not fracs or abs(total - 1.0) > 1e-9:
        raise ValueError(f"fracs must sum to 1, got {fracs!r} (sum={total})")
    u = hash_uniform(F.col(group_col), seed, hasher)
    names = sorted(fracs)
    expr = None
    cdf = 0.0
    for name in names[:-1]:
        cdf += fracs[name]
        cond = u < F.lit(cdf)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(
        split_col, F.when(F.col(group_col).isNull(), last).otherwise(out)
    )


def select_by_budget(
    df: DataFrame,
    score_col: str,
    tokens_col: str,
    budget: int,
    id_col: str,
    keep_col: str = "keep",
) -> DataFrame:
    """Greedy token-budget selection: keep the highest-``score_col`` docs
    whose cumulative ``tokens_col`` stays within ``budget`` — the "train
    on the best N tokens" selection step (FineWeb-Edu-style classifier-
    score ranking meets a fixed compute budget).

    Distributed greedy without a global sort bottleneck: rows range-
    partition on the composite key (score DESC via negation with NULLs
    coalesced to -inf so they rank last, id ASC for deterministic ties),
    each partition scans locally, and one bounded #partitions-row collect
    chains the offsets (`packing.with_prefix_sum` — the same two-phase
    prefix scan the sequence packer uses). A doc is kept iff its
    INCLUSIVE cumulative token count <= budget, so the output never
    overshoots; the first over-budget doc and everything ranked below it
    get ``keep = false``.

    Appends (cum_tokens_before, keep); all input columns survive.
    """
    from .packing import with_prefix_sum

    key = F.struct(
        (-F.coalesce(F.col(score_col), F.lit(float("-inf")))).alias("ns"),
        F.col(id_col).alias("i"),
    )
    # NULL token counts -> 0 BEFORE the prefix sum: a NULL would make
    # keep NULL (not a boolean) and silently contribute nothing to
    # later rows' cumulative usage
    df = df.withColumn(
        tokens_col, F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))
    )
    scanned = with_prefix_sum(
        df.withColumn("_ord", key), "_ord", tokens_col,
        out_col="cum_tokens_before",
    )
    return scanned.withColumn(
        keep_col,
        (F.col("cum_tokens_before") + F.col(tokens_col)) <= F.lit(int(budget)),
    ).drop("_ord")

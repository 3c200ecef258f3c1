"""URL-seen membership: sharded Bloom filter + exact hash-pair table.

Reference parity: the reference's seen-set is *implicit* — the catalogue
store's unique index on the schema's unique key makes every re-crawled path
an upsert instead of a duplicate (/root/reference/src/metadata_crawler/api/
stores/mongodb.py:135-166 UpdateOne upsert; postgresql.py:240-264
ON CONFLICT DO UPDATE; epoch re-stamping api/stores/base.py:411-425).
That design serializes membership through one database.

Spark-native redesign (north rule): membership = two tiers keyed on the
128-bit xxhash of the canonical URL —

1. **Sharded Bloom filter** (approximate, no false negatives): one bitmap
   per shard, shard = pmod(hash_hi, S). Built per shard with
   ``applyInPandas`` (numpy bit ops, no per-row Python); persisted as a
   tiny table ``(shard, bloom binary, n_items, m_bits, k)``; evolves
   across rounds by bitwise-OR union (no rebuild — SURVEY §7 hard part b).
2. **Exact hash-pair table** — only consulted for the Bloom "maybe" slice
   via a ``left_anti`` join, so at 10^10 URLs the expensive join touches
   ~fpr of candidates instead of all of them.

Probe strategies:
- ``probe_with_broadcast`` — bitmaps collected+broadcast, vectorized
  pandas UDF. Right when total bloom bytes fit in executor memory
  (local mode, or small frontiers).
- ``probe_cogrouped``   — candidates co-grouped with their shard's bitmap
  via ``groupby(shard).cogroup(...).applyInPandas``. Nothing is broadcast;
  shuffle moves only candidate rows. This is the 10^10-URL path: a
  10-bits/key filter over 10^10 keys is ~12 GB total but only
  12 GB / S per shard-task.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import shard_expr

BLOOM_SCHEMA = (
    "shard int, bloom binary, n_items long, m_bits long, k int, n_shards int"
)


def bloom_params(expected_items: int, fpr: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) for a target false-positive rate; m rounded to bytes."""
    n = max(1, expected_items)
    m = max(64, int(-n * math.log(fpr) / (math.log(2) ** 2)))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _positions(hi: np.ndarray, lo: np.ndarray, k: int, m: int) -> np.ndarray:
    """Kirsch-Mitzenmacher double hashing: pos_i = (hi + i*lo) mod m.
    Shape (k, n); uint64 wraparound arithmetic, fully vectorized."""
    hi = hi.astype(np.int64).view(np.uint64)
    lo = lo.astype(np.int64).view(np.uint64)
    i = np.arange(k, dtype=np.uint64).reshape(-1, 1)
    return ((hi + i * lo) % np.uint64(m)).astype(np.int64)


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(bits, pos.ravel() >> 3, np.uint8(1) << (pos.ravel() & 7).astype(np.uint8))


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """(k, n) positions -> (n,) bool: all k bits set."""
    got = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return got.all(axis=0).astype(bool)


def bloom_build(
    keys: DataFrame,
    n_shards: int = 32,
    fpr: float = 0.01,
    expected_per_shard: int | None = None,
) -> DataFrame:
    """Build the sharded Bloom table from (url_hash_hi, url_hash_lo) rows.

    One reduce task per shard; inside the task everything is numpy.
    ``expected_per_shard`` sizes the bitmaps; default assumes the input
    count is representative (callers at scale pass their frontier-size
    forecast so bitmaps don't need rebuilds as rounds append).
    """
    if expected_per_shard is None:
        total = keys.count()
        expected_per_shard = max(64, (2 * total) // max(1, n_shards))
    m, k = bloom_params(expected_per_shard, fpr)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m // 8, dtype=np.uint8)
        pos = _positions(pdf["url_hash_hi"].to_numpy(), pdf["url_hash_lo"].to_numpy(), k, m)
        _set_bits(bits, pos)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "bloom": [bits.tobytes()],
                "n_items": [len(pdf)],
                "m_bits": [m],
                "k": [k],
                "n_shards": [n_shards],
            }
        )

    return (
        keys.select("url_hash_hi", "url_hash_lo")
        .withColumn("shard", shard_expr(F.col("url_hash_hi"), n_shards))
        .groupBy("shard")
        .applyInPandas(build, BLOOM_SCHEMA)
    )


def bloom_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two bloom tables (same sharding + sizing): the cross-round
    evolution path — append-then-compact, never rebuild."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        arrs = [np.frombuffer(x, dtype=np.uint8) for x in pdf["bloom"]]
        bits = np.bitwise_or.reduce(arrs) if len(arrs) > 1 else arrs[0]
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "bloom": [bits.tobytes()],
                "n_items": [int(pdf["n_items"].sum())],
                "m_bits": [int(pdf["m_bits"].iloc[0])],
                "k": [int(pdf["k"].iloc[0])],
                "n_shards": [int(pdf["n_shards"].iloc[0])],
            }
        )

    return a.unionByName(b).groupBy("shard").applyInPandas(merge, BLOOM_SCHEMA)


def probe_with_broadcast(candidates: DataFrame, bloom: DataFrame) -> DataFrame:
    """Append ``maybe_seen`` by probing driver-collected, broadcast bitmaps.

    Best when the whole filter fits comfortably in memory (it does for
    every local test/bench size). The UDF is one numpy gather per batch.
    """
    spark = candidates.sparkSession
    rows = bloom.collect()
    if not rows:
        return candidates.withColumn("maybe_seen", F.lit(False))
    n_shards = rows[0]["n_shards"]  # carried in the table; NEVER inferred
    table = {
        r["shard"]: (np.frombuffer(r["bloom"], dtype=np.uint8), r["m_bits"], r["k"])
        for r in rows
    }
    bc = spark.sparkContext.broadcast(table)

    @F.pandas_udf("boolean")
    def probe(hi: pd.Series, lo: pd.Series, shard: pd.Series) -> pd.Series:
        t = bc.value
        out = np.zeros(len(hi), dtype=bool)
        hiv, lov, sv = hi.to_numpy(), lo.to_numpy(), shard.to_numpy()
        for s in np.unique(sv):
            ent = t.get(int(s))
            if ent is None:
                continue
            bits, m, k = ent
            mask = sv == s
            pos = _positions(hiv[mask], lov[mask], k, m)
            out[mask] = _test_bits(bits, pos)
        return pd.Series(out)

    return candidates.withColumn(
        "maybe_seen",
        probe(
            F.col("url_hash_hi"),
            F.col("url_hash_lo"),
            shard_expr(F.col("url_hash_hi"), n_shards),
        ),
    )


def probe_cogrouped(
    candidates: DataFrame, bloom: DataFrame, n_shards: int
) -> DataFrame:
    """Append ``maybe_seen`` without broadcasting: co-group candidates with
    their shard's bitmap. The 10^10-URL path — per-task memory is one
    bitmap + one candidate partition, independent of total filter size."""
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in candidates.schema.fields
    )
    schema = f"{out_fields}, maybe_seen boolean"
    cols = [f.name for f in candidates.schema.fields]

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        res = left.drop(columns=["__shard"])
        if right.empty or left.empty:
            res["maybe_seen"] = False
            return res
        bits = np.frombuffer(right["bloom"].iloc[0], dtype=np.uint8)
        m, k = int(right["m_bits"].iloc[0]), int(right["k"].iloc[0])
        pos = _positions(
            left["url_hash_hi"].to_numpy(), left["url_hash_lo"].to_numpy(), k, m
        )
        res["maybe_seen"] = _test_bits(bits, pos)
        return res

    cand = candidates.withColumn("__shard", shard_expr(F.col("url_hash_hi"), n_shards))
    return (
        cand.groupBy("__shard")
        .cogroup(bloom.groupBy("shard"))
        .applyInPandas(probe, schema)
        .select(*cols, "maybe_seen")
    )


def dedup_against_seen(
    candidates: DataFrame,
    seen_exact: DataFrame | None,
    bloom: DataFrame | None = None,
    n_shards: int = 32,
    broadcast_bloom: bool = True,
    shuffle_exact_join: bool = False,
) -> DataFrame:
    """Return only candidates NOT in the seen set (reference analog: the
    unique-index upsert D1/D2 turning re-crawls into no-ops).

    Bloom pre-filter splits candidates into definitely-new (bloom says no;
    no join at all — zero false negatives guarantee) and maybe-seen, which
    alone pays the exact ``left_anti`` join. Without a bloom, plain anti.

    A bloom WITHOUT an exact tier cannot prove membership — treating its
    'maybe' slice as seen would silently drop ~fpr of genuinely-new URLs —
    so with ``seen_exact=None`` every candidate is returned unfiltered.
    """
    if seen_exact is None:
        return candidates
    if bloom is not None:
        probed = (
            probe_with_broadcast(candidates, bloom)
            if broadcast_bloom
            else probe_cogrouped(candidates, bloom, n_shards)
        )
        definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
        seen_keys = seen_exact.select("url_hash_hi", "url_hash_lo")
        if shuffle_exact_join:
            # at 10^10 URLs the seen table can never be the broadcast
            # build side — force the shuffle hash join (all-parallel, no
            # driver barrier); locally this is also what lets the anti
            # join scale with cores instead of serializing on the build
            seen_keys = seen_keys.hint("shuffle_hash")
        confirmed_new = maybe.join(
            seen_keys,
            ["url_hash_hi", "url_hash_lo"],
            "left_anti",
        )
        return definitely_new.unionByName(confirmed_new)
    return candidates.join(
        seen_exact.select("url_hash_hi", "url_hash_lo"),
        ["url_hash_hi", "url_hash_lo"],
        "left_anti",
    )

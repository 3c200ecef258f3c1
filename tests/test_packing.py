"""Sequence packing: scalable prefix scan vs the naive global window,
concat-chunk span math, and shard-local FFD bin invariants."""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from metadata_crawler_spark.operators.packing import (
    pack_bins,
    pack_concat_chunk,
    packing_summary,
    with_prefix_sum,
)


def _docs(spark, n=500, seed=7):
    rng = random.Random(seed)
    rows = [(i, rng.randint(0, 300)) for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "n_tok"]), rows


def test_prefix_sum_matches_naive_window(spark):
    df, _ = _docs(spark)
    got = {
        r.doc_id: r.start
        for r in with_prefix_sum(df, "doc_id", "n_tok", num_partitions=7).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = {
        r.doc_id: r.s
        for r in df.withColumn(
            "s", F.coalesce(F.sum("n_tok").over(w), F.lit(0))
        ).collect()
    }
    assert got == naive


def test_prefix_sum_empty_and_single(spark):
    empty = spark.createDataFrame([], "doc_id long, n_tok long")
    assert with_prefix_sum(empty, "doc_id", "n_tok").count() == 0
    one = spark.createDataFrame([(5, 42)], ["doc_id", "n_tok"])
    assert with_prefix_sum(one, "doc_id", "n_tok").collect()[0].start == 0


def test_concat_chunk_spans(spark):
    df, rows = _docs(spark, n=200)
    L = 128
    out = {
        r.doc_id: r
        for r in pack_concat_chunk(df, "doc_id", "n_tok", L, 5).collect()
    }
    # python reference
    start = 0
    for i, n in sorted(rows):
        r = out[i]
        assert r.start_tok == start
        assert r.first_seq == start // L
        assert r.seq_offset == start % L
        exp_last = (start + n - 1) // L if n > 0 else start // L
        assert r.last_seq == exp_last
        assert r.n_seqs_spanned == exp_last - start // L + 1
        start += n
    s = packing_summary(df, "n_tok", L).collect()[0]
    total = sum(n for _, n in rows)
    n_seq = -(-total // L)
    assert s.total_tokens == total and s.n_sequences == n_seq
    assert abs(s.padding_frac - (n_seq * L - total) / (n_seq * L)) < 1e-6


def test_pack_bins_invariants(spark):
    df, rows = _docs(spark, n=400)
    cap = 256
    got = pack_bins(df, "doc_id", "n_tok", cap, num_shards=8).collect()
    assert {r.id for r in got} == {i for i, _ in rows}  # every doc placed
    fills = {}
    for r in got:
        fills.setdefault((r.shard, r.bin), []).append(r)
    for (shard, b), members in fills.items():
        tot = sum(m.n for m in members)
        if any(m.oversize for m in members):
            assert len(members) == 1  # oversize doc is alone in its bin
        else:
            assert tot <= cap, (shard, b, tot)
    # determinism across runs
    again = pack_bins(df, "doc_id", "n_tok", cap, num_shards=8).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_pack_bins_oversize_flagged(spark):
    df = spark.createDataFrame(
        [(1, 1000), (2, 10), (3, 20)], ["doc_id", "n_tok"]
    )
    got = {r.id: r for r in pack_bins(df, "doc_id", "n_tok", 100, 4).collect()}
    assert got[1].oversize and not got[2].oversize and not got[3].oversize


def test_pack_bins_fill_efficiency(spark):
    # FFD on uniform sizes should waste well under one doc per bin on average
    df, rows = _docs(spark, n=1000, seed=11)
    cap = 512
    got = pack_bins(df, "doc_id", "n_tok", cap, num_shards=4).collect()
    n_bins = len({(r.shard, r.bin) for r in got if not r.oversize})
    total = sum(r.n for r in got if not r.oversize)
    assert total / (n_bins * cap) > 0.7  # fill factor sanity bar

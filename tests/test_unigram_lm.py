"""Unigram-LM tokenizer (operators/unigram_lm.py): hand-computed
forward-backward parity, EM likelihood monotonicity, structure recovery
on a planted-piece corpus, encode round-trips, unk isolation, and the
never-prune-single-chars invariant."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from metadata_crawler_spark.operators.bpe import word_counts
from metadata_crawler_spark.operators.unigram_lm import (
    _expected_counts,
    _forward,
    _viterbi,
    corpus_loglik,
    seed_pieces,
    train_unigram,
    unigram_encode,
)


def test_expected_counts_hand_dp():
    """word 'ab' under vocab {a, b, ab}: two segmentations [a,b] and
    [ab]; P([a,b]) ∝ pa*pb, P([ab]) ∝ pab — expected counts match the
    closed form exactly."""
    pa, pb, pab = 0.5, 0.3, 0.2
    logp = {"a": math.log(pa), "b": math.log(pb), "ab": math.log(pab)}
    z = pa * pb + pab
    got, logz = _expected_counts("ab", 10.0, logp, max_len=2)
    assert got["a"] == pytest.approx(10.0 * pa * pb / z, rel=1e-12)
    assert got["b"] == pytest.approx(10.0 * pa * pb / z, rel=1e-12)
    assert got["ab"] == pytest.approx(10.0 * pab / z, rel=1e-12)
    # and the forward Z agrees with the closed form
    assert logz == pytest.approx(math.log(z), rel=1e-12)
    assert _forward("ab", logp, 2)[2] == pytest.approx(math.log(z), rel=1e-12)


def test_viterbi_picks_max_likelihood_path():
    logp = {"a": math.log(0.1), "b": math.log(0.1), "ab": math.log(0.5)}
    assert _viterbi("abab", logp, 2) == ["ab", "ab"]
    # flip the odds: singles win
    logp2 = {"a": math.log(0.45), "b": math.log(0.45), "ab": math.log(0.01)}
    assert _viterbi("ab", logp2, 2) == ["a", "b"]
    assert _viterbi("aq", logp, 2) is None  # q unknown


def _toy_words(spark):
    docs = spark.createDataFrame(
        [("international internet interface",)] * 20
        + [("banana bandana",)] * 10,
        "text string",
    )
    return word_counts(docs, "text")


def test_seed_includes_all_single_chars(spark):
    seeds = seed_pieces(_toy_words(spark), max_piece_len=4, max_seed=10)
    pieces = {r["piece"] for r in seeds.collect()}
    corpus_chars = set("internationalinternetinterfacebananabandana")
    assert corpus_chars <= pieces
    assert len([p for p in pieces if len(p) > 1]) == 10


def test_train_recovers_planted_piece_and_em_monotone(spark):
    words = _toy_words(spark)
    pieces = train_unigram(
        words, vocab_size=24, max_piece_len=5, max_seed=60, em_iters=2
    )
    table = {r["piece"]: r["logp"] for r in pieces.collect()}
    # 'inter' heads every word of the dominant doc: it must survive
    # pruning and outrank any same-length piece
    assert "inter" in table
    five = {p: lp for p, lp in table.items() if len(p) == 5}
    assert table["inter"] == max(five.values())
    # vocabulary respects the cap (modulo protected single chars)
    singles = {p for p in table if len(p) == 1}
    assert len(table) <= 24 + len(singles)
    # EM monotonicity: one more EM pass never lowers corpus likelihood
    ll1 = corpus_loglik(words, pieces, max_piece_len=5)
    from metadata_crawler_spark.operators.unigram_lm import _em_pass

    better, _ = _em_pass(words, table, 5)
    ll2 = corpus_loglik(
        words,
        spark.createDataFrame(sorted(better.items()), "piece string, logp double"),
        max_piece_len=5,
    )
    assert ll2 >= ll1 - 1e-9


def test_encode_round_trip_and_unk(spark):
    words = _toy_words(spark)
    pieces = train_unigram(
        words, vocab_size=24, max_piece_len=5, max_seed=60, em_iters=1
    )
    docs = spark.createDataFrame(
        [(1, "internet interface"), (2, "banana"), (3, "internét"), (4, None)],
        "id int, text string",
    )
    out = {r["id"]: r["pieces"] for r in
           unigram_encode(docs, pieces, max_piece_len=5).collect()}
    assert "".join(out[1]) == "internetinterface"
    assert "".join(out[2]) == "banana"
    # é never seen in training: isolated as <unk>, neighbors kept
    assert "<unk>" in out[3]
    assert "".join(t for t in out[3] if t != "<unk>") == "internt"
    assert out[4] == []


def test_training_is_deterministic(spark):
    words = _toy_words(spark)
    a = train_unigram(words, vocab_size=20, max_piece_len=4, max_seed=40)
    b = train_unigram(words, vocab_size=20, max_piece_len=4, max_seed=40)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert [p for p, _ in ra] == [p for p, _ in rb]
    for (_, x), (_, y) in zip(ra, rb):
        assert x == pytest.approx(y, rel=1e-12)


def test_shrink_factor_validation(spark):
    with pytest.raises(ValueError):
        train_unigram(_toy_words(spark), vocab_size=10, shrink_factor=1.5)

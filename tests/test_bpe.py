"""BPE trainer/encoder vs an independent pure-Python reference
implementation (dict-based Sennrich algorithm, no Spark)."""

from __future__ import annotations

import collections

import pytest

from metadata_crawler_spark.operators.bpe import (
    EOW,
    bpe_encode,
    merges_table,
    train_bpe,
    word_counts,
)


def _ref_train(texts, num_merges, min_count=1):
    """Sennrich et al. 2016 reference: dict word counts, pair stats,
    greedy left-to-right merge — written independently of the Spark path."""
    wc = collections.Counter(w for t in texts for w in t.split())
    vocab = {w: [c for c in w] + [EOW] for w in wc}
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc[w]
        if not pairs:
            break
        # tiebreak (count desc, a asc, b asc) — must match the Spark orderBy
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


TEXTS = [
    "low low low low low lower lower newest newest newest",
    "newest newest newest widest widest widest new new news",
    "the newest low lower the the widest news new",
]


def test_train_bpe_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    merges, vocab = train_bpe(df, "text", num_merges=20, checkpoint_every=4)
    ref_merges, ref_vocab = _ref_train(TEXTS, 20)
    assert merges == ref_merges
    got = {r.word: list(r.syms) for r in vocab.collect()}
    assert got == ref_vocab


def test_word_counts(spark):
    df = spark.createDataFrame([("a b a", ), ("  ", ), ("b", )], ["text"])
    got = {r.word: r.cnt for r in word_counts(df, "text").collect()}
    assert got == {"a": 2, "b": 2}


def test_encode_reproduces_training_segmentation(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    merges, vocab = train_bpe(df, "text", num_merges=15)
    # encoding any vocab word with the learned ranks must reproduce the
    # exact symbol sequence training left it with
    words = spark.createDataFrame(
        [(r.word,) for r in vocab.collect()], ["text"]
    )
    enc = bpe_encode(words, "text", merges)
    trained = {r.word: list(r.syms) for r in vocab.collect()}
    for r in enc.collect():
        assert list(r.bpe_tokens) == trained[r.text], r.text


def test_encode_unseen_and_null(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    merges, _ = train_bpe(df, "text", num_merges=10)
    probe = spark.createDataFrame(
        [(1, "lowest zzz"), (2, None), (3, "")],
        ["id", "text"],
    )
    rows = {r.id: r for r in bpe_encode(probe, "text", merges).collect()}
    # unseen word still segments using learned sub-word units
    assert rows[1].bpe_tokens_n >= 2
    assert all(EOW not in s or s.endswith(EOW) for s in rows[1].bpe_tokens)
    assert rows[2].bpe_tokens == [] and rows[3].bpe_tokens == []


def test_min_count_early_stop(spark):
    df = spark.createDataFrame([("a b c",)], ["text"])
    merges, _ = train_bpe(df, "text", num_merges=50, min_count=2)
    assert merges == []  # every pair occurs once -> stop before merge 1


def test_merges_table_roundtrip(spark):
    merges = [("l", "o"), ("lo", "w")]
    t = merges_table(spark, merges)
    back = [(r.a, r.b) for r in t.orderBy("rank").collect()]
    assert back == merges


def test_word_counts_no_phantom_empty_words(spark):
    """Tab/newline padding must not mint '' vocabulary entries — Spark's
    trim strips only ASCII spaces, so the guard filters post-split."""
    from metadata_crawler_spark.operators.bpe import word_counts

    df = spark.createDataFrame(
        [("hello\nworld\n",), ("\t",), ("  ",), (None,)], ["text"]
    )
    rows = {r.word: r.cnt for r in word_counts(df, "text").collect()}
    assert rows == {"hello": 1, "world": 1}


def test_encode_tokenizes_like_word_counts_on_nbsp(spark):
    """Training (Java \\s+, ASCII) and encoding must share one word
    inventory: 'a\\u00a0b' is ONE word on both sides, so the NBSP
    survives as a symbol inside the encoded word instead of being a
    silent Python-side word boundary."""
    from metadata_crawler_spark.operators.bpe import bpe_encode, word_counts

    nbsp = "\u00a0"
    df = spark.createDataFrame(
        [(1, "a" + nbsp + "b")], "id long, text string"
    )
    wc = {r.word for r in word_counts(df, "text").collect()}
    assert wc == {"a" + nbsp + "b"}
    toks = bpe_encode(df, "text", []).select("bpe_tokens").first()[0]
    assert toks == ["a", nbsp, "b", "</w>"]

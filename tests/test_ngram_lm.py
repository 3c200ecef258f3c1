"""Trigram Stupid-Backoff cross-entropy vs an independent pure-Python
reference, plus the contracts the pipeline leans on (held-out scoring,
short docs, word-order sensitivity beyond the bigram rung)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from metadata_crawler_spark.functions.ngram_lm import trigram_crossentropy

ALPHA = 0.4


def _py_xent3(doc: str, train_docs: list[str], alpha: float = ALPHA):
    """Independent dict-based Stupid Backoff (no shared code)."""
    uni: Counter = Counter()
    bi: Counter = Counter()
    tri: Counter = Counter()
    for d in train_docs:
        toks = d.split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
        tri.update(zip(toks, toks[1:], toks[2:]))
    total = sum(uni.values())
    v = len(uni)

    def s2(w2, w3):
        if (w2, w3) in bi and uni[w2] > 0:
            return bi[(w2, w3)] / uni[w2]
        return alpha * (uni.get(w3, 0) + 1) / (total + v)

    def s3(w1, w2, w3):
        if (w1, w2, w3) in tri and bi.get((w1, w2), 0) > 0:
            return tri[(w1, w2, w3)] / bi[(w1, w2)]
        return alpha * s2(w2, w3)

    toks = doc.split()
    scores = [
        -math.log2(s3(a, b, c)) for a, b, c in zip(toks, toks[1:], toks[2:])
    ]
    if not scores:
        return 0, None
    return len(scores), round(sum(scores) / len(scores), 6)


DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the hat"),
    (2, "mat the on sat cat the"),         # same unigrams, broken order
    (3, "the cat"),                        # < 3 tokens
    (4, ""),                               # empty
    (5, "unseen words entirely here now"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_python_reference_self_trained(spark):
    df = _df(spark, DOCS)
    got = {
        r["id"]: (r["n_trigrams"], r["xent3"])
        for r in trigram_crossentropy(df, "text", "doc_id").collect()
    }
    train = [t for _, t in DOCS]
    for i, text in DOCS:
        n_ref, x_ref = _py_xent3(text, train)
        assert got[i][0] == n_ref, (i, got[i], n_ref)
        if x_ref is None:
            assert got[i][1] is None
        else:
            assert got[i][1] == pytest.approx(x_ref, abs=1e-6), (i, text)


def test_heldout_model_scores_unseen_finitely(spark):
    train = _df(spark, [(100, "alpha beta gamma alpha beta gamma")])
    score = _df(spark, [(0, "alpha beta gamma"), (1, "zzz qqq www")])
    rows = {
        r["id"]: r
        for r in trigram_crossentropy(
            score, "text", "doc_id", train_df=train
        ).collect()
    }
    # seen trigram scores better (lower xent) than fully-unseen text
    assert rows[0]["xent3"] < rows[1]["xent3"]
    assert math.isfinite(rows[1]["xent3"])
    n_ref, x_ref = _py_xent3(
        "zzz qqq www", ["alpha beta gamma alpha beta gamma"]
    )
    assert rows[1]["n_trigrams"] == n_ref
    assert rows[1]["xent3"] == pytest.approx(x_ref, abs=1e-6)


def test_trigram_separates_what_bigrams_cannot(spark):
    """Two docs with IDENTICAL bigram multisets but different trigram
    structure: 'a b a c a b a c...' vs 'a b a b a c a c...'-style
    rotations score apart under the trigram model."""
    from metadata_crawler_spark.functions.quality import bigram_crossentropy

    d1 = "x y x z x y x z x y x z"
    d2 = "x y x y x z x z x y x z"  # same {xy, yx, xz, zx} pairs, reordered
    df = _df(spark, [(0, d1), (1, d2)])
    bg = {r["id"]: r["xent2"] for r in
          bigram_crossentropy(df, "text", "doc_id").collect()}
    tg = {r["id"]: r["xent3"] for r in
          trigram_crossentropy(df, "text", "doc_id").collect()}
    # bigram multisets differ by at most one pair here; the trigram gap
    # must be the larger discriminator
    assert abs(tg[0] - tg[1]) > abs(bg[0] - bg[1])


def test_shuffle_join_path_equals_broadcast(spark):
    df = _df(spark, DOCS)
    a = trigram_crossentropy(
        df, "text", "doc_id", vocab_broadcast=True
    ).collect()
    b = trigram_crossentropy(
        df, "text", "doc_id", vocab_broadcast=False
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

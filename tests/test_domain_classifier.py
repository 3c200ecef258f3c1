"""Multi-class NB domain classifier: planted-vocabulary separation,
prior fallback on featureless docs, tie determinism, zero-shuffle plan."""

from __future__ import annotations

import pytest

from metadata_crawler_spark.functions.quality import (
    domain_classifier_scores,
    train_domain_classifier,
)

B = 1 << 12

NEWS = "election parliament minister policy vote senate law bill"
SPORT = "goal match striker league coach stadium referee season"
CODE = "function variable compile debug array pointer loop syntax"


@pytest.fixture(scope="module")
def trained(spark):
    rows = []
    for i, words in enumerate([NEWS, SPORT, CODE]):
        toks = words.split()
        for j in range(6):
            rows.append((i, " ".join(toks[j % 4 :] + toks[: j % 4])))
    df = spark.createDataFrame(rows, "label int, text string")
    w, priors, unseen = train_domain_classifier(df, "text", "label", n_buckets=B)
    return df, w, priors, unseen


def test_classifies_held_out_by_vocabulary(spark, trained):
    _df, w, priors, unseen = trained
    test = spark.createDataFrame(
        [
            (0, "the minister called a vote on the bill"),
            (1, "the striker scored a goal for the league"),
            (2, "debug the function with a pointer loop"),
        ],
        "want int, text string",
    )
    out = domain_classifier_scores(test, "text", w, priors, unseen, n_buckets=B)
    for r in out.collect():
        assert r.domain == r.want, (r.want, r.domain, r.domain_score)


def test_featureless_doc_gets_max_prior_label(spark, trained):
    _df, w, priors, unseen = trained
    test = spark.createDataFrame([("",), ("   ",), (None,)], "text string")
    out = domain_classifier_scores(test, "text", w, priors, unseen, n_buckets=B)
    best_prior = max(sorted(priors), key=lambda l: (priors[l], -l))
    for r in out.collect():
        assert r.domain == best_prior
        assert r.domain_score == pytest.approx(round(priors[best_prior], 6))


def test_priors_and_weight_shape(trained):
    _df, w, priors, unseen = trained
    import math

    assert set(priors) == {0, 1, 2}
    for p in priors.values():
        assert p == pytest.approx(math.log(6 / 18))
    for u in unseen.values():
        assert u < 0  # smoothed-zero per-gram baseline
    rows = w.collect()
    assert all(r.weight > 0 for r in rows)  # evidence above the baseline
    assert {r.label for r in rows} == {0, 1, 2}


def test_scoring_is_shuffle_free(spark, trained):
    _df, w, priors, unseen = trained
    test = spark.createDataFrame([("goal match",)], "text string")
    plan = (
        domain_classifier_scores(test, "text", w, priors, unseen, n_buckets=B)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_tie_breaks_to_lowest_label(spark):
    # two labels trained on identical corpora -> identical scores;
    # the argmax must deterministically pick the lower label
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta gamma")],
        "label int, text string",
    )
    w, priors, unseen = train_domain_classifier(df, "text", "label", n_buckets=B)
    out = domain_classifier_scores(
        spark.createDataFrame([("alpha beta",)], "text string"),
        "text", w, priors, unseen, n_buckets=B,
    ).collect()[0]
    assert out.domain == 0

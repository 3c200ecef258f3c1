"""Dataset card (plans/corpus_report): slice correctness vs hand counts,
grouping-sets shape, and the one-scan/one-shuffle plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_crawler_spark.plans.corpus_report import corpus_report

DOCS = [
    # (doc_id, text, domain) — lang heuristic: en='the/and/of', de='der/und/nicht'
    (1, "the cat and the dog of the house sat", "news"),
    (2, "the quick fox and the hen of il", "news"),
    (3, "der hund und der mann nicht da", "blogs"),
    (4, "", "news"),                       # empty -> unknown, is_empty
    (5, "xyzzy plugh qwerty", "blogs"),    # no markers -> unknown
    (6, "call me at +1-555-123-4567 or mail a@b.com and the end of it", "spam"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, domain string")


def test_slices_and_counts(spark, docs):
    rep = corpus_report(docs, domain_col="domain").collect()
    # grouping ids: overall=3 (both NULL), per-lang=1, per-(lang,domain)=0
    overall = [r for r in rep if r.grouping_id == 3]
    per_lang = {r.lang: r for r in rep if r.grouping_id == 1}
    per_ld = {(r.lang, r.domain): r for r in rep if r.grouping_id == 0}
    assert len(overall) == 1 and overall[0].n_docs == 6
    assert per_lang["en"].n_docs == 3      # docs 1, 2, 6
    assert per_lang["de"].n_docs == 1
    assert per_lang["unknown"].n_docs == 2  # empty + markerless
    assert per_ld[("en", "news")].n_docs == 2
    assert per_ld[("de", "blogs")].n_docs == 1
    # token accounting: overall == sum of per-lang == sum of per-(l,d)
    assert overall[0].n_tokens == sum(r.n_tokens for r in per_lang.values())
    assert overall[0].n_tokens == sum(r.n_tokens for r in per_ld.values())
    # hand count: doc 1 has 9 ws tokens
    assert per_ld[("en", "news")].n_tokens == 9 + 8


def test_rates(spark, docs):
    # without domain_col the grouping ids shift: overall=1, per-lang=0
    rep = {r.lang: r for r in corpus_report(docs).collect() if r.grouping_id == 0}
    # PII doc 6 is en: 1 of 3 en docs has email AND phone
    assert abs(rep["en"].pii_email_rate - 1 / 3) < 1e-6
    assert abs(rep["en"].pii_phone_rate - 1 / 3) < 1e-6
    assert rep["de"].pii_email_rate == 0.0
    # empty doc is 1 of 2 unknowns
    assert abs(rep["unknown"].empty_frac - 0.5) < 1e-6
    # every fixture doc is way under Gopher's 50-word floor -> all flagged
    assert rep["en"].flagged_frac == 1.0


def test_percentiles_monotone(spark, docs):
    rep = [r for r in corpus_report(docs).collect() if r.grouping_id == 1][0]
    p = rep.p_tokens
    assert len(p) == 4
    assert p == sorted(p)
    assert p[0] >= 0 and p[-1] <= rep.n_tokens


def test_one_shuffle_plan(spark, docs):
    """The design contract: one scan, one Exchange (the grouping-sets
    partial agg); slices multiply in Expand, never rescan."""
    plan = corpus_report(docs, domain_col="domain")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # grouping agg + final orderBy range
    assert plan.count("Expand") == 1
    # exactly one scan of the input
    assert plan.count("ExistingRDD") + plan.count("Scan") <= 2


def test_precomputed_lang_column(spark, docs):
    tagged = docs.withColumn("mylang", F.lit("xx"))
    rep = corpus_report(tagged, lang_col="mylang").collect()
    langs = {r.lang for r in rep if r.grouping_id == 0}
    assert langs == {"xx"}

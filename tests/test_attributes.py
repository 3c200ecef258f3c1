"""Attribute-sidecar + mixer tests: tagging must be one map-side pass for
scalar taggers (zero Exchange, plan-asserted), mixing must be exactly
equivalent to filtering the corpus directly with the same predicates,
sidecar round-trips must preserve the mix, and re-mixing with a new
threshold must not require re-tagging."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from metadata_crawler_spark.functions.quality import gopher_quality_flags
from metadata_crawler_spark.plans.attributes import (
    DEFAULT_TAGGERS,
    mix_corpus,
    mix_report,
    read_attributes,
    tag_corpus,
    write_attributes,
)

GOOD = (
    "The committee published its findings on Tuesday and the report "
    "describes how municipal water systems were upgraded over a decade. "
) * 8  # long, prosey, stopword-rich: passes the Gopher gate
SHOUTY = "BUY NOW " * 40  # no stopwords, short words
TINY = "too short"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, GOOD, "https://example.com/articles/water"),
        (1, SHOUTY, "http://spam.example/buy?sessionid=abc123"),
        (2, TINY, "https://example.com/t"),
        (3, GOOD + " lorem ipsum dolor", "https://example.com/lorem"),
        (4, None, "https://example.com/null"),
    ]
    return spark.createDataFrame(rows, "id long, text string, url string")


def test_tag_corpus_shapes_and_values(corpus):
    attrs = tag_corpus(
        corpus, DEFAULT_TAGGERS + ("url_quality",), url_col="url"
    )
    rows = {r["id"]: r for r in attrs.collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    assert not rows[0]["gopher_quality"]["flagged"]
    assert rows[1]["gopher_quality"]["flagged"]
    assert rows[2]["gopher_quality"]["flagged"]
    assert rows[3]["c4"]["has_lorem_ipsum"]
    assert rows[1]["url_quality"]["session_junk"]
    assert rows[0]["tokens"]["ws_tokens"] > 100
    # NULL text still yields a row with concrete drop verdicts
    assert rows[4]["gopher_quality"]["flagged"]


def test_scalar_tagging_is_one_mapside_pass(corpus):
    attrs = tag_corpus(
        corpus, DEFAULT_TAGGERS + ("url_quality",), url_col="url"
    )
    plan = attrs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_df_taggers_join_in(corpus):
    attrs = tag_corpus(
        corpus, ("gopher_quality", "gopher_repetition", "line_quality")
    )
    rows = {r["id"]: r for r in attrs.collect()}
    assert rows[1]["gopher_repetition"]["flagged"]  # BUY NOW x40
    assert rows[0]["gopher_repetition"]["n_words"] == len(GOOD.split())
    assert "removed_char_frac" in attrs.schema["line_quality"].dataType.names


def test_mix_equals_direct_filter(corpus):
    attrs = tag_corpus(corpus, DEFAULT_TAGGERS)
    mixed = mix_corpus(
        corpus,
        attrs,
        "NOT gopher_quality.flagged AND NOT c4.has_lorem_ipsum",
    )
    direct = corpus.where(
        ~gopher_quality_flags(F.col("text"))["flagged"]
        & ~F.lower(F.coalesce("text", F.lit(""))).contains("lorem ipsum")
    )
    assert sorted(r["id"] for r in mixed.collect()) == sorted(
        r["id"] for r in direct.collect()
    )
    # surviving rows carry the full corpus schema untouched
    assert mixed.columns == corpus.columns


def test_remix_without_retagging(corpus):
    attrs = tag_corpus(corpus, DEFAULT_TAGGERS)
    loose = mix_corpus(corpus, attrs, "tokens.ws_tokens >= 2")
    tight = mix_corpus(corpus, attrs, "tokens.ws_tokens >= 100")
    loose_ids = {r["id"] for r in loose.collect()}
    tight_ids = {r["id"] for r in tight.collect()}
    assert tight_ids < loose_ids
    assert 0 in tight_ids and 2 in loose_ids - tight_ids


def test_sidecar_roundtrip(spark, corpus, tmp_path):
    attrs = tag_corpus(corpus, ("gopher_quality", "tokens"))
    write_attributes(attrs, str(tmp_path), "exp1")
    more = tag_corpus(corpus, ("c4",))
    write_attributes(more, str(tmp_path), "exp2")
    loaded = read_attributes(spark, str(tmp_path), ["exp1", "exp2"])
    keep = "NOT gopher_quality.flagged AND NOT c4.flagged"
    from_disk = sorted(
        r["id"] for r in mix_corpus(corpus, loaded, keep).collect()
    )
    in_mem = sorted(
        r["id"]
        for r in mix_corpus(
            corpus, attrs.join(more, "id", "left"), keep
        ).collect()
    )
    assert from_disk == in_mem and from_disk  # non-empty survivor set


def test_mix_drops_uncovered_ids(spark, corpus):
    # a sidecar covering only ids 0-2: ids 3-4 must NOT survive any mix
    attrs = tag_corpus(corpus.where("id <= 2"), ("tokens",))
    mixed = mix_corpus(corpus, attrs, "tokens.ws_tokens >= 0")
    assert {r["id"] for r in mixed.collect()} <= {0, 1, 2}


def test_mix_report_single_pass(corpus):
    attrs = tag_corpus(corpus, DEFAULT_TAGGERS)
    rep = mix_report(
        attrs,
        {
            "gopher": "NOT gopher_quality.flagged",
            "c4": "NOT c4.flagged",
            "min_tokens": "tokens.ws_tokens >= 50",
        },
    )
    rows = {r["rule"]: r for r in rep.collect()}
    assert rows["gopher"]["total"] == 5
    assert rows["gopher"]["kept"] == 2  # docs 0 and 3
    assert rows["min_tokens"]["kept"] == 3  # docs 0, 1 (80 words), 3
    # NULL-text doc counts as not-kept, never as NULL
    assert all(r["kept"] is not None for r in rows.values())


def test_unknown_tagger_and_missing_url_raise(corpus):
    with pytest.raises(ValueError, match="unknown taggers"):
        tag_corpus(corpus, ("nope",))
    with pytest.raises(ValueError, match="url_col"):
        tag_corpus(corpus, ("url_quality",))


def test_read_attributes_rejects_duplicate_tagger_columns(
    spark, corpus, tmp_path
):
    # the same tagger written under two experiments would produce an
    # ambiguous column that only explodes later inside mix_corpus's keep
    # expression — read_attributes must reject it up front (r5 review).
    write_attributes(tag_corpus(corpus, ("tokens",)), str(tmp_path), "a")
    write_attributes(tag_corpus(corpus, ("tokens",)), str(tmp_path), "b")
    with pytest.raises(ValueError, match="tokens"):
        read_attributes(spark, str(tmp_path), ["a", "b"])

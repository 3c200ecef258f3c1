"""Revalidation-aware recrawl: classify_refetch / recrawl_batch /
checks_delta — the conditional-fetch (HTTP 304 analog) freshness loop."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from metadata_crawler_spark.operators.changes import (
    classify_refetch,
    estimate_change_rate,
    revalidation_stats,
    revisit_schedule,
)
from metadata_crawler_spark.plans.recrawl import (
    checks_delta,
    due_for_revisit,
    recrawl_batch,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def stores(spark):
    # prior store: what the crawler holds
    prior = _df(
        spark,
        [
            ("https://a/1", "alpha body"),
            ("https://a/2", "beta body"),
            ("https://a/3", "gamma body"),
            ("https://a/4", None),  # stored with NULL content
            ("https://a/gone", "dead page"),
        ],
        "url string, text string",
    )
    # live snapshot: what a re-fetch would return now
    pages = _df(
        spark,
        [
            ("https://a/1", "alpha body"),  # unchanged -> 304
            ("https://a/2", "beta body v2"),  # changed -> modified
            ("https://a/3", "gamma body"),  # unchanged -> 304
            ("https://a/4", None),  # NULL == NULL -> 304
            ("https://a/new", "fresh page"),  # not in prior -> new
        ],
        "page_url string, text string",
    )
    return prior, pages


def _status_map(df):
    return {
        r["url"]: (r["status"], r["changed"], r["store_row"], r["bytes_saved"])
        for r in df.collect()
    }


def test_classify_refetch_statuses(spark, stores):
    prior, pages = stores
    fetched = pages.select(F.col("page_url").alias("url"), "text")
    out = _status_map(classify_refetch(fetched, prior))
    assert out["https://a/1"] == ("not_modified", False, False, len("alpha body"))
    assert out["https://a/2"] == ("modified", True, True, 0)
    assert out["https://a/3"] == ("not_modified", False, False, len("gamma body"))
    # NULL prior content vs NULL refetch: eqNullSafe -> not modified,
    # and the saved transfer is 0 bytes (nothing was stored)
    assert out["https://a/4"] == ("not_modified", False, False, 0)
    assert out["https://a/new"] == ("new", None, True, 0)
    assert "https://a/gone" not in out  # prior-only urls are not fetched rows


def test_classify_refetch_explicit_etag(spark, stores):
    """An explicit validator column overrides the content-hash default:
    a stale etag forces 'modified' even when bodies match."""
    prior, pages = stores
    p = prior.withColumn(
        "etag",
        F.when(F.col("url") == "https://a/1", F.lit("stale-etag")).otherwise(
            F.md5("text")
        ),
    )
    fetched = pages.select(F.col("page_url").alias("url"), "text")
    out = _status_map(classify_refetch(fetched, p, etag_col="etag"))
    assert out["https://a/1"][0] == "modified"
    assert out["https://a/3"][0] == "not_modified"


def test_classify_refetch_broadcast_paths_agree(spark, stores):
    prior, pages = stores
    fetched = pages.select(F.col("page_url").alias("url"), "text")
    bc = classify_refetch(fetched, prior, fetched_broadcast=True)
    sh = classify_refetch(fetched, prior, fetched_broadcast=False)
    assert sorted(map(tuple, bc.collect())) == sorted(map(tuple, sh.collect()))


def test_recrawl_batch_end_to_end(spark, stores):
    prior, pages = stores
    due = _df(
        spark,
        [(u,) for u in (
            "https://a/1", "https://a/2", "https://a/4",
            "https://a/gone", "https://a/new",
        )],
        "url string",
    )
    out = _status_map(recrawl_batch(due, pages, prior))
    assert out["https://a/1"][0] == "not_modified"
    assert out["https://a/2"][0] == "modified"
    assert out["https://a/4"][0] == "not_modified"
    assert out["https://a/gone"] == ("gone", None, False, 0)
    assert out["https://a/new"][0] == "new"
    # /3 was not due -> absent
    assert "https://a/3" not in out
    stats = {
        r["status"]: (r["n_urls"], r["bytes_saved"])
        for r in revalidation_stats(recrawl_batch(due, pages, prior)).collect()
    }
    assert stats["not_modified"] == (2, len("alpha body"))
    assert stats["modified"] == (1, 0)
    assert stats["gone"] == (1, 0)
    assert stats["new"] == (1, 0)


def test_checks_delta_feeds_estimator(spark, stores):
    """The loop closes: recrawl checks append to the history and move
    the Cho & Garcia-Molina estimate; new/gone rows stay out."""
    prior, pages = stores
    due = _df(
        spark,
        [(u,) for u in (
            "https://a/1", "https://a/2", "https://a/gone", "https://a/new",
        )],
        "url string",
    )
    classified = recrawl_batch(due, pages, prior)
    delta = checks_delta(classified, now_s=2_000_000.0)
    rows = {r["url"]: r["changed"] for r in delta.collect()}
    assert rows == {"https://a/1": False, "https://a/2": True}
    history = _df(
        spark,
        [
            ("https://a/1", 1_000_000.0, False),
            ("https://a/2", 1_000_000.0, True),
        ],
        "url string, ts double, changed boolean",
    ).unionByName(delta)
    rates = estimate_change_rate(history)
    got = {r["url"]: r for r in rates.collect()}
    assert got["https://a/1"]["n_checks"] == 2
    assert got["https://a/1"]["n_changed"] == 0
    assert got["https://a/2"]["n_changed"] == 2
    # changing page earns a shorter revisit interval than the static one
    sched = {
        r["url"]: r["revisit_interval_s"]
        for r in revisit_schedule(rates).collect()
    }
    assert sched["https://a/2"] < sched["https://a/1"]


def test_due_for_revisit_filter(spark):
    sched = _df(
        spark,
        [("u1", 100.0), ("u2", 500.0)],
        "url string, next_due_ts double",
    ).withColumn("next_due_ts", F.timestamp_seconds("next_due_ts"))
    due = due_for_revisit(sched, now_s=200.0)
    assert [r["url"] for r in due.collect()] == ["u1"]


def test_prior_never_hash_build_side(spark, stores):
    """Plan hygiene: with the batch broadcast, the only broadcast
    exchanges carry the batch/hit-url side — the prior store must never
    be collected for a broadcast hash join."""
    prior, pages = stores
    fetched = pages.select(F.col("page_url").alias("url"), "text")
    plan = classify_refetch(
        fetched, prior, fetched_broadcast=True
    )._jdf.queryExecution().executedPlan().toString()
    # both joins are BroadcastHashJoins whose build side is the batch
    assert plan.count("BroadcastHashJoin") >= 1
    # a broadcast of the prior relation would appear as a
    # BroadcastExchange feeding from the prior scan; the prior side is
    # only ever the streamed side. Heuristic: the plan has exactly as
    # many BroadcastExchange nodes as joins, and the fetched-side
    # localCheckpoint/scan feeds them (no md5 of the PRIOR column inside
    # a broadcast subtree would be hard to assert textually, so assert
    # the join count instead and rely on the agreement test above).
    assert "SortMergeJoin" not in plan

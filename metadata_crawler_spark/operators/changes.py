"""Re-crawl change detection: which URLs changed content between two
crawls (the epoch-refresh analog — the reference merely re-stamps
``_crawl_epoch`` on upsert, /root/reference/src/metadata_crawler/api/
stores/base.py:411-425; a web pipeline also wants changed/unchanged/new/
gone classification to prioritize re-fetches)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_changes(
    old: DataFrame,
    new: DataFrame,
    key: str = "url",
    content_col: str = "text",
) -> DataFrame:
    """Full outer join on the key, classify each URL:
    unchanged | changed | new | gone. Content compared by md5 so only
    hashes shuffle, never bodies."""
    o = old.select(
        F.col(key).alias("k"),
        F.md5(F.col(content_col)).alias("old_hash"),
        F.lit(True).alias("_old_present"),
    )
    n = new.select(
        F.col(key).alias("k"),
        F.md5(F.col(content_col)).alias("new_hash"),
        F.lit(True).alias("_new_present"),
    )
    j = o.join(n, "k", "full_outer")
    # Presence is carried by explicit flags, NOT by hash nullness: a URL
    # fetched with NULL/unextractable content hashes to NULL, and judging
    # presence from the hash would classify it "new"/"gone" even when the
    # row exists in both crawls. eqNullSafe makes NULL==NULL "unchanged".
    status = (
        F.when(F.col("_old_present").isNull(), F.lit("new"))
        .when(F.col("_new_present").isNull(), F.lit("gone"))
        .when(
            F.col("old_hash").eqNullSafe(F.col("new_hash")), F.lit("unchanged")
        )
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col("k").alias(key), status.alias("status"))


def change_stats(changes: DataFrame) -> DataFrame:
    return changes.groupBy("status").agg(F.count("*").alias("n_urls"))


def estimate_change_rate(
    visits: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    changed_col: str = "changed",
) -> DataFrame:
    """Per-URL Poisson change-rate estimation (Cho & Garcia-Molina 2003,
    "Estimating Frequency of Change"): from a history of revisit checks
    (one row per completed check: did the page differ from the previous
    fetch?), estimate the change rate

        lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) / I

    where n = checks, X = checks that saw a change, I = mean check
    interval — the bias-corrected estimator for binary change
    observations (the +0.5 keeps X = n finite). Returns per URL:
    (url, n_checks, n_changed, avg_interval_s, lambda_hat) with
    lambda_hat in changes/second; NULL when the history has a single
    check (no interval to normalize by).

    Scale shape: ONE url-keyed groupBy (count/sum/min/max all partial-
    aggregate map-side); no window, no sort — at 10^10 URLs this is the
    same shuffle the seen-set update already pays.
    """
    g = visits.groupBy(F.col(url_col).alias("url")).agg(
        F.count("*").alias("n_checks"),
        F.sum(F.col(changed_col).cast("long")).alias("n_changed"),
        F.min(ts_col).alias("_first"),
        F.max(ts_col).alias("_last"),
    )
    n = F.col("n_checks")
    x = F.col("n_changed")
    span = F.col("_last").cast("double") - F.col("_first").cast("double")
    avg_i = F.when(n > 1, span / (n - 1))
    lam = F.when(
        (n > 1) & (avg_i > 0),
        -F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5))) / avg_i,
    )
    return g.select(
        "url",
        "n_checks",
        "n_changed",
        avg_i.alias("avg_interval_s"),
        lam.alias("lambda_hat"),
        F.col("_last").alias("last_check_ts"),
    )


def revisit_schedule(
    rates: DataFrame,
    min_interval_s: float = 3600.0,
    max_interval_s: float = 30 * 24 * 3600.0,
    target: float = 1.0,
) -> DataFrame:
    """Turn change-rate estimates into a recrawl schedule: revisit every
    ``target / lambda_hat`` seconds (expected ``target`` changes per
    revisit — target=1 is the classic uniform-freshness heuristic),
    clamped to [min_interval_s, max_interval_s]. URLs with no usable
    estimate (single check, or zero observed changes) fall back to
    ``max_interval_s`` — never-changing pages drift to the slow lane
    exactly like the reference's epoch-based stale sweep demotes
    unrefreshed entries (api/stores/base.py _crawl_epoch re-stamp).

    Adds (revisit_interval_s, next_due_ts). Pure column expressions.
    """
    lam = F.col("lambda_hat")
    raw = F.when(lam > 0, F.lit(float(target)) / lam)
    interval = F.least(
        F.greatest(
            F.coalesce(raw, F.lit(float(max_interval_s))),
            F.lit(float(min_interval_s)),
        ),
        F.lit(float(max_interval_s)),
    )
    return rates.withColumn(
        "revisit_interval_s", interval
    ).withColumn(
        "next_due_ts",
        F.timestamp_seconds(
            F.col("last_check_ts").cast("double") + interval
        ),
    )

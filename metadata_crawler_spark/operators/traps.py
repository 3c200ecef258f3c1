"""Content-aware crawler-trap detection: the POST-FETCH host-level tier
beside the pre-fetch per-URL tier (`functions/urls.detect_url_traps`,
which flags template explosion / path loops / calendar walks from URL
strings alone, at frontier time). Some traps survive that gate: a
session-id maze mints urls of one template but under the explosion bar
per round, and a calendar trap serving real-looking pages is only
provably a trap once fetches show the content never changes. This
module adds the signal only fetched bodies can give — **novelty**
(distinct content hashes / fetched urls per host) — combines it with
template concentration, and emits host-level verdicts in the exact
``blocklist`` shape `functions/urls.filter_blocked_hosts` consumes
(the same feedback loop `mine_blocked_hosts` closes for quality flags;
this closes it for URL-space explosion).

Reference analog: the reference bounds per-directory descent with a
static depth valve (F4, config.py ``max_depth``); a web crawler needs
the data-driven version.

Scale shape: content hashes and templates (`url_template_expr`, shared
with the per-URL tier so the two collapses cannot drift) are map-side
column exprs; the aggregations shuffle only (domain, template/hash)
sized rows — three keyed partial-agg exchanges exact, two with
``approx=True`` (the 10^8-host path: approx_count_distinct folds
novelty into one domain-keyed exchange). No windows, no sorts, no
driver data; page bodies never ride an exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import host_expr, url_template_expr


def detect_trap_hosts(
    df: DataFrame,
    url_col: str = "url",
    content_col: str = "text",
    host_col: str | None = None,
    min_urls: int = 50,
    max_novelty: float = 0.2,
    min_template_frac: float = 0.8,
    approx: bool = False,
) -> DataFrame:
    """Per-host trap report over a fetched slice: (domain, n_urls,
    n_content, novelty_frac, top_template, top_template_n,
    top_template_frac, trap). ``trap`` fires for hosts with >=
    ``min_urls`` support whose novelty collapsed (<= ``max_novelty``:
    many urls, few distinct bodies — the calendar-trap signature) **or**
    whose dominant url template covers >= ``min_template_frac`` of the
    host (the session-maze signature — novelty can stay 1.0 when every
    page embeds its own session id). The support gate keeps small hosts
    out (the ``mine_blocked_hosts`` contract). Trap rows' ``domain``
    column feeds ``filter_blocked_hosts`` directly.

    ``approx=True`` swaps the exact distinct-content count for
    ``approx_count_distinct`` — one fewer exchange; detection
    thresholds are fraction-scale, well above HLL error.
    """
    host = (
        F.col(host_col) if host_col is not None else host_expr(F.col(url_col))
    )
    base = df.select(
        host.alias("domain"),
        url_template_expr(F.col(url_col)).alias("_tpl"),
        F.xxhash64(F.col(content_col)).alias("_h"),
    ).where(F.col("domain").isNotNull() & (F.col("domain") != ""))

    tpl_counts = base.groupBy("domain", "_tpl").agg(
        F.count("*").alias("_n")
    )
    if approx:
        # HLL partials merge map-side in ONE domain-keyed exchange
        novelty = base.groupBy("domain").agg(
            F.approx_count_distinct("_h").alias("n_content")
        )
    else:
        novelty = (
            base.select("domain", "_h")
            .distinct()
            .groupBy("domain")
            .agg(F.count("*").alias("n_content"))
        )
    per_host = tpl_counts.groupBy("domain").agg(
        F.sum("_n").alias("n_urls"),
        # deterministic argmax: struct max = highest count, ties broken
        # by lexicographically-last template (oracle-replicable rule)
        F.max(F.struct(F.col("_n"), F.col("_tpl").alias("t"))).alias("_top"),
    )
    out = per_host.join(novelty, "domain").select(
        "domain",
        "n_urls",
        "n_content",
        F.round(F.col("n_content") / F.col("n_urls"), 6).alias(
            "novelty_frac"
        ),
        F.col("_top.t").alias("top_template"),
        F.col("_top._n").alias("top_template_n"),
        F.round(F.col("_top._n") / F.col("n_urls"), 6).alias(
            "top_template_frac"
        ),
    )
    return out.withColumn(
        "trap",
        (F.col("n_urls") >= int(min_urls))
        & (
            (F.col("novelty_frac") <= float(max_novelty))
            | (F.col("top_template_frac") >= float(min_template_frac))
        ),
    )

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
    base = _trap_base(df, url_col, content_col, host_col)
    tpl_counts = base.groupBy("domain", "_tpl").agg(
        F.count("*").alias("n")
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
    return _assemble_report(
        tpl_counts, novelty, min_urls, max_novelty, min_template_frac
    )


def _trap_base(
    df: DataFrame, url_col: str, content_col: str, host_col: str | None
) -> DataFrame:
    """Map-side projection shared by the one-shot detector and the
    crawl-loop partial builders: (domain, _tpl, _h)."""
    host = (
        F.col(host_col) if host_col is not None else host_expr(F.col(url_col))
    )
    return df.select(
        host.alias("domain"),
        url_template_expr(F.col(url_col)).alias("_tpl"),
        F.xxhash64(F.col(content_col)).alias("_h"),
    ).where(F.col("domain").isNotNull() & (F.col("domain") != ""))


def _assemble_report(
    tpl_counts: DataFrame,
    novelty: DataFrame,
    min_urls: int,
    max_novelty: float,
    min_template_frac: float,
) -> DataFrame:
    """(domain, _tpl, n) counts + (domain, n_content) -> the trap report.
    One rule for the one-shot and partial-fed paths so thresholds and
    the argmax tie-break cannot drift."""
    per_host = tpl_counts.groupBy("domain").agg(
        F.sum("n").alias("n_urls"),
        # deterministic argmax: struct max = highest count, ties broken
        # by lexicographically-last template (oracle-replicable rule)
        F.max(
            F.struct(F.col("n").alias("_n"), F.col("_tpl").alias("t"))
        ).alias("_top"),
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


def trap_template_partial(
    df: DataFrame,
    url_col: str = "url",
    content_col: str = "text",
    host_col: str | None = None,
) -> DataFrame:
    """Per-span ADDITIVE partial for the crawl loop: (domain, template,
    n). Counts sum across spans (the host_quality contract from the
    blocklist sweep: each sweep covers exactly its own rounds, a
    replayed sweep rewrites the identical partial), so the standing
    table grows O(hosts x live templates) and a sweep never rescans
    crawl history."""
    return (
        _trap_base(df, url_col, content_col, host_col)
        .groupBy("domain", F.col("_tpl").alias("template"))
        .agg(F.count("*").alias("n"))
    )


def trap_content_sketch(
    df: DataFrame,
    url_col: str = "url",
    content_col: str = "text",
    host_col: str | None = None,
    lgk: int = 12,
) -> DataFrame:
    """Per-span MERGEABLE novelty partial: (domain, hll) — one HLL
    sketch of content hashes per host per span. Distinct counts are not
    additive, but sketches union exactly (operators/sketches), so the
    sweep-time novelty over all spans is one O(hosts)-row merge instead
    of a re-distinct over every fetched body ever."""
    from .sketches import hll_sketches

    return hll_sketches(
        _trap_base(df, url_col, content_col, host_col),
        ["domain"],
        "_h",
        lgk,
    )


def trap_partials(
    df: DataFrame,
    url_col: str = "url",
    content_col: str = "text",
    host_col: str | None = None,
    lgk: int = 12,
) -> tuple[DataFrame, DataFrame]:
    """Both per-span partials off ONE pass: the shared (domain, _tpl,
    _h) projection is checkpointed so the template counts and the
    novelty sketch do not each re-scan and re-hash the span's page
    bodies (two write actions over one materialized base)."""
    from .sketches import hll_sketches

    base = _trap_base(df, url_col, content_col, host_col).localCheckpoint(
        eager=False
    )
    tpl = base.groupBy("domain", F.col("_tpl").alias("template")).agg(
        F.count("*").alias("n")
    )
    hll = hll_sketches(base, ["domain"], "_h", lgk)
    return tpl, hll


def trap_hosts_from_partials(
    tpl_partials: DataFrame,
    content_sketches: DataFrame,
    min_urls: int = 50,
    max_novelty: float = 0.2,
    min_template_frac: float = 0.8,
) -> DataFrame:
    """The sweep-time report over accumulated partials: sum the additive
    (domain, template, n) rows, union the novelty sketches, apply the
    SAME thresholds as :func:`detect_trap_hosts` (shared assembly).
    Novelty here is sketch-estimated — the ``approx=True`` contract;
    thresholds are fraction-scale, far above HLL error."""
    from .sketches import hll_estimates, hll_merge

    tpl_counts = tpl_partials.groupBy(
        "domain", F.col("template").alias("_tpl")
    ).agg(F.sum("n").alias("n"))
    novelty = hll_estimates(
        hll_merge(content_sketches, ["domain"]), ["domain"]
    ).select("domain", F.col("n_distinct").alias("n_content"))
    return _assemble_report(
        tpl_counts, novelty, min_urls, max_novelty, min_template_frac
    )

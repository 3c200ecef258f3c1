"""Revalidation-aware recrawl: the freshness loop the BFS crawl loop
does not cover (its seen-set blocks re-fetches by design — the
reference likewise re-stamps ``_crawl_epoch`` on upsert instead of
re-reading, /root/reference/src/metadata_crawler/api/stores/base.py:
411-425). This plan closes the cycle

    check history -> estimate_change_rate -> revisit_schedule
        -> due set -> conditional fetch -> classify_refetch
        -> checks delta (back into the history) + store delta

so a standing corpus stays fresh at a bandwidth cost proportional to
what actually changed: ``not_modified`` rows (the HTTP-304 analog)
never re-enter the store, and their body transfer is the saved cost
:func:`..operators.changes.revalidation_stats` reports.

Scale shape: the due batch is bounded (a recrawl round), the pages
snapshot and the prior store are the 10^10-row tables — both joins
stream the big side once with the batch broadcast (size-probed with
shuffle fallback), the round_loop fetch-join contract. Only url + hash
+ byte-length columns of the stores move; bodies stay behind column
pruning until the caller re-stores ``modified`` rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.changes import classify_refetch
from ..operators.frontier import small_enough_to_broadcast

_OUT_COLS = ("url", "status", "changed", "store_row", "bytes_saved")


def due_for_revisit(schedule: DataFrame, now_s: float) -> DataFrame:
    """The urls whose ``next_due_ts`` (from ``revisit_schedule``) has
    passed — one partition-prunable filter, no shuffle."""
    return schedule.filter(
        F.col("next_due_ts").cast("double") <= F.lit(float(now_s))
    ).select("url")


def recrawl_batch(
    due: DataFrame,
    pages: DataFrame,
    prior: DataFrame,
    page_url_col: str = "page_url",
    page_content_col: str = "text",
    prior_content_col: str = "text",
    etag_col: str | None = None,
    due_broadcast: bool | None = None,
    transform=None,
    keep_content: bool = False,
) -> DataFrame:
    """Conditionally re-fetch ``due`` urls against the ``pages`` snapshot
    (the simulation's live web) and classify each against the ``prior``
    store: ``not_modified`` | ``modified`` | ``new`` | ``gone`` (due but
    absent from the snapshot — the dead-link case).

    Returns (url, status, changed, store_row, bytes_saved); ``changed``
    is NULL for ``new``/``gone`` rows (neither is a change observation
    for the Cho & Garcia-Molina estimator).

    ``transform`` (optional) maps the BOUNDED hits set (url, _content)
    before hashing — e.g. byte-identical text extraction when ``pages``
    carries raw html but ``prior`` stores extracted text; running it
    post-join keeps the pandas UDF off the full snapshot scan.
    ``keep_content=True`` appends the (post-transform) ``content``
    column to surviving rows (NULL for gone) so callers can persist
    ``modified`` bodies without re-fetching."""
    d = due.select("url")
    if due_broadcast is None:
        d = d.localCheckpoint(eager=False)
        due_broadcast = small_enough_to_broadcast(d)
    d_side = F.broadcast(d) if due_broadcast else d
    # inner join streams the big pages side; the due batch is the build
    hits = pages.join(
        d_side, pages[page_url_col] == d["url"], "inner"
    ).select(d["url"].alias("url"), F.col(page_content_col).alias("_content"))
    if transform is not None:
        hits = transform(hits)
    # bounded by the due batch; checkpointed so the pages snapshot is
    # streamed ONCE — classify_refetch (two consumers) and the gone
    # branch's hit_urls build otherwise each re-run the pages join
    hits = hits.localCheckpoint(eager=False)
    classified = classify_refetch(
        hits,
        prior,
        content_col="_content",
        prior_content_col=prior_content_col,
        etag_col=etag_col,
        fetched_broadcast=due_broadcast,
    )
    hit_urls = hits.select("url")
    gone = d.join(
        F.broadcast(hit_urls) if due_broadcast else hit_urls,
        "url",
        "left_anti",
    ).select(
        "url",
        F.lit("gone").alias("status"),
        F.lit(None).cast("boolean").alias("changed"),
        F.lit(False).alias("store_row"),
        F.lit(0).cast("long").alias("bytes_saved"),
    )
    out = classified.select(*_OUT_COLS).unionByName(gone.select(*_OUT_COLS))
    if keep_content:
        # hits is checkpointed above — this join re-reads the bounded
        # set, not the snapshot
        out = out.join(
            hits.select("url", F.col("_content").alias("content")),
            "url",
            "left",
        )
    return out


def checks_delta(classified: DataFrame, now_s: float) -> DataFrame:
    """The rows a recrawl batch appends to the visit-check history that
    feeds ``estimate_change_rate``: one (url, ts, changed) row per
    completed content comparison. ``new``/``gone`` rows are excluded —
    a first fetch has no previous content to differ from, and a dead
    url yielded no content at all (keeping them would bias lambda_hat
    toward 0)."""
    return classified.filter(F.col("changed").isNotNull()).select(
        "url", F.lit(float(now_s)).alias("ts"), "changed"
    )

"""Streaming feed polling: RSS/Atom deltas -> deduped crawl seeds.

A production poller drops each fetched feed body as a (feed_url,
fetched_at, xml) row; this standing query turns those drops into seed
rows in-flight. The parsing is the SAME stateless column expressions the
batch path uses (functions/feeds.parse_feed — zero code fork, the
corpus_stream contract), so the only state is cross-batch URL dedup:
a feed advertises its newest N entries on EVERY poll, meaning the same
url reappears poll after poll — ``dropDuplicatesWithinWatermark`` on
the url expires dedup keys once the event-time watermark passes, so
state stays O(urls advertised within the lateness window) at any
stream length, and a url that resurfaces much later (a genuine update)
seeds again — exactly the recrawl semantics a freshness channel wants.

Reference analog: the reference's harvest loop re-walks its catalogues
each run (run.py add->index loop); feed polling is that loop as a
standing query over the web's change feed.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions.feeds import parse_feed

#: one fetched feed body (the poller's drop format)
FEED_STREAM_SCHEMA = "feed_url string, fetched_at timestamp, xml string"


def stream_feed_seeds(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    default_priority: float = 0.7,
    query_name: str = "feed_seeds",
):
    """Standing query over parquet feed-body deltas landing in
    ``input_dir``: parse both dialects map-side, thread the event-time
    column through the explode (parse_feed ``keep_cols``), then
    watermark-bounded cross-batch dedup on the advertised url. Emits
    the engine's seed shape (url, depth, priority, published) into the
    ``query_name`` memory sink (callers aiming at the crawl loop swap
    the sink). Returns the started StreamingQuery."""
    stream = (
        spark.readStream.schema(FEED_STREAM_SCHEMA)
        .parquet(input_dir)
        .withWatermark("fetched_at", watermark)
    )
    entries = parse_feed(stream, keep_cols=("fetched_at",))
    # fetched_at exists only to carry the watermark through the explode;
    # the emitted rows are exactly the engine's seed shape
    seeds = entries.dropDuplicatesWithinWatermark(["url"]).select(
        "url",
        F.lit(0).alias("depth"),
        F.lit(default_priority).alias("priority"),
        "published",
    )
    return (
        seeds.writeStream.format("memory")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )

"""Structured-Streaming variants of the crawl round (SURVEY §2.9).

The reference's crawl IS structurally a streaming job — bounded queues with
worker pools (T1-T3, /root/reference/src/metadata_crawler/data_collector.py:
74-78, api/metadata_stores.py:281-302), poison-pill shutdown (T4), epoch
watermarks for late re-discovery (T5, metadata_stores.py:331-337). Spark
mappings:

- ``stream_frontier_rounds``  file-source stream of frontier deltas ->
  ``foreachBatch`` running the SAME declarative round (dedup -> robots ->
  budget top-k) per micro-batch with exactly-once sink semantics; the
  analog of the scan-queue consumer loop.
- ``stream_hourly_rollup``    watermarked tumbling-window aggregation over
  the events stream (late data within the watermark still lands — the
  reference's 5-day grace period in miniature).
- ``politeness_gate_stateful``  ``applyInPandasWithState`` per-host state:
  the host's next-allowed-fetch timestamp persists ACROSS micro-batches —
  the one crawl operator that is genuinely stateful rather than a pure
  function of the batch (no reference analog; its politeness is implicit
  in queue concurrency).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FRONTIER_SCHEMA = "url string, depth int, score double"


def _list_epoch_dirs(spark: SparkSession, out_dir: str, before: int) -> list[str]:
    """``epoch=NNNNN`` child dirs of ``out_dir`` with epoch < ``before``,
    sorted, as fully-qualified path strings. Listed via the Hadoop
    FileSystem API so the same code works on file://, hdfs:// and s3a://
    (driver-local ``os.listdir`` silently breaks off-local-disk)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(out_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return []
    out: list[tuple[int, str]] = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("epoch="):
            try:
                epoch = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if epoch < before:
                out.append((epoch, st.getPath().toString()))
    return [p for _, p in sorted(out)]


def _max_epoch(spark: SparkSession, out_dir: str) -> int:
    """Highest epoch=NNNNN under ``out_dir`` (-1 when none) — the
    stale-output probe for a reused out_dir."""
    dirs = _list_epoch_dirs(spark, out_dir, before=1 << 62)
    if not dirs:
        return -1
    return max(int(d.rsplit("epoch=", 1)[1]) for d in dirs)


def stream_frontier_rounds(
    spark: SparkSession,
    input_dir: str,
    robots: DataFrame,
    hosts: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    query_name: str = "frontier_rounds",
    score_decimals: int = 9,
    salt_parts: int = 4,
):
    """Each parquet file landing in ``input_dir`` is a frontier delta; each
    micro-batch runs one scheduling round and appends the scheduled set.
    foreachBatch + (batch-scoped output paths) = exactly-once.
    ``score_decimals``/``salt_parts`` should come from the SAME
    CrawlConfig the batch loop uses so the two paths schedule
    identically (defaults preserve this module's historical values)."""
    from ..functions.urls import with_canonical, with_url_hash
    from ..operators.frontier import (
        schedule_round,
        small_enough_to_broadcast,
        valid_urls,
    )
    from ..plans.round_loop import _combine_frontier

    stream = (
        spark.readStream.schema(FRONTIER_SCHEMA).parquet(input_dir)
    )
    # broadcast/shuffle switch decided ONCE per stream (bounded probes),
    # not per micro-batch — and auto, so a 10^8-host rules table flips to
    # the shuffle join by default (VERDICT r2 item 4)
    rb = small_enough_to_broadcast(robots.select("host"))
    hb = small_enough_to_broadcast(hosts.select("host"))

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        f = with_canonical(batch_df, "url").select("url", "depth", "score")
        f = _combine_frontier(
            with_url_hash(valid_urls(f)), score_decimals
        )
        sched = schedule_round(
            f, hosts, robots, salt_parts=salt_parts,
            robots_broadcast=rb, hosts_broadcast=hb,
        )
        (
            sched.select("url", "host", "depth", "rank", "fetch_offset_ms")
            .write.mode("overwrite")
            .parquet(f"{out_dir}/epoch={epoch_id:05d}")
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def stream_crawl_rounds(
    spark: SparkSession,
    input_dir: str,
    robots: DataFrame,
    hosts: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    query_name: str = "crawl_rounds",
    score_decimals: int = 9,
    salt_parts: int = 4,
):
    """stream_frontier_rounds + a CROSS-BATCH seen set: each micro-batch
    anti-joins the union of every PRIOR epoch's scheduled set before
    scheduling (the reference's whole-crawl unique-index semantics,
    api/stores/mongodb.py:135-166 — a URL attempted in any earlier batch
    is never re-scheduled). Exactly-once: the epoch output path is scoped
    by epoch_id and only epochs < current are read back, so replaying a
    failed batch reads the same seen set and overwrites the same path.
    """
    from ..functions.urls import with_canonical, with_url_hash
    from ..operators.frontier import (
        schedule_round,
        small_enough_to_broadcast,
        valid_urls,
    )
    from ..operators.seen import dedup_against_seen
    from ..plans.round_loop import _combine_frontier

    stream = spark.readStream.schema(FRONTIER_SCHEMA).parquet(input_dir)
    rb = small_enough_to_broadcast(robots.select("host"))
    hb = small_enough_to_broadcast(hosts.select("host"))

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        f = with_canonical(batch_df, "url").select("url", "depth", "score")
        f = _combine_frontier(
            with_url_hash(valid_urls(f)), score_decimals
        )
        # a REUSED out_dir with a fresh checkpoint restarts epoch_id at
        # 0 while stale epoch dirs from the previous run still exist —
        # those would silently poison the seen set (URLs never scheduled
        # THIS run anti-join away). Epochs == current are fine (replay
        # overwrites); anything ahead is not ours.
        if _max_epoch(spark, out_dir) > epoch_id:
            raise ValueError(
                f"out_dir {out_dir} holds epoch dirs beyond the current "
                f"epoch {epoch_id}: reused output of a previous run — "
                "clear it or keep the original checkpoint"
            )
        # prior epochs listed through the Hadoop FileSystem API, NOT
        # os.listdir — the seen-set read must work on every filesystem the
        # writes do (HDFS/S3), not only file:// (ADVICE r2)
        prior = _list_epoch_dirs(spark, out_dir, before=epoch_id)
        seen = (
            spark.read.parquet(*prior)
            .select("url_hash_hi", "url_hash_lo")
            if prior
            else None
        )
        new = dedup_against_seen(f, seen)
        sched = schedule_round(
            new, hosts, robots, salt_parts=4,
            robots_broadcast=rb, hosts_broadcast=hb,
        )
        (
            sched.select(
                "url", "host", "depth", "rank", "fetch_offset_ms",
                "url_hash_hi", "url_hash_lo",
            )
            .write.mode("overwrite")
            .parquet(f"{out_dir}/epoch={epoch_id:05d}")
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def stream_hourly_rollup(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    watermark: str = "2 hours",
    query_name: str = "hourly_rollup",
):
    """Watermarked tumbling-window count/sum per event_type into the memory
    sink (batch-equivalent: __spark_entry__.q28_hourly_rollup)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_millis(F.col("window.start")).alias("hour_ms"),
            "event_type",
            "n_events",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


POLITE_OUT_SCHEMA = "host string, url string, planned_start_ms long"
POLITE_STATE_SCHEMA = "next_free_ms long"


def _politeness_fn(key, pdfs, state: GroupState):
    """Per-host token clock: each URL is planned at
    max(batch_arrival, host.next_free) + i*crawl_delay; next_free persists
    across micro-batches so a host hammered in batch N stays throttled in
    batch N+1.

    The recurrence start_i = max(arrival_i, next_free_{i-1}),
    next_free_i = start_i + delay_i vectorizes: with C = cumsum(delay)
    (inclusive), Cprev = C - delay, B_i = arrival_i - Cprev_i (B_0 folded
    with the persisted next_free), M = cummax(B) gives
    start_i = Cprev_i + M_i and final next_free = C_last + M_last — one
    numpy pass per host group, no per-row Python.
    """
    import numpy as np

    (host,) = key
    next_free = state.get[0] if state.exists else 0
    chunks = [p for p in pdfs if not p.empty]
    if not chunks:
        state.update((int(next_free),))
        yield pd.DataFrame(columns=["host", "url", "planned_start_ms"])
        return
    pdf = pd.concat(chunks, ignore_index=True).sort_values(
        "url", kind="mergesort", ignore_index=True
    )
    # NULL-proof: a single NULL arrival/delay row must not kill the
    # whole stateful query (pandas delivers nullable longs as float64
    # with NaN; int64 conversion raises). NULL delay = no politeness
    # gap; NULL arrival = immediately available.
    arrival = pdf["arrival_ms"].fillna(0).to_numpy(np.int64)
    delay = pdf["crawl_delay_ms"].fillna(0).to_numpy(np.int64)
    c = np.cumsum(delay)
    cprev = c - delay
    b = arrival - cprev
    b[0] = max(b[0], next_free)
    m = np.maximum.accumulate(b)
    start = cprev + m
    state.update((int(c[-1] + m[-1]),))
    yield pd.DataFrame(
        {"host": host, "url": pdf["url"], "planned_start_ms": start}
    )


def politeness_gate_stateful(urls_stream: DataFrame):
    """urls_stream: streaming DF (host, url, arrival_ms, crawl_delay_ms).
    Returns the planned fetch schedule with cross-batch per-host state."""
    return urls_stream.groupBy("host").applyInPandasWithState(
        _politeness_fn,
        POLITE_OUT_SCHEMA,
        POLITE_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )

"""Bucketed pages table: the fetch join reads the big side without an
Exchange (co-located join — the beyond-broadcast scale path)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from metadata_crawler_spark.sources.tables import write_bucketed


def test_bucketed_join_has_no_exchange_on_big_side(spark, tables, tmp_path):
    # warehouse dir is a static conf; the session default (cwd/spark-warehouse)
    # is fine — the table is dropped at the end
    pages = tables["pages"].select("url", "warc_ts")
    write_bucketed(pages, "pages_bucketed", "url", n_buckets=8)
    big = spark.table("pages_bucketed")
    sched = tables["seeds"].select("url").repartition(4)
    # force non-broadcast so the bucket layout is what saves the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = big.join(sched, "url")
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    # exactly ONE Exchange (the small side); the bucketed scan has none
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan[:2000]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # sanity: join works
    assert j.count() > 0
    spark.sql("DROP TABLE IF EXISTS pages_bucketed")

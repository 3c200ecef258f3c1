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
        F.col(key).alias("k"), F.md5(F.col(content_col)).alias("old_hash")
    )
    n = new.select(
        F.col(key).alias("k"), F.md5(F.col(content_col)).alias("new_hash")
    )
    j = o.join(n, "k", "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("new"))
        .when(F.col("new_hash").isNull(), F.lit("gone"))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col("k").alias(key), status.alias("status"))


def change_stats(changes: DataFrame) -> DataFrame:
    return changes.groupBy("status").agg(F.count("*").alias("n_urls"))

"""File-discovery sources: the POSIX/S3 recursive-scan analog (SURVEY §2.1
S1-S3) as Spark data sources instead of a Rust walkdir.

Reference parity: ``rglob(path, glob_pattern, suffixes)`` over a storage
tree in a Tokio threadpool (/root/reference/src/helpers_rs/
posix_backend.rs:168-253) with suffix/glob predicates applied inside the
walker (:209-237). Spark's ``binaryFile`` source does the same walk
JVM-side with ``pathGlobFilter`` pushed into the file index — discovery is
a table scan, parallel across the listing, no driver-side recursion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def discover_files(
    spark: SparkSession,
    root: str,
    glob: str = "*",
    with_content: bool = False,
) -> DataFrame:
    """Recursive discovery under ``root`` matching ``glob`` (S1).

    Returns (path, size, mtime[, content]). The glob filter is applied by
    the file index (pushdown — files that don't match are never opened),
    and ``content`` is only read when asked (column pruning keeps
    binaryFile from materializing bytes otherwise).
    """
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    cols = [
        F.col("path"),
        F.col("length").alias("size"),
        F.col("modificationTime").alias("mtime"),
    ]
    if with_content:
        cols.append(F.col("content"))
    return df.select(*cols)


def discover_with_suffixes(
    spark: SparkSession, root: str, suffixes: list[str]
) -> DataFrame:
    """Suffix-filter discovery (the reference's default suffix set gate,
    api/config.py:577-585): one glob per suffix, unioned by the source."""
    if not suffixes:
        return discover_files(spark, root)
    pattern = "*.{" + ",".join(s.lstrip(".") for s in suffixes) + "}"
    return discover_files(spark, root, pattern)

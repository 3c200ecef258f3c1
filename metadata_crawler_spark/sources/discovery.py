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

import re

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


#: directory suffixes treated as ONE data object (reference F7: a `.zarr`
#: DIRECTORY is a leaf file to the walker, posix_backend.rs:198-206)
DIR_OBJECT_SUFFIXES = (".zarr",)


def discover_data_objects(
    spark: SparkSession,
    root: str,
    suffixes: list[str] | None = None,
    dir_suffixes: tuple[str, ...] = DIR_OBJECT_SUFFIXES,
) -> DataFrame:
    """Discovery with dir-as-file semantics: every file under a
    ``*.zarr/`` directory collapses into one object row for the directory
    itself — (path, size=sum, mtime=max, n_files) — then the suffix gate
    applies to the OBJECT path (so ``.zarr`` stores pass a ``.zarr``
    suffix filter even though their inner chunk files never would).
    Collapse is a groupBy on a regexp prefix — distributed, no driver walk.

    Caveat: Hadoop's file index skips dot/underscore-prefixed members, so
    zarr-v2 metadata files (``.zarray``) are invisible — the store still
    collapses to one object via its chunk files, but ``size``/``n_files``
    count only visible members (zarr v3's ``zarr.json`` lists normally).
    """
    alt = "|".join(re.escape(s) for s in dir_suffixes)
    files = discover_files(spark, root)
    obj_prefix = F.regexp_extract("path", rf"^(.*?(?:{alt}))(?:/|$)", 1)
    object_path = F.when(obj_prefix != "", obj_prefix).otherwise(F.col("path"))
    objects = files.groupBy(object_path.alias("path")).agg(
        F.sum("size").alias("size"),
        F.max("mtime").alias("mtime"),
        F.count("*").alias("n_files"),
    )
    if suffixes:
        gate = None
        for s in suffixes:
            cond = F.col("path").endswith(s)
            gate = cond if gate is None else (gate | cond)
        objects = objects.filter(gate)
    return objects


# ---------------------------------------------------------------------------
# Object-store adapters (SURVEY §2.1 S4-S6): the SAME binaryFile scan works
# against s3a:// / abfss:// / swift:// URIs — an object store has no real
# directories, so recursiveFileLookup is a flat LIST under the key prefix
# (cheaper than the POSIX walk). What differs is only connector config,
# which these helpers inject into the live Hadoop configuration.
# The sandbox has no object-store connector jars, so non-file schemes are
# exercised structurally (config injection + file:// URI scheme path);
# on a real cluster the hadoop-aws/hadoop-azure jars complete the path.
# ---------------------------------------------------------------------------


def s3_conf(
    access_key: str | None = None,
    secret_key: str | None = None,
    endpoint: str | None = None,
    path_style: bool = True,
    anonymous: bool = False,
) -> dict[str, str]:
    """fs.s3a.* settings for an S3/MinIO/Ceph endpoint (reference S4/S5
    analog: backends/s3.py credentials + boto session)."""
    conf: dict[str, str] = {
        "fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
        "fs.s3a.path.style.access": str(path_style).lower(),
    }
    if access_key:
        conf["fs.s3a.access.key"] = access_key
    if secret_key:
        conf["fs.s3a.secret.key"] = secret_key
    if endpoint:
        conf["fs.s3a.endpoint"] = endpoint
    if anonymous:
        conf["fs.s3a.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
        )
    return conf


def swift_conf(
    auth_url: str, username: str, password: str, tenant: str,
    service: str = "mcs",
) -> dict[str, str]:
    """fs.swift.* settings (reference S6 analog: backends/swift.py keystone
    auth); Hadoop's swift connector keys are per-service."""
    p = f"fs.swift.service.{service}"
    return {
        "fs.swift.impl": "org.apache.hadoop.fs.swift.snative.SwiftNativeFileSystem",
        f"{p}.auth.url": auth_url,
        f"{p}.username": username,
        f"{p}.password": password,
        f"{p}.tenant": tenant,
    }


def configure_object_store(spark: SparkSession, conf: dict[str, str]) -> None:
    """Inject connector settings into the live Hadoop configuration (takes
    effect for subsequent reads; no session restart)."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        hconf.set(k, v)

"""Manifest/table layer: atomic commit, torn-write tolerance, round reads."""

from __future__ import annotations

import json
import os

from metadata_crawler_spark.sources.tables import ManifestLog, read_rounds, write_round_table


def test_manifest_roundtrip(tmp_path):
    log = ManifestLog(str(tmp_path))
    assert log.read() is None
    log.commit({"last_round": 0, "x": 1})
    st = log.read()
    assert st["last_round"] == 0 and "committed_at" in st


def test_torn_tmp_file_invisible(tmp_path):
    log = ManifestLog(str(tmp_path))
    log.commit({"last_round": 3})
    # a crashed writer leaves a partial tmp file — readers never see it
    with open(log.path + ".tmp", "w") as fh:
        fh.write('{"last_round": 99, "TRUNCATED')
    assert log.read()["last_round"] == 3


def test_commit_overwrites_atomically(tmp_path):
    log = ManifestLog(str(tmp_path))
    for i in range(5):
        log.commit({"last_round": i})
        assert log.read()["last_round"] == i


def test_round_tables(spark, tmp_path):
    df = spark.range(10).toDF("id")
    root = str(tmp_path)
    write_round_table(df, root, 0, "t")
    write_round_table(df, root, 1, "t")
    both = read_rounds(spark, root, "t", 1)
    assert both.count() == 20
    only0 = read_rounds(spark, root, "t", 0)
    assert only0.count() == 10
    assert read_rounds(spark, root, "missing", 1) is None

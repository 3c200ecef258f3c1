"""As-of join vs pandas merge_asof ground truth; binaryFile discovery."""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F
import pytest

from metadata_crawler_spark.operators.asof import asof_join
from metadata_crawler_spark.sources.discovery import (
    discover_files,
    discover_with_suffixes,
)


def test_asof_matches_merge_asof(spark):
    left = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "ts": [5, 10, 15, 3, 30, 7],
            "event": ["a", "b", "c", "d", "e", "f"],
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 2, 2, 4],
            "ts": [4, 10, 5, 20, 1],
            "rate": [1.5, 2.5, 7.0, 8.0, 9.9],
        }
    )
    l = spark.createDataFrame(left)
    r = spark.createDataFrame(right)
    got = (
        asof_join(l, r, "ts", ["k"], ["rate"])
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    expect = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"), on="ts", by="k"
    ).sort_values(["k", "ts"]).reset_index(drop=True)
    assert list(got["rate"].fillna(-1)) == list(expect["rate"].fillna(-1))
    # tie: right at exactly left.ts applies (k=1, ts=10 -> 2.5)
    assert float(got[(got.k == 1) & (got.ts == 10)]["rate"].iloc[0]) == 2.5
    # no earlier right row -> null (k=3)
    assert got[got.k == 3]["rate"].isna().all()


def test_discover_files(spark, tmp_path):
    for name in ("a.nc", "b.nc", "sub/c.nc", "sub/d.txt", "e.zarr"):
        p = tmp_path / name
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"x" * len(name))
    found = discover_files(spark, str(tmp_path), "*.nc")
    paths = sorted(r.path.split("/")[-1] for r in found.collect())
    assert paths == ["a.nc", "b.nc", "c.nc"]
    assert {"path", "size", "mtime"} == set(found.columns)
    # content only when asked
    withc = discover_files(spark, str(tmp_path), "*.txt", with_content=True)
    row = withc.first()
    assert bytes(row.content) == b"x" * len("sub/d.txt")
    suf = discover_with_suffixes(spark, str(tmp_path), [".nc", ".zarr"])
    assert suf.count() == 4

"""JSONL shard sink: layout, roundtrip via spark.read.json, determinism."""

from __future__ import annotations

import glob
import gzip
import json
import os

from pyspark.sql import functions as F

from metadata_crawler_spark.sources.jsonl_sink import write_jsonl_shards


def _docs(n: int):
    return [
        (i, f"doc {i}\nwith newline é and \"quotes\"", ["a", "b"][: i % 3])
        for i in range(n)
    ]


def _write(spark, path, n=100, parts=4, **kw):
    out = str(path)
    os.makedirs(out, exist_ok=True)
    df = spark.createDataFrame(
        _docs(n), "id long, text string, tags array<string>"
    ).repartition(parts)
    man = write_jsonl_shards(df, out, **kw).toPandas()
    return out, man


def test_roundtrip_spark_read_json(spark, tmp_path):
    out, man = _write(spark, tmp_path / "ds")
    assert man["n_rows"].sum() == 100
    back = spark.read.json(out + "/*.jsonl.gz")
    rows = {r.id: (r.text, list(r.tags or [])) for r in back.collect()}
    assert rows == {i: (t, tg) for i, t, tg in _docs(100)}


def test_lines_are_valid_json_with_escapes(spark, tmp_path):
    out, man = _write(spark, tmp_path / "ds2", n=10, parts=1)
    assert len(man) == 1
    with gzip.open(man.shard[0], "rt", encoding="utf-8") as fh:
        lines = fh.read().splitlines()
    assert len(lines) == 10
    for ln in lines:
        obj = json.loads(ln)
        assert "\n" in obj["text"]  # escaped in transit, restored by parse


def test_manifest_sizes_match_disk(spark, tmp_path):
    out, man = _write(spark, tmp_path / "ds3")
    for row in man.itertuples():
        assert os.path.getsize(row.shard) == row.n_bytes


def test_rolling_and_uncompressed(spark, tmp_path):
    out, man = _write(
        spark, tmp_path / "ds4", n=500, parts=1,
        target_shard_bytes=2000, compress=False,
    )
    assert len(man) > 2
    assert all(s.endswith(".jsonl") for s in man["shard"])
    back = spark.read.json(out + "/*.jsonl")
    assert back.count() == 500
    assert not glob.glob(out + "/*.tmp")


def test_deterministic_rewrite(spark, tmp_path):
    out1, _ = _write(spark, tmp_path / "a", parts=2)
    out2, _ = _write(spark, tmp_path / "b", parts=2)
    f1 = sorted(glob.glob(out1 + "/*.jsonl.gz"))
    f2 = sorted(glob.glob(out2 + "/*.jsonl.gz"))
    assert [os.path.basename(f) for f in f1] == [
        os.path.basename(f) for f in f2
    ]
    for a, b in zip(f1, f2):
        assert open(a, "rb").read() == open(b, "rb").read()


def test_nulls_and_empty_partitions(spark, tmp_path):
    out = str(tmp_path / "ds5")
    os.makedirs(out)
    df = spark.createDataFrame(
        [(1, None), (2, "x")], "id long, text string"
    ).repartition(8)
    man = write_jsonl_shards(df, out).toPandas()
    assert man["n_rows"].sum() == 2
    back = {r.id: r.text for r in spark.read.json(out + "/*.jsonl.gz").collect()}
    # to_json drops NULL fields; the reader restores them as null
    assert back == {1: None, 2: "x"}

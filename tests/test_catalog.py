"""Recursive catalogue walk (S7): BFS min-depth, cycle safety, dangling
refs, deep chains — reference semantics of _walk_yaml_catalogue
(backends/intake.py:45-110) re-expressed as a level-wise DataFrame walk."""

from __future__ import annotations

import json

from metadata_crawler_spark.sources.catalog import walk_catalog


def _cats(spark, spec: dict[int, tuple[list[int], list[str]]]):
    rows = [
        (cid, json.dumps({"name": f"cat_{cid}", "children": kids, "urls": urls}))
        for cid, (kids, urls) in spec.items()
    ]
    return spark.createDataFrame(rows, "cat_id long, catalog_json string")


def test_walk_emits_min_depth_and_survives_cycles(spark):
    # 0 -> {1, 2}; 1 -> {3}; 2 -> {3 (again, deeper? no: same depth), 0 (cycle)}
    # 3 -> {1 (cycle back)}
    spec = {
        0: ([1, 2], ["u0"]),
        1: ([3], ["u1a", "u1b"]),
        2: ([3, 0], []),
        3: ([1], ["u3"]),
    }
    out = walk_catalog(spark, _cats(spark, spec), roots=[0])
    got = {(r.cat_id, r.depth, r.url) for r in out.collect()}
    assert got == {
        (0, 0, "u0"),
        (1, 1, "u1a"), (1, 1, "u1b"),
        (3, 2, "u3"),
    }
    names = {r.cat_id: r.cat_name for r in out.collect()}
    assert names == {0: "cat_0", 1: "cat_1", 3: "cat_3"}


def test_walk_ignores_dangling_refs_and_unreachable(spark):
    spec = {
        0: ([99, 1], ["r"]),   # 99 does not exist
        1: ([], ["a"]),
        7: ([], ["island"]),   # unreachable from root
    }
    out = walk_catalog(spark, _cats(spark, spec), roots=[0])
    assert {r.url for r in out.collect()} == {"r", "a"}


def test_walk_deep_chain_bounded_lineage(spark):
    # a 25-deep linear chain: would blow up plan depth without the
    # per-level localCheckpoint; must return every level exactly once
    n = 25
    spec = {i: ([i + 1] if i + 1 < n else [], [f"u{i}"]) for i in range(n)}
    out = walk_catalog(spark, _cats(spark, spec), roots=[0])
    rows = sorted((r.cat_id, r.depth) for r in out.collect())
    assert rows == [(i, i) for i in range(n)]


def test_walk_multiple_roots(spark):
    spec = {0: ([], ["x"]), 5: ([6], []), 6: ([], ["y"])}
    out = walk_catalog(spark, _cats(spark, spec), roots=[0, 5])
    got = {(r.cat_id, r.depth, r.url) for r in out.collect()}
    assert got == {(0, 0, "x"), (6, 1, "y")}

"""Recursive intake-catalogue walk (SURVEY §2.1 S7, full parity).

Reference parity: ``_walk_yaml_catalogue`` recursively descends a
catalogue-of-catalogues — each YAML document declares child *sources* that
are either further catalogues (recursed into) or leaf datasets (emitted) —
and the intake-esm branch explodes a dataframe of assets
(/root/reference/src/metadata_crawler/backends/intake.py:45-110,148-168).

Spark redesign: the recursion stack becomes a BFS driver loop over
DataFrames — one JVM-only join round per catalogue DEPTH, not per
catalogue (the reference visits one catalogue per recursive call). Each
level:

  frontier(cat ids) --inner join catalogs--> this level's documents
    --emit leaf urls / collect child refs--> next frontier
    --anti-join visited (cycle-safe)-->      new frontier

Catalogue JSON is parsed ONCE up front (``from_json``, codegen'd);
frontiers are tiny id sets (broadcast into the join) and are
``localCheckpoint``-ed per level so lineage stays bounded however deep
the catalog tree goes. A catalogue that references an ancestor (cycle)
is simply never revisited — first visit wins, i.e. BFS min-depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: shape of one catalogue document: child catalogue refs + leaf data urls
CATALOG_JSON_SCHEMA = (
    "name string, children array<bigint>, urls array<string>"
)


def parse_catalogs(
    catalogs: DataFrame,
    id_col: str = "cat_id",
    json_col: str = "catalog_json",
) -> DataFrame:
    """(cat_id, catalog_json) -> (cat_id, cat_name, children, urls)."""
    return catalogs.select(
        F.col(id_col).cast("long").alias("cat_id"),
        F.from_json(F.col(json_col), CATALOG_JSON_SCHEMA).alias("c"),
    ).select(
        "cat_id",
        F.col("c.name").alias("cat_name"),
        F.coalesce("c.children", F.array().cast("array<bigint>")).alias(
            "children"
        ),
        F.coalesce("c.urls", F.array().cast("array<string>")).alias("urls"),
    )


def walk_catalog(
    spark: SparkSession,
    catalogs: DataFrame,
    roots: list[int],
    id_col: str = "cat_id",
    json_col: str = "catalog_json",
    max_depth: int = 40,
) -> DataFrame:
    """Expand a catalogue-of-catalogues to its leaf data objects.

    Returns one row per (reachable catalogue, leaf url):
    ``(cat_id long, depth long, cat_name string, url string)`` where depth
    is the BFS first-visit depth from ``roots``. Refs to catalogues absent
    from the table are ignored (the reference logs-and-skips unreadable
    children); cycles terminate (visited set), bounded by ``max_depth``.
    """
    parsed = parse_catalogs(catalogs, id_col, json_col).persist()
    try:
        frontier = spark.createDataFrame(
            [(int(r),) for r in roots], "cat_id bigint"
        ).distinct().localCheckpoint()
        visited = frontier
        levels: list[DataFrame] = []
        depth = 0
        while depth <= max_depth and frontier.count() > 0:
            hit = parsed.join(F.broadcast(frontier), "cat_id", "inner")
            # eager checkpoint: the returned union must not re-scan the
            # catalogs table once per level, and parsed can be unpersisted
            # before the caller consumes the result
            levels.append(
                hit.select(
                    "cat_id",
                    F.lit(depth).cast("long").alias("depth"),
                    "cat_name",
                    "urls",
                ).localCheckpoint()
            )
            nxt = (
                hit.select(F.explode("children").alias("cat_id"))
                .distinct()
                .join(visited, "cat_id", "left_anti")
                .localCheckpoint()  # bound lineage across levels
            )
            visited = visited.unionByName(nxt).localCheckpoint()
            frontier = nxt
            depth += 1
        if not levels:
            return spark.createDataFrame(
                [], "cat_id long, depth long, cat_name string, url string"
            )
        out = levels[0]
        for lv in levels[1:]:
            out = out.unionByName(lv)
        return out.select(
            "cat_id", "depth", "cat_name", F.explode("urls").alias("url")
        )
    finally:
        parsed.unpersist()

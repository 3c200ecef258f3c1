"""Sitemap ingestion: robots `Sitemap:` directives + sitemap.xml parsing.

Real crawlers seed frontiers from sitemaps, not just link discovery —
the sitemaps protocol (sitemaps.org) is how hosts advertise their own
URL inventory with freshness (`lastmod`) and `priority` hints, which map
directly onto this engine's frontier score/ordering. Reference analog:
the catalogue-of-catalogues walk (S7, backends/intake.py:45-110) — a
sitemapindex is exactly a catalogue whose children are catalogues, and
``walk_sitemaps`` reuses the same bounded-BFS driver-loop shape as
``sources/catalog.walk_catalog`` (depth rounds, anti-join visited set,
localCheckpoint per level).

Everything is JVM column expressions: fragment extraction by regexp
(namespace-proof; per-entry fields must come from per-entry fragments —
a document-level xpath loses the loc<->lastmod pairing when optional
fields are missing), XML entity unescape as a replace chain, lastmod
via the engine's timestamp-coercion ladder semantics (ISO date or
datetime). No per-row Python anywhere.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: one parsed sitemap entry (leaf url or child sitemap ref)
SITEMAP_ENTRY_SCHEMA = (
    "sitemap_url string, url string, lastmod timestamp, "
    "changefreq string, priority double"
)


def xml_unescape(col: Column) -> Column:
    """The five predefined XML entities (amp LAST so '&amp;lt;' does not
    double-decode)."""
    out = col
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def robots_sitemap_urls(
    robots: DataFrame, body_col: str = "body", host_col: str = "host"
) -> DataFrame:
    """Extract `Sitemap: <url>` directives from robots.txt bodies
    (RFC 9309 §2.2.4 treats them as extension lines valid anywhere in
    the file, case-insensitive, outside any agent group). Returns
    (host, sitemap_url), one row per directive."""
    urls = F.regexp_extract_all(
        F.col(body_col), F.lit(r"(?im)^[ \t]*sitemap:[ \t]*(\S+)"), F.lit(1)
    )
    return robots.select(
        F.col(host_col).alias("host"), F.explode(urls).alias("sitemap_url")
    )


def _frag_field(frag: Column, tag: str) -> Column:
    """<tag>value</tag> within one entry fragment, trimmed + unescaped;
    NULL when absent."""
    raw = F.regexp_extract(frag, rf"(?s)<{tag}[^>]*>\s*(.*?)\s*</{tag}>", 1)
    return F.when(raw == "", None).otherwise(xml_unescape(raw))


def _entries(df: DataFrame, xml_col: str, url_col: str, tag: str) -> DataFrame:
    """Explode <url>/<sitemap> entry fragments with per-fragment fields."""
    frags = F.regexp_extract_all(
        F.col(xml_col), F.lit(rf"(?s)<{tag}[^>]*>.*?</{tag}>"), F.lit(0)
    )
    frag = F.col("_frag")
    # lastmod: W3C datetime — bare date, or datetime with zone designator.
    # W3C explicitly allows fractional seconds (2024-05-01T10:00:00.000Z,
    # emitted by many generators, with any fraction width); rather than
    # one ladder rung per fraction width, strip the fraction up front —
    # a no-op on unfractioned values — so the three rungs cover all of it.
    lastmod_raw = F.regexp_replace(
        _frag_field(frag, "lastmod"), r"\.\d+", ""
    )
    # try_to_timestamp: the non-matching rungs of the ladder must yield
    # NULL for coalesce, not an ANSI parse error
    lastmod = F.coalesce(
        F.try_to_timestamp(lastmod_raw, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(lastmod_raw, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(lastmod_raw, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
    )
    return df.select(
        F.col(url_col).alias("sitemap_url"), F.explode(frags).alias("_frag")
    ).select(
        "sitemap_url",
        _frag_field(frag, "loc").alias("url"),
        lastmod.alias("lastmod"),
        _frag_field(frag, "changefreq").alias("changefreq"),
        _frag_field(frag, "priority").cast("double").alias("priority"),
    ).where(F.col("url").isNotNull())


def parse_sitemap(
    df: DataFrame, xml_col: str = "xml", url_col: str = "sitemap_url"
) -> tuple[DataFrame, DataFrame]:
    """(sitemap_url, xml) -> (leaf url entries, child sitemap refs).

    Leaf entries come from ``<urlset><url>`` blocks with the schema
    SITEMAP_ENTRY_SCHEMA; children from ``<sitemapindex><sitemap>``
    blocks (same shape — their ``url`` column is the child sitemap's
    location). A document can only be one of the two per the protocol,
    but mixed/malformed input degrades gracefully: each block family is
    extracted independently.
    """
    leaves = _entries(df, xml_col, url_col, "url")
    children = _entries(df, xml_col, url_col, "sitemap")
    return leaves, children


def walk_sitemaps(
    spark: SparkSession,
    roots: DataFrame,
    fetch: Callable[[DataFrame], DataFrame],
    max_depth: int = 4,
) -> DataFrame:
    """Bounded-BFS sitemap walk (the walk_catalog pattern): ``roots`` has
    one ``sitemap_url`` column; ``fetch`` maps a DataFrame of sitemap
    urls to (sitemap_url, xml) — injected so the walk composes with any
    fetch layer (tests use a lookup-table fetcher; production wires the
    crawl fetch join). Returns all leaf entries (SITEMAP_ENTRY_SCHEMA).

    Each depth round is one fetch + one JVM parse; sitemapindex children
    anti-join the visited set (cycles and repeated refs fetch once, BFS
    min-depth). Frontiers are tiny url sets, localCheckpoint-ed so
    lineage stays bounded at any nesting depth.
    """
    frontier = roots.select("sitemap_url").distinct().localCheckpoint()
    visited = frontier
    out: DataFrame | None = None
    for _ in range(max_depth):
        if not frontier.take(1):
            break
        fetched = fetch(frontier)
        leaves, children = parse_sitemap(fetched)
        out = leaves if out is None else out.unionByName(leaves)
        frontier = (
            children.select(F.col("url").alias("sitemap_url"))
            .distinct()
            .join(visited, "sitemap_url", "left_anti")
            .localCheckpoint()
        )
        visited = visited.unionByName(frontier).localCheckpoint()
    if out is None:
        return spark.createDataFrame([], SITEMAP_ENTRY_SCHEMA)
    return out


def sitemap_seeds(
    entries: DataFrame, default_priority: float = 0.5
) -> DataFrame:
    """Leaf entries -> the engine's seeds shape (url, depth, priority):
    protocol priority (default 0.5 per spec) becomes the OPIC seed
    score; depth 0 (sitemap-advertised urls are roots, like the
    reference's explicit search paths)."""
    return entries.select(
        "url",
        F.lit(0).alias("depth"),
        F.coalesce("priority", F.lit(default_priority)).alias("priority"),
    ).groupBy("url").agg(
        F.max("depth").alias("depth"), F.max("priority").alias("priority")
    )
"""RSS/Atom feed ingestion: autodiscovery from HTML + feed parsing.

Feeds are the freshness sibling of sitemaps (functions/sitemaps.py):
sitemaps advertise a host's full URL inventory, feeds advertise its
NEWEST urls with publish timestamps — real crawl schedulers poll feeds
at high frequency to catch new content between sitemap refreshes, and
the parsed ``published`` timestamps feed the same recrawl machinery as
sitemap ``lastmod`` (operators/changes.py). Reference analog: the
catalogue read path (S8, backends/intake.py) — a feed is a catalogue of
leaf documents with freshness metadata.

Same implementation contract as sitemaps: everything is JVM column
expressions — per-entry regexp fragments (per-entry fields must come
from per-entry fragments so loc<->date pairing survives missing
optional fields), XML entity unescape, timestamp ladders for the two
date dialects (RFC 822 for RSS ``pubDate``, W3C/ISO 8601 for Atom).
No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sitemaps import _frag_field, xml_unescape

#: one parsed feed entry
FEED_ENTRY_SCHEMA = (
    "feed_url string, kind string, url string, title string, "
    "published timestamp"
)


def _attr(frag: Column, pattern: str) -> Column:
    raw = F.regexp_extract(frag, pattern, 1)
    return F.when(raw == "", None).otherwise(xml_unescape(raw))


def _rfc822_ts(raw: Column) -> Column:
    """RSS pubDate: RFC 822 with optional day-of-week, 1-2 digit day,
    numeric or named UTC zone; ISO accepted as a lenient tail rung
    (plenty of real feeds emit it). Spark's post-3.0 parser rejects
    'EEE' as a PARSE pattern (day names format-only), so the day-of-week
    prefix is stripped up front; GMT/UT/UTC named zones normalize to
    +0000 the same way."""
    # comma after the day name is OPTIONAL in the wild ("Mon 02 Jan"),
    # and RFC 822 proper allows two-digit years and minute-precision
    # times — each gets its own rung so published survives instead of
    # silently NULLing the whole feed's freshness signal
    c = F.regexp_replace(F.trim(raw), r"^[A-Za-z]{3},?\s*", "")
    c = F.regexp_replace(c, r"\s+(GMT|UTC?|Z)$", " +0000")

    def _yy(fmt: str) -> Column:
        # RFC 2822 obsolete-date rule (ADVICE r5): two-digit years 50-99
        # are 19xx, 00-49 are 20xx. Java's 'yy' maps everything to
        # 20xx, so '31 Dec 99' parsed as 2099 — post-adjust by -100y.
        t = F.try_to_timestamp(c, F.lit(fmt))
        return F.when(
            F.year(t) >= 2050, t - F.expr("INTERVAL 100 YEARS")
        ).otherwise(t)

    return F.coalesce(
        F.try_to_timestamp(c, F.lit("d MMM yyyy HH:mm:ss Z")),
        F.try_to_timestamp(c, F.lit("d MMM yyyy HH:mm:ss")),
        F.try_to_timestamp(c, F.lit("d MMM yyyy HH:mm Z")),
        F.try_to_timestamp(c, F.lit("d MMM yyyy HH:mm")),
        _yy("d MMM yy HH:mm:ss Z"),
        _yy("d MMM yy HH:mm:ss"),  # zone-less seconds rung (ADVICE r5)
        _yy("d MMM yy HH:mm Z"),
        _yy("d MMM yy HH:mm"),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
    )


def _iso_ts(raw: Column) -> Column:
    """Atom published/updated: RFC 3339 — strip fractional seconds up
    front (any width), then the three-rung ladder sitemaps use."""
    c = F.regexp_replace(F.trim(raw), r"\.\d+", "")
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
    )


def parse_feed(
    df: DataFrame,
    xml_col: str = "xml",
    url_col: str = "feed_url",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(feed_url, xml) -> FEED_ENTRY_SCHEMA rows; RSS ``<item>`` and Atom
    ``<entry>`` families extracted independently (mixed/malformed input
    degrades gracefully, like parse_sitemap).

    RSS url: ``<link>`` text, falling back to a permalink ``<guid>``.
    Atom url: ``<link href>`` with rel="alternate" (either attribute
    order), else the first rel-less ``<link href>``.

    ``keep_cols``: input columns threaded through to every entry row —
    a streaming caller keeps its event-time column so the watermark
    survives the explode (streaming/feed_stream.py)."""
    clash = set(keep_cols) & {
        "feed_url", "kind", "url", "title", "published", "_frag",
    }
    if clash:
        raise ValueError(f"keep_cols collide with entry columns: {clash}")
    frag = F.col("_frag")

    def entries(tag: str, kind: str, url_expr: Column, ts: Column) -> DataFrame:
        frags = F.regexp_extract_all(
            F.col(xml_col), F.lit(rf"(?s)<{tag}[\s>].*?</{tag}>"), F.lit(0)
        )
        return df.select(
            F.col(url_col).alias("feed_url"),
            *keep_cols,
            F.explode(frags).alias("_frag"),
        ).select(
            "feed_url",
            F.lit(kind).alias("kind"),
            url_expr.alias("url"),
            _frag_field(frag, "title").alias("title"),
            ts.alias("published"),
            *keep_cols,
        ).where(F.col("url").isNotNull())

    # RSS 2.0: isPermaLink DEFAULTS to true — a bare <guid>url</guid> is a
    # permalink; only an explicit ="false" opts out
    rss_url = F.coalesce(
        _frag_field(frag, "link"),
        _attr(
            frag,
            r'(?s)<guid(?![^>]*isPermaLink\s*=\s*["\']false["\'])[^>]*>'
            r"\s*(.*?)\s*</guid>",
        ),
    )
    rss = entries("item", "rss", rss_url, _rfc822_ts(_frag_field(frag, "pubDate")))
    atom_url = F.coalesce(
        _attr(
            frag,
            r'(?s)<link[^>]*rel\s*=\s*["\']alternate["\'][^>]*href\s*=\s*["\']([^"\']*)["\']',
        ),
        _attr(
            frag,
            r'(?s)<link[^>]*href\s*=\s*["\']([^"\']*)["\'][^>]*rel\s*=\s*["\']alternate["\']',
        ),
        _attr(frag, r'(?s)<link(?![^>]*\brel\s*=)[^>]*href\s*=\s*["\']([^"\']*)["\']'),
    )
    atom_ts = F.coalesce(
        _iso_ts(_frag_field(frag, "published")),
        _iso_ts(_frag_field(frag, "updated")),
    )
    atom = entries("entry", "atom", atom_url, atom_ts)
    return rss.unionByName(atom)


def discover_feeds(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """RSS/Atom autodiscovery: ``<link type="application/rss+xml|
    atom+xml" href=...>`` in page heads -> (url, feed_url, feed_type).
    Attribute order handled by extracting per-tag fragments first, then
    the href within each. Real autodiscovery hrefs are overwhelmingly
    RELATIVE ("/feed.xml"), so the href resolves against the page url
    (anchors.resolve_href — tiered RFC 3986, JVM for the easy slice) —
    the output is always a fetchable absolute url."""
    from ..operators.anchors import resolve_href

    html = F.col(html_col).cast("string")
    tags = F.regexp_extract_all(
        html,
        F.lit(r'(?is)<link[^>]*type\s*=\s*["\']application/(?:rss|atom)\+xml["\'][^>]*>'),
        F.lit(0),
    )
    tag = F.col("_tag")
    feed_type = F.when(
        F.lower(tag).contains("application/atom+xml"), "atom"
    ).otherwise("rss")
    href = _attr(tag, r'(?is)href\s*=\s*["\']([^"\']*)["\']')
    return (
        df.select(F.col(url_col).alias("url"), F.explode(tags).alias("_tag"))
        .select(
            "url",
            resolve_href(F.col("url"), href).alias("feed_url"),
            feed_type.alias("feed_type"),
        )
        .where(F.col("feed_url").isNotNull())
    )


def feed_seeds(entries: DataFrame, default_priority: float = 0.7) -> DataFrame:
    """Feed entries -> the engine's seeds shape (url, depth, priority,
    published): feed-advertised urls are fresh by construction, so they
    seed above the sitemap default (0.5); ``published`` rides along for
    the recrawl scheduler (operators/changes.revisit_schedule). One
    partial-agg shuffle; duplicate advertisements keep the newest
    timestamp."""
    return (
        entries.select(
            "url",
            F.lit(0).alias("depth"),
            F.lit(default_priority).alias("priority"),
            "published",
        )
        .groupBy("url")
        .agg(
            F.max("depth").alias("depth"),
            F.max("priority").alias("priority"),
            F.max("published").alias("published"),
        )
    )

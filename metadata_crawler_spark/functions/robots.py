"""robots.txt parsing: raw fetched robots bodies -> the rules table the
scheduler joins against.

Reference parity: per-dataset gating config (suffixes/glob_pattern,
/root/reference/src/metadata_crawler/api/config.py:577-585,:479) is
declared in TOML — and its glob gate DOES support wildcards; a web crawler
instead discovers its gating rules by fetching /robots.txt per host. This
module turns a table of (host, robots_txt binary) into
(host, allow array<string>, disallow array<string>, crawl_delay_ms long)
— the shape operators/frontier.apply_robots consumes.

Semantics follow the Robots Exclusion Protocol (RFC 9309):

- a group is one or more CONSECUTIVE ``User-agent`` lines followed by its
  rule lines — a run of UA lines shares one rule block;
- group selection: the most specific user-agent token that matches our
  agent wins (token is a case-insensitive prefix of the agent name);
  ``*`` is the fallback; all groups with the winning token are merged;
- ``Allow`` and ``Disallow`` both supported; matching uses longest-match
  precedence with allow winning ties (enforced in
  operators/frontier.apply_robots, JVM-side);
- patterns may contain ``*`` (any run) and a trailing ``$`` (end anchor);
- empty ``Disallow:`` means allow-all; rules before any UA line are
  ignored; ``Crawl-delay`` is per selected group.

Parsing is a pandas UDF (per-row line split — robots bodies are tiny and
arrive in Arrow batches); pattern MATCHING against the frontier is pure
Spark expressions (frontier.apply_robots), never per-row Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the product token this crawler identifies as (RFC 9309 §2.2.1)
DEFAULT_AGENT = "mcsbot"


def parse_robots_txt(
    body: str, agent: str = DEFAULT_AGENT
) -> tuple[list[str], list[str], int]:
    """(allow patterns, disallow patterns, crawl_delay_ms) for the group
    that best matches ``agent``.

    Group state machine: a UA line NOT preceded by another UA line starts a
    new group; consecutive UA lines extend the current group's token set
    (they share the rule block that follows).
    """
    groups: list[dict] = []
    cur: dict | None = None
    in_ua_run = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_ua_run:
                cur = {"tokens": [], "allow": [], "disallow": [], "delay": None}
                groups.append(cur)
            cur["tokens"].append(val.lower())
            in_ua_run = True
            continue
        if key not in ("disallow", "allow", "crawl-delay"):
            # non-group lines (Sitemap:, unknown extensions) are ignored
            # WITHOUT ending the UA run — RFC 9309 groups them outside
            # the record, so 'UA: a / Sitemap: x / UA: b / Disallow: /p'
            # is ONE shared group; resetting here silently left agent
            # a's group empty (allow-all on a path the site blocks)
            continue
        in_ua_run = False
        if cur is None:
            continue  # rules before any User-agent line are ignored
        if key == "disallow":
            if val:
                cur["disallow"].append(val)
        elif key == "allow":
            if val:
                cur["allow"].append(val)
        elif key == "crawl-delay":
            try:
                cur["delay"] = int(float(val) * 1000)
            except (ValueError, OverflowError):
                # robots bodies are arbitrary web bytes: '1e999' floats
                # to inf and int(inf*1000) raises OverflowError, which
                # must not kill the Arrow batch
                pass

    agent_l = agent.lower()

    def _score(tokens: list[str]) -> int:
        """-1 = no match, 0 = '*', else specificity = token length."""
        best = -1
        for t in tokens:
            if t == "*":
                best = max(best, 0)
            elif t and agent_l.startswith(t):
                best = max(best, len(t))
        return best

    best = max((_score(g["tokens"]) for g in groups), default=-1)
    if best < 0:
        return [], [], 0
    allow: list[str] = []
    disallow: list[str] = []
    delay_ms = 0
    for g in groups:
        if _score(g["tokens"]) == best:
            allow.extend(g["allow"])
            disallow.extend(g["disallow"])
            if g["delay"] is not None:
                delay_ms = g["delay"]
    return allow, disallow, delay_ms


ROBOTS_RULES_SCHEMA = T.StructType(
    [
        T.StructField("allow", T.ArrayType(T.StringType())),
        T.StructField("disallow", T.ArrayType(T.StringType())),
        T.StructField("crawl_delay_ms", T.LongType()),
    ]
)


def _decode_one(b) -> str:
    if isinstance(b, (bytes, bytearray, memoryview)):
        return bytes(b).decode("utf-8", "replace")
    return b or ""


@F.pandas_udf(ROBOTS_RULES_SCHEMA)
def parse_robots_udf(bodies: pd.Series) -> pd.DataFrame:
    # per-ELEMENT decode: a batch can mix bytes and NULLs, so sniffing the
    # first element (the old behavior) left later bytes undecoded
    parsed = [parse_robots_txt(_decode_one(b)) for b in bodies]
    return pd.DataFrame(
        {
            "allow": [p[0] for p in parsed],
            "disallow": [p[1] for p in parsed],
            "crawl_delay_ms": [p[2] for p in parsed],
        }
    )


def robots_table(robots_pages: DataFrame, host_col: str = "host",
                 body_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) -> the scheduler's rules table."""
    parsed = robots_pages.select(
        F.col(host_col).alias("host"), parse_robots_udf(F.col(body_col)).alias("r")
    )
    return parsed.select(
        "host",
        F.col("r.allow").alias("allow"),
        F.col("r.disallow").alias("disallow"),
        F.col("r.crawl_delay_ms").alias("crawl_delay_ms"),
    )


def render_robots_txt(
    disallow: list[str],
    crawl_delay_ms: int,
    allow: list[str] | None = None,
) -> str:
    """Inverse (fixture side): deterministic robots.txt body. Includes a
    decoy group for another agent and a shared-UA-run group so parsers
    exercising group selection see realistic structure."""
    lines = ["# synthetic robots fixture", "User-agent: *"]
    lines += [f"Allow: {a}" for a in (allow or [])]
    lines += [f"Disallow: {d}" for d in disallow]
    if not disallow:
        lines.append("Disallow:")
    if crawl_delay_ms:
        lines.append(f"Crawl-delay: {crawl_delay_ms / 1000:g}")
    lines += ["", "User-agent: SomebodyElseBot", "Disallow: /everything-else"]
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# Page-level robots directives (r5): robots.txt governs FETCHING; the
# page's own <meta name="robots"> / rel="nofollow" markup governs what an
# index may KEEP and which links a crawler may FOLLOW (the de-facto
# standard all major engines honor). Reference analog: per-object opt-out
# attributes the extraction stage must respect, not the transport layer.
# ---------------------------------------------------------------------------

_ROBOTS_META_NC = (
    r"""(?is)<meta\b[^>]*?name\s*=\s*["'](?:robots|googlebot)["']"""
    r"""[^>]*?content\s*=\s*["']([^"']*)["']"""
)
_ROBOTS_META_CN = (
    r"""(?is)<meta\b[^>]*?content\s*=\s*["']([^"']*)["']"""
    r"""[^>]*?name\s*=\s*["'](?:robots|googlebot)["']"""
)


def page_robots_flags(html_col: Column) -> Column:
    """struct(noindex, nofollow, noarchive) from the page's robots meta
    tags — pure JVM regexp exprs (no UDF). BOTH attribute orders are
    matched (content= before name= is common in the wild) and ALL
    robots/googlebot metas are consulted with the most-restrictive
    directive winning on conflict (the documented engine behavior);
    `none` implies noindex+nofollow per the spec. Missing/NULL html ->
    all false (index by default)."""
    doc = F.coalesce(html_col.cast("string"), F.lit(""))
    content = F.lower(
        F.array_join(
            F.concat(
                F.regexp_extract_all(doc, F.lit(_ROBOTS_META_NC), F.lit(1)),
                F.regexp_extract_all(doc, F.lit(_ROBOTS_META_CN), F.lit(1)),
            ),
            ",",
        )
    )
    def has(d: str) -> Column:
        return content.rlike(rf"(^|[\s,]){d}([\s,]|$)")

    none = has("none")
    return F.struct(
        (has("noindex") | none).alias("noindex"),
        (has("nofollow") | none).alias("nofollow"),
        has("noarchive").alias("noarchive"),
    )


def followable_links_udf_factory():
    """Pandas UDF returning only the hrefs of <a> tags WITHOUT
    rel=nofollow/sponsored/ugc — the link set frontier expansion may
    legally follow (extract_outlinks_udf returns ALL hrefs; at 100 TB the
    difference is the link-spam graph)."""
    import re as _re

    import pandas as pd  # noqa: F811

    from metadata_crawler_spark.functions.text import _decode

    a_re = _re.compile(r"<a\b[^>]*>", _re.I | _re.S)
    href_re = _re.compile(r"""href\s*=\s*["']([^"']+)["']""", _re.I)
    rel_re = _re.compile(r"""rel\s*=\s*["']([^"']*)["']""", _re.I)

    @F.pandas_udf("array<string>")
    def followable_links(html: pd.Series) -> pd.Series:
        def one(doc: str) -> list[str]:
            out = []
            for tag in a_re.findall(doc):
                h = href_re.search(tag)
                if not h:
                    continue
                rel = rel_re.search(tag)
                if rel and _re.search(
                    # comma is a legal rel separator ("nofollow,noopener") — the
                    # same boundary class page_robots_flags accepts
                    r"(^|[\s,])(nofollow|sponsored|ugc)([\s,]|$)",
                    rel.group(1), _re.I
                ):
                    continue
                out.append(h.group(1))
            return out

        return _decode(html).map(one)

    return followable_links


def indexable_pages(
    pages: DataFrame, html_col: str = "html", flags_col: str = "robots_flags"
) -> DataFrame:
    """Append the robots-flag struct and drop noindex pages — the filter
    an index sink must apply before q-style facet queries ever see the
    row. Map-side only."""
    out = pages.withColumn(flags_col, page_robots_flags(F.col(html_col)))
    return out.filter(~F.col(f"{flags_col}.noindex"))

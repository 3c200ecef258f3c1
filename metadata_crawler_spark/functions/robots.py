"""robots.txt parsing: raw fetched robots bodies -> the rules table the
scheduler joins against.

Reference parity: per-dataset gating config (suffixes/glob_pattern,
/root/reference/src/metadata_crawler/api/config.py:577-585,:479) is
declared in TOML; a web crawler instead discovers its gating rules by
fetching /robots.txt per host. This module turns a table of
(host, robots_txt binary) into (host, disallow array<string>,
crawl_delay_ms long) — the exact shape operators/frontier.apply_robots
consumes.

Parsing is a vectorized-enough pandas UDF (per-row line split — robots
bodies are tiny and arrive in Arrow batches); semantics follow the
original robots exclusion protocol: the `*` user-agent group's Disallow
prefixes and Crawl-delay, empty Disallow means allow-all, groups for
other agents are ignored.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_robots_txt(body: str) -> tuple[list[str], int]:
    """(disallow prefixes, crawl_delay_ms) for the '*' agent group."""
    disallow: list[str] = []
    delay_ms = 0
    applies = False
    saw_any_agent = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            # a new group header; '*' group applies to us
            if saw_any_agent and applies and disallow:
                # already collected the * group and a new group starts
                pass
            applies = val == "*"
            saw_any_agent = True
        elif key == "disallow" and applies:
            if val:
                disallow.append(val)
        elif key == "crawl-delay" and applies:
            try:
                delay_ms = int(float(val) * 1000)
            except ValueError:
                pass
    return disallow, delay_ms


ROBOTS_RULES_SCHEMA = T.StructType(
    [
        T.StructField("disallow", T.ArrayType(T.StringType())),
        T.StructField("crawl_delay_ms", T.LongType()),
    ]
)


@F.pandas_udf(ROBOTS_RULES_SCHEMA)
def parse_robots_udf(bodies: pd.Series) -> pd.DataFrame:
    if len(bodies) and isinstance(bodies.iloc[0], (bytes, bytearray)):
        bodies = bodies.str.decode("utf-8", errors="replace")
    parsed = [parse_robots_txt(b or "") for b in bodies]
    return pd.DataFrame(
        {
            "disallow": [p[0] for p in parsed],
            "crawl_delay_ms": [p[1] for p in parsed],
        }
    )


def robots_table(robots_pages: DataFrame, host_col: str = "host",
                 body_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) -> the scheduler's rules table."""
    parsed = robots_pages.select(
        F.col(host_col).alias("host"), parse_robots_udf(F.col(body_col)).alias("r")
    )
    return parsed.select(
        "host", F.col("r.disallow").alias("disallow"),
        F.col("r.crawl_delay_ms").alias("crawl_delay_ms"),
    )


def render_robots_txt(disallow: list[str], crawl_delay_ms: int) -> str:
    """Inverse (fixture side): deterministic robots.txt body."""
    lines = ["# synthetic robots fixture", "User-agent: *"]
    lines += [f"Disallow: {d}" for d in disallow]
    if not disallow:
        lines.append("Disallow:")
    if crawl_delay_ms:
        lines.append(f"Crawl-delay: {crawl_delay_ms / 1000:g}")
    lines += ["", "User-agent: SomebodyElseBot", "Disallow: /everything-else"]
    return "\n".join(lines)

"""Deterministic synthetic crawl fixtures (seed=42, no external data).

Mirrors the reference's test strategy — a checked-in fixture tree crawled
end-to-end with golden read-back (/root/reference/tests/conftest.py:118-123,
tests/test_crawl_local.py:16-43, goldens in tests/mock_crawls/) and its
synthetic ~1.5M-file CORDEX benchmark corpus (dev-env/create-cordex.sh:1-70).
Schemas follow FIXTURES.md exactly:

- ``pages(url, warc_ts, html, text, lang)``   — the Common-Crawl-shaped input
  table (BASELINE.json input_hint). ``text`` is the extraction oracle,
  produced by the same pure function the engine's UDF implements.
- ``seeds(url, depth, priority)``             — initial frontier (+ dead seeds).
- ``robots(host, disallow, crawl_delay_ms)``  — per-host politeness rules.
- ``hosts(host, budget)``                     — host universe + per-round budget.

Zipf(s=1.2) host skew with the rank-1 host owning ~15% of pages, so the
hot-host salting / AQE-skew paths are exercised (the reference has NO skew
handling — one hot directory serializes on one worker, SURVEY §4).
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.text import extract_text_py
from ..functions.urls import canon_url_py

SEED = 42
BASE_TS = np.datetime64("2026-01-01T00:00:00")

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu amber birch cedar dune ember flint grove harbor inlet "
    "jetty knoll ledge marsh nook onyx pier quarry ridge shoal thicket umber "
    "vale wharf yonder zephyr basin cliff delta2 eyrie fjord"
).split()

LANGS = ["en", "de", "fr", "es", "unknown"]
TLDS = ["com", "org", "net"]


def _crc(s: str) -> int:
    return zlib.crc32(s.encode("utf-8"))


def _host_probs(n_hosts: int) -> np.ndarray:
    """Rank-1 host owns ~15%; the rest follow Zipf(s=1.2)."""
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    p = 1.0 / ranks**1.2
    p /= p.sum()
    p *= 0.85
    p[0] += 0.15
    return p / p.sum()


def gen_fixtures(n_pages: int, seed: int = SEED) -> dict[str, pd.DataFrame]:
    """Generate all four fixture tables as pandas DataFrames."""
    rng = np.random.default_rng(seed)
    n_hosts = max(4, n_pages // 50)
    hosts = [f"h{i}.example.{TLDS[i % 3]}" for i in range(n_hosts)]
    host_idx = rng.choice(n_hosts, size=n_pages, p=_host_probs(n_hosts))
    scheme_https = rng.random(n_pages) < 0.85
    n_seg = rng.integers(1, 7, size=n_pages)
    seg_words = rng.integers(0, len(WORDS), size=(n_pages, 6))
    has_query = rng.random(n_pages) < 0.08
    q_a = rng.integers(0, 9, size=n_pages)
    q_b = rng.integers(0, 9, size=n_pages)
    messy_kind = np.where(rng.random(n_pages) < 0.04, rng.integers(1, 5, n_pages), 0)
    dup_roll = rng.random(n_pages) < 0.02

    urls: list[str] = []
    canon: list[str] = []
    for i in range(n_pages):
        if dup_roll[i] and i > 16:
            # duplicate of an earlier URL modulo canonicalization
            j = int(rng.integers(0, i))
            base = canon[j]
            variant = int(rng.integers(0, 3))
            if variant == 0:
                scheme, rest = base.split("://", 1)
                hostpart, _, pathpart = rest.partition("/")
                port = ":443" if scheme == "https" else ":80"
                u = f"{scheme}://{hostpart.upper()}{port}/{pathpart}"
            elif variant == 1:
                u = base + "#fragment"
            else:
                scheme, rest = base.split("://", 1)
                hostpart, _, pathpart = rest.partition("/")
                u = f"{scheme}://{hostpart}/./{pathpart}"
            urls.append(u)
            canon.append(base)
            continue
        host = hosts[host_idx[i]]
        scheme = "https" if scheme_https[i] else "http"
        segs = [WORDS[seg_words[i, k]] for k in range(n_seg[i])]
        path = "/" + "/".join(segs)
        query = f"?b={q_b[i]}&a={q_a[i]}" if has_query[i] else ""
        mk = messy_kind[i]
        if mk == 1:
            host_w = host.upper()
        else:
            host_w = host
        if mk == 2:
            host_w = host + (":443" if scheme == "https" else ":80")
        if mk == 3:
            path = "/" + segs[0] + "/../" + "/".join(segs) if segs else path
        if mk == 4 and segs:
            path = path.replace(segs[0], "%" + format(ord(segs[0][0]), "02X") + segs[0][1:], 1)
        u = f"{scheme}://{host_w}{path}{query}"
        urls.append(u)
        canon.append(canon_url_py(u))

    warc_ts = np.array(
        [BASE_TS + np.timedelta64(_crc(u) % 525600, "m") for u in urls],
        dtype="datetime64[us]",
    )
    lang = [LANGS[_crc(h) % 5] for h in (hosts[j] for j in host_idx)]

    # html + oracle text
    n_para = rng.integers(1, 4, size=n_pages)
    para_len = rng.integers(10, 41, size=(n_pages, 3))
    para_word_idx = rng.integers(0, len(WORDS), size=(n_pages, 3, 40))
    n_links = rng.integers(0, 21, size=n_pages)
    link_targets = rng.integers(0, n_pages, size=(n_pages, 20))
    htmls: list[bytes] = []
    texts: list[str] = []
    for i in range(n_pages):
        title = f"{hosts[host_idx[i]]} {WORDS[seg_words[i, 0]]}"
        paras = [
            " ".join(WORDS[para_word_idx[i, p, w]] for w in range(para_len[i, p]))
            for p in range(n_para[i])
        ]
        links = [
            (canon[link_targets[i, k]], f"link {k}") for k in range(n_links[i])
        ]
        body = "".join(f"<p>{p}</p>" for p in paras) + "".join(
            f'<a href="{href}">{anchor}</a>' for href, anchor in links
        )
        html = (
            f"<html><head><title>{title}</title>"
            f'<meta http-equiv="content-language" content="{lang[i]}">'
            f"</head><body>{body}</body></html>"
        )
        htmls.append(html.encode("utf-8"))
        texts.append(extract_text_py(html))

    pages = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": warc_ts,
            "html": htmls,
            "text": texts,
            "lang": lang,
        }
    )

    # seeds: ~1% of canonical urls + a few dead ones; depth 0, priority 1.0
    n_seeds = max(2, n_pages // 100)
    seed_idx = rng.choice(n_pages, size=n_seeds, replace=False)
    seed_urls = sorted({canon[j] for j in seed_idx})
    dead = [f"https://dead{i}.example.com/{WORDS[i % len(WORDS)]}" for i in range(3)]
    seeds = pd.DataFrame(
        {
            "url": seed_urls + dead,
            "depth": np.zeros(len(seed_urls) + 3, dtype=np.int32),
            "priority": np.ones(len(seed_urls) + 3),
        }
    )

    # robots
    deny_all = rng.random(n_hosts) < 0.10
    n_dis = rng.integers(0, 4, size=n_hosts)
    dis_words = rng.integers(0, len(WORDS), size=(n_hosts, 3))
    delays = np.array([0, 100, 500, 1000])[rng.integers(0, 4, size=n_hosts)]
    robots = pd.DataFrame(
        {
            "host": hosts,
            "disallow": [
                ["/"] if deny_all[i] else ["/" + WORDS[dis_words[i, k]] for k in range(n_dis[i])]
                for i in range(n_hosts)
            ],
            "crawl_delay_ms": delays.astype(np.int64),
        }
    )

    budgets = np.array([2, 8, 32])[rng.integers(0, 3, size=n_hosts)]
    hosts_df = pd.DataFrame({"host": hosts, "budget": budgets.astype(np.int32)})

    # raw-url -> canonical-url mapping (canon is a pure function of url, so
    # DISTINCT is safe): lets the DuckDB oracle replicate canonicalization
    # without re-implementing RFC 3986 in SQL (__spark_entry__.q29)
    canon_df = pd.DataFrame({"url": urls, "canon_url": canon}).drop_duplicates(
        subset=["url"], ignore_index=True
    )

    return {
        "pages": pages,
        "seeds": seeds,
        "robots": robots,
        "hosts": hosts_df,
        "canon": canon_df,
    }


_PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def write_fixtures(out_dir: str, n_pages: int, seed: int = SEED) -> dict[str, str]:
    """Write the four fixture tables as parquet; idempotent cache keyed by
    (n_pages, seed). Row groups of 8k rows so Spark parallelizes the scan."""
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, f".fixtures-{n_pages}-{seed}")
    paths = {t: os.path.join(out_dir, f"{t}.parquet") for t in
             ("pages", "seeds", "robots", "hosts", "canon")}
    if os.path.exists(marker) and all(os.path.exists(p) for p in paths.values()):
        return paths
    tables = gen_fixtures(n_pages, seed)
    for name, df in tables.items():
        schema = _PAGES_SCHEMA if name == "pages" else None
        tbl = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
        pq.write_table(tbl, paths[name], row_group_size=8192)
    with open(marker, "w") as fh:
        fh.write("ok")
    return paths


def write_url_corpus(out_dir: str, n_urls: int, seed: int = SEED) -> dict[str, str]:
    """URL-only corpus for the scaling benchmark (north metric is frontier
    URLs scheduled+deduped/sec — no html needed). Fully vectorized so tens
    of millions of rows generate in seconds; cached like write_fixtures.

    Same shape rules as pages.url: Zipf(1.2) hosts with a 15%% hot host,
    ~4%% uppercase-host variants, ~3%% ':443' ports, ~3%% '#frag', ~2%%
    exact duplicates of earlier rows — all collapsed by canonicalization.
    """
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, f".urlcorpus-{n_urls}-{seed}")
    paths = {t: os.path.join(out_dir, f"{t}.parquet") for t in
             ("urls", "robots", "hosts")}
    if os.path.exists(marker) and all(os.path.exists(p) for p in paths.values()):
        return paths
    rng = np.random.default_rng(seed)
    n_hosts = max(64, n_urls // 2000)
    tld = np.array(TLDS)[np.arange(n_hosts) % 3]
    host_arr = pd.Series(
        ["h"] * n_hosts
    ).str.cat(pd.Series(np.arange(n_hosts)).astype(str)).str.cat(
        pd.Series([".example."] * n_hosts)
    ).str.cat(pd.Series(tld))
    host_idx = rng.choice(n_hosts, size=n_urls, p=_host_probs(n_hosts))
    words = np.array(WORDS)
    seg1 = words[rng.integers(0, len(words), n_urls)]
    seg2 = words[rng.integers(0, len(words), n_urls)]
    ids = rng.integers(0, 10 * n_urls, n_urls)

    s = pd.Series(np.where(rng.random(n_urls) < 0.85, "https://", "http://"))
    url = s.str.cat(host_arr.to_numpy()[host_idx]).str.cat(
        ["/"] * n_urls
    ).str.cat(seg1).str.cat(["/"] * n_urls).str.cat(seg2).str.cat(
        ["/"] * n_urls
    ).str.cat(pd.Series(ids).astype(str))

    upper = rng.random(n_urls) < 0.04
    url[upper] = url[upper].str.replace("example", "EXAMPLE", regex=False)
    frag = rng.random(n_urls) < 0.03
    url[frag] = url[frag] + "#frag"
    dup = rng.random(n_urls) < 0.02
    src = rng.integers(0, n_urls, n_urls)
    url[dup] = url.to_numpy()[src[dup]]

    pq.write_table(
        pa.Table.from_arrays([pa.array(url, type=pa.string())], names=["url"]),
        paths["urls"],
        row_group_size=max(65536, n_urls // 64),
    )

    deny_all = rng.random(n_hosts) < 0.10
    n_dis = rng.integers(0, 4, size=n_hosts)
    dis_words = rng.integers(0, len(WORDS), size=(n_hosts, 3))
    delays = np.array([0, 100, 500, 1000])[rng.integers(0, 4, size=n_hosts)]
    robots = pd.DataFrame(
        {
            "host": host_arr,
            "disallow": [
                ["/"] if deny_all[i] else ["/" + WORDS[dis_words[i, k]] for k in range(n_dis[i])]
                for i in range(n_hosts)
            ],
            "crawl_delay_ms": delays.astype(np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(robots, preserve_index=False), paths["robots"])
    budgets = np.array([2, 8, 32])[rng.integers(0, 3, size=n_hosts)]
    hosts_df = pd.DataFrame({"host": host_arr, "budget": budgets.astype(np.int32)})
    pq.write_table(pa.Table.from_pandas(hosts_df, preserve_index=False), paths["hosts"])
    with open(marker, "w") as fh:
        fh.write("ok")
    return paths

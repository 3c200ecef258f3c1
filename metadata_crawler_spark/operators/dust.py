"""DUST rule mining: learn URL rewrite rules from content duplicates.

"Different URLs with Similar Text" (Bar-Yossef, Keidar, Schonfeld,
WWW 2007, "Do Not Crawl in the DUST"): large sites expose the same page
under many URL spellings — ``/article-amp/123`` vs ``/article/123``,
``index.html`` suffixes, ``?print=1`` toggles. A static canonicalizer
(functions/urls, P14) only knows the universal rules; DustBuster MINES
site-specific substring-substitution rules from the crawl's own
duplicate evidence and applies them so the frontier never re-fetches an
alias. Reference analog: the reference collapses duplicates per unique
key at upsert time (src/metadata_crawler/api/stores/base.py); DUST
moves that collapse BEFORE the fetch, where it saves budget.

This implementation mines the paper's core object — contextless
substring substitutions ``alpha -> beta`` — with three deliberate,
deterministic simplifications (each noted against the paper):

1. **Star pairing, not all-pairs.** Within a content-duplicate group
   every URL pairs with the group REPRESENTATIVE (shortest URL,
   ties lexicographic — canonicalization points toward shorter), so
   pair count is linear in group size. The paper pairs a sample; a
   star preserves one rule instance per alias, which is what support
   counting needs. Groups larger than ``max_group`` distinct URLs are
   dropped whole (boilerplate content identifies no specific rule —
   the mirrors.py eligibility cap, same reasoning).
2. **Minimal middle, not the envelope lattice.** A pair (u, rep)
   yields exactly one candidate: strip the longest common prefix, then
   the longest common suffix of the remainder; ``alpha`` = what is
   left of u, ``beta`` = what is left of rep. The paper enumerates all
   consistent envelopes and refines; the minimal middle is the unique
   deterministic member of that lattice, and the precision gate below
   rejects the over-general ones it sometimes produces. The minimal
   ``alpha`` is provably non-empty for distinct pair members (a prefix
   + suffix covering u entirely would force u == rep), so the
   length(alpha) > 0 filter below is purely defensive — an empty
   pattern could not drive a substring replace.
3. **Replace-all application.** Rules apply as ``replace(url, alpha,
   beta)`` over every occurrence (Spark and DuckDB replace() agree on
   this), so validation and application share exact semantics.

The gate that makes mined rules safe is the paper's: a rule survives
only if ``support`` (distinct duplicate pairs that produced it) >=
``min_support`` AND ``precision`` >= ``min_precision``, where precision
is measured by APPLYING the rule to every corpus URL containing
``alpha`` and checking the rewrite lands on an existing URL with the
SAME content hash.

Scale shape (10^10 pages):
- grouping/support: (url, hash) rows only — two keyed shuffles;
- candidate diffing: an Arrow-batched pandas UDF over PAIR rows only
  (duplicate pairs are a sliver of the corpus; the corpus itself never
  enters Python);
- validation: rules are tiny by construction (support-filtered), so
  the application probe is a broadcast nested-loop ``contains`` scan —
  map-side, zero shuffle — followed by ONE equi-join of the rewrites
  against the (url, hash) table. ``validate_fraction`` < 1 probes a
  deterministic hash-sample of the corpus instead (the paper validates
  on a sample too): at web scale precision is a ratio, not a census.
- application: the surviving rule table is collected (bounded: it
  passed min_support over a finite pair set) and compiled into ONE
  chained JVM replace expression — no Python, no join, no shuffle on
  the frontier it canonicalizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


_DIFF_SCHEMA = T.StructType(
    [
        T.StructField("alpha", T.StringType()),
        T.StructField("beta", T.StringType()),
    ]
)


def _diff_batches(batches):
    """mapInPandas body: (url, rep) pair rows -> (alpha, beta) under the
    minimal-middle rule — longest common prefix first, then longest
    common suffix of the remainders. Runs only on duplicate-pair rows;
    the corpus never enters Python."""
    import pandas as pd

    for pdf in batches:
        alphas, betas = [], []
        for a, b in zip(pdf["url"], pdf["rep"]):
            la, lb = len(a), len(b)
            m = min(la, lb)
            p = 0
            while p < m and a[p] == b[p]:
                p += 1
            s = 0
            smax = m - p
            while s < smax and a[la - 1 - s] == b[lb - 1 - s]:
                s += 1
            alphas.append(a[p : la - s])
            betas.append(b[p : lb - s])
        yield pd.DataFrame({"alpha": alphas, "beta": betas})


def mine_dust_rules(
    pages: DataFrame,
    url_col: str = "url",
    hash_col: str | None = None,
    content_col: str = "text",
    min_support: int = 2,
    min_precision: float = 0.8,
    max_group: int = 50,
    max_rule_len: int = 40,
    validate_fraction: float = 1.0,
) -> DataFrame:
    """Mine DUST rules from ``pages``; returns one row per surviving
    rule: (alpha, beta, support, applications, valid, precision).

    ``hash_col`` names a precomputed content-hash column; otherwise
    ``md5(content_col)`` is used. ``precision`` is ROUND(...,6) so the
    value is engine-portable (DuckDB oracle parity). Under
    ``validate_fraction`` < 1 a rule whose ``alpha`` matches no sampled
    URL has no measurable precision and is rejected (absent from the
    output) — the conservative reading of the precision gate.
    """
    if not 0.0 < validate_fraction <= 1.0:
        raise ValueError(f"validate_fraction in (0,1], got {validate_fraction}")
    h = F.col(hash_col) if hash_col else F.md5(F.col(content_col))
    # one (url, hash) row per URL; a URL seen with several bodies keeps
    # its smallest hash (deterministic; recrawl drift is not DUST)
    urls = (
        pages.select(F.col(url_col).alias("url"), h.alias("h"))
        .groupBy("url")
        .agg(F.min("h").alias("h"))
    )

    grp = Window.partitionBy("h")
    ranked = urls.select(
        "url",
        "h",
        F.count(F.lit(1)).over(grp).alias("n_grp"),
        F.min(F.struct(F.length("url").alias("l"), F.col("url").alias("u")))
        .over(grp)["u"]
        .alias("rep"),
    )
    pairs = ranked.filter(
        (F.col("n_grp") >= 2)
        & (F.col("n_grp") <= max_group)
        & (F.col("url") != F.col("rep"))
    ).select("url", "rep")

    cand = pairs.mapInPandas(_diff_batches, _DIFF_SCHEMA)
    rules = (
        cand.filter(
            (F.length("alpha") > 0)
            & (F.length("alpha") <= max_rule_len)
            & (F.length("beta") <= max_rule_len)
        )
        .groupBy("alpha", "beta")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )

    probe = urls
    if validate_fraction < 1.0:
        # deterministic hash-sample: the same URLs are probed on every
        # run/engine (no Bernoulli RNG in the correctness path)
        span = int(validate_fraction * 1_000_000)
        probe = urls.filter(
            F.pmod(F.xxhash64(F.col("url"), F.lit(7)), F.lit(1_000_000)) < span
        )
    apps = (
        probe.join(F.broadcast(rules), F.contains(F.col("url"), F.col("alpha")))
        .select(
            "alpha",
            "beta",
            "support",
            "h",
            F.replace(F.col("url"), F.col("alpha"), F.col("beta")).alias("rew"),
        )
    )
    hits = apps.join(
        urls.select(F.col("url").alias("rew"), F.col("h").alias("h2")),
        "rew",
        "left",
    )
    # support is functionally dependent on (alpha, beta) — riding it
    # through apps and the groupBy key (the oracle's ANY_VALUE shape)
    # avoids re-joining the rules subplan to recover it
    scored = (
        hits.groupBy("alpha", "beta", "support")
        .agg(
            F.count(F.lit(1)).alias("applications"),
            F.sum(
                F.when(F.col("h2").eqNullSafe(F.col("h")), 1).otherwise(0)
            ).alias("valid"),
        )
        .select(
            "alpha",
            "beta",
            "support",
            "applications",
            "valid",
            F.round(F.col("valid") / F.col("applications"), 6).alias("precision"),
        )
    )
    return scored.filter(F.col("precision") >= min_precision)


def dust_rewrite_expr(url: Column, rules: list[tuple[str, str]]) -> Column:
    """Chained JVM replace over an ordered rule list — the zero-shuffle
    application path for a frontier/seen-set canonicalization pass."""
    out = url
    for alpha, beta in rules:
        out = F.replace(out, F.lit(alpha), F.lit(beta))
    return out


def apply_dust_rules(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    out_col: str | None = None,
) -> DataFrame:
    """Canonicalize ``df[url_col]`` under mined ``rules`` (the output of
    :func:`mine_dust_rules`). Rules apply highest-support first (ties:
    alpha, beta — total deterministic order). The rule table collects to
    the driver: it is bounded by construction (support- and
    precision-gated), and compiling it into one chained ``replace``
    expression keeps the application pass JVM-only with zero shuffles —
    the same broadcast-small-side call the canonicalizer tiers make.
    """
    ordered = [
        (r["alpha"], r["beta"])
        for r in rules.select("alpha", "beta", "support")
        .orderBy(F.desc("support"), "alpha", "beta")
        .collect()
    ]
    return df.withColumn(
        out_col or url_col, dust_rewrite_expr(F.col(url_col), ordered)
    )

"""Mirror-host detection: hosts serving the same content.

Large crawls waste budget re-fetching mirrors (country-code CDN twins,
www/non-www splits that survive canonicalization, wholesale site
copies). The classic counter (IRLbot's budget logic, Common Crawl's
dedup statistics) is content-level: two hosts sharing most of their
page CONTENT are mirrors regardless of their URL shapes — exactly the
class of duplicate the URL canonicalizer (functions/urls, P14) cannot
see. Reference analog: the reference's unique-key upsert collapses
duplicate records per key (api/stores/base.py upsert contract); mirror
detection is the cross-host generalization a frontier uses to cut
budgets BEFORE fetching.

Plan shape (three bounded shuffles, no cross join, no driver data):

1. content hash (xxhash64 — JVM, codegen) -> a count-first eligibility
   pass, then ONE hash-keyed groupBy collecting the DISTINCT hosts per
   eligible hash. Hashes served by MORE than ``max_hosts_per_hash``
   hosts are dropped from pair generation entirely (not truncated):
   boilerplate content — empty pages, soft-404 templates — would
   otherwise explode quadratically, and a hash shared that widely
   identifies no specific mirror pair. Counting BEFORE collecting means
   no aggregation buffer ever holds an over-cap host array;
2. host pairs explode MAP-SIDE from each row's tiny host array
   (<= cap^2/2 pairs per hash) -> ONE pair-keyed groupBy counts shared
   hashes;
3. per-host distinct-content sizes (ONE host-keyed groupBy of (host,
   hash) rows — over-cap hashes still count here, in the denominator)
   joined back onto the pair table host-keyed (no forced broadcast: at
   web scale that table is one row per crawled host); containment =
   shared / min(|A|, |B|) — the asymmetric-mirror-friendly score (a
   partial mirror of a big site still scores high).

At 10^10 pages every stage shuffles only (hash, host) or smaller rows;
the quadratic step is bounded by the cap per hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["detect_mirrors"]


def detect_mirrors(
    pages: DataFrame,
    host_col: str = "host",
    content_col: str = "text",
    min_shared: int = 2,
    min_containment: float = 0.5,
    max_hosts_per_hash: int = 8,
) -> DataFrame:
    """(host_a, host_b, shared, n_a, n_b, containment) for host pairs
    sharing >= ``min_shared`` distinct content hashes with containment
    ``shared / min(n_a, n_b)`` >= ``min_containment`` (host_a < host_b
    lexicographically; n_x = the host's distinct content count).

    NULL hosts/content are ignored. Hashes served by more than
    ``max_hosts_per_hash`` hosts (template/boilerplate content) are
    dropped from pair generation but still count toward each host's
    ``n_x`` denominator — they assert nothing about any specific pair.
    """
    hh = (
        pages.select(
            F.col(host_col).alias("host"),
            F.xxhash64(F.col(content_col)).alias("chash"),
        )
        .filter(F.col("host").isNotNull() & F.col(content_col).isNotNull())
        .distinct()
    )
    hh = hh.localCheckpoint()  # two consumers below: one materialization

    sizes = hh.groupBy("host").agg(F.count(F.lit(1)).alias("n"))

    # count-first so collect_set is PROVABLY bounded: a boilerplate hash
    # served by 10^6 hosts must never materialize a 10^6-element array in
    # one aggregation buffer. The count agg is combiner-friendly; only
    # hashes inside [2, cap] survive into the collect (re-reading hh is
    # one cheap pass over the checkpoint).
    eligible = (
        hh.groupBy("chash")
        .agg(F.count(F.lit(1)).alias("nh"))
        .filter(
            (F.col("nh") >= 2) & (F.col("nh") <= max_hosts_per_hash)
        )
        .select("chash")
    )
    hosts_per_hash = (
        hh.join(eligible, "chash", "left_semi")
        .groupBy("chash")
        .agg(F.sort_array(F.collect_set("host")).alias("hosts"))
    )

    # map-side pair expansion over the tiny per-hash array: for i < j
    pairs = hosts_per_hash.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("hosts"),
                    lambda a, i: F.transform(
                        F.slice(
                            F.col("hosts"), i + 2,
                            F.greatest(
                                F.size("hosts") - i - 1, F.lit(0)
                            ),
                        ),
                        lambda b: F.struct(
                            a.alias("host_a"), b.alias("host_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.host_a", "p.host_b")

    shared = pairs.groupBy("host_a", "host_b").agg(
        F.count(F.lit(1)).alias("shared")
    )
    # plain host-keyed joins: the sizes table is one row per host in the
    # crawl (10^7-10^9 at web scale), far past any safe forced broadcast;
    # AQE still picks a broadcast build at small scale on its own.
    sa = sizes.select(F.col("host").alias("host_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("host").alias("host_b"), F.col("n").alias("n_b"))
    out = (
        shared.join(sa, "host_a")
        .join(sb, "host_b")
        .withColumn(
            "containment",
            F.round(F.col("shared") / F.least("n_a", "n_b"), 6),
        )
        .filter(
            (F.col("shared") >= min_shared)
            & (F.col("containment") >= min_containment)
        )
    )
    return out.select("host_a", "host_b", "shared", "n_a", "n_b", "containment")

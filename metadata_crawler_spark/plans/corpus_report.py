"""Dataset card: the one-pass corpus statistics report every released
pretraining dataset ships with (docs/tokens per language and domain,
length percentiles, quality-flag and PII rates).

Reference analog: the reference's status/summary display aggregates
per-run counters (utils/__init__.py:430-470 status table); a corpus
release needs the same numbers per (language x domain) slice, computed
from the data, not from run counters.

Plan shape — this is the design point: the report is ONE scan of the
corpus and ONE grouping-sets shuffle.

- every per-doc metric (token/char counts, heuristic lang-id, Gopher
  quality flags, PII counts) is a zero-shuffle column expression folded
  into the scan projection;
- the (overall), (lang), (lang, domain) slices come from ONE
  ``GROUPING SETS`` aggregation — Spark plans it as a single Expand +
  one partial-agg exchange, so adding slices multiplies rows inside the
  combiner, never rescans the corpus;
- length percentiles ride the same aggregation via ``percentile_approx``
  (t-digest-style sketch, mergeable map-side — exact percentiles would
  force a global sort per group).

At 100 TB that's: read once, shuffle only (group-key, sketch) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.quality import gopher_quality_flags, pii_counts
from ..functions.text import lang_id_expr, ws_token_count

#: percentiles reported for the token-length distribution
REPORT_PERCENTILES = (0.1, 0.5, 0.9, 0.99)


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str | None = None,
    domain_col: str | None = None,
    percentiles: tuple[float, ...] = REPORT_PERCENTILES,
    accuracy: int = 10_000,
) -> DataFrame:
    """The dataset card table. Slices: overall, per-language, and (when
    ``domain_col`` is given) per-(language, domain); the slice a row
    belongs to is readable from its NULL group columns plus
    ``grouping_id``. ``lang_col=None`` derives language with the
    zero-shuffle heuristic ``lang_id_expr``.

    Columns per slice: n_docs, n_tokens, n_chars, token percentiles
    (``p_tokens`` array, one entry per requested percentile),
    mean_tokens, flagged_frac (Gopher suite), pii_email_rate /
    pii_phone_rate (docs-with-PII fractions), empty_frac.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    lang = F.col(lang_col) if lang_col else lang_id_expr(text)
    emails, phones = pii_counts(text)
    g = gopher_quality_flags(text)
    proj = docs.select(
        lang.alias("lang"),
        *([F.col(domain_col).alias("domain")] if domain_col else []),
        ws_token_count(text).alias("n_tokens"),
        F.length(text).alias("n_chars"),
        g["flagged"].cast("int").alias("flagged"),
        (emails > 0).cast("int").alias("has_email"),
        (phones > 0).cast("int").alias("has_phone"),
        (F.trim(text) == "").cast("int").alias("is_empty"),
    )
    pct = F.array(*[F.lit(p) for p in percentiles])
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.percentile_approx("n_tokens", pct, F.lit(accuracy)).alias("p_tokens"),
        F.round(F.avg("n_tokens"), 3).alias("mean_tokens"),
        F.round(F.avg("flagged"), 6).alias("flagged_frac"),
        F.round(F.avg("has_email"), 6).alias("pii_email_rate"),
        F.round(F.avg("has_phone"), 6).alias("pii_phone_rate"),
        F.round(F.avg("is_empty"), 6).alias("empty_frac"),
    ]
    if domain_col:
        grouped = proj.groupingSets(
            [[], [F.col("lang")], [F.col("lang"), F.col("domain")]],
            "lang",
            "domain",
        )
    else:
        grouped = proj.groupingSets([[], [F.col("lang")]], "lang")
    out = grouped.agg(F.grouping_id().alias("grouping_id"), *aggs)
    order = ["grouping_id", "lang"] + (["domain"] if domain_col else [])
    return out.orderBy(*[F.asc_nulls_first(c) for c in order])

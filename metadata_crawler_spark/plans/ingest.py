"""The page-ingest plan: raw fetched (url, html bytes) -> the typed
`documents`-shaped row everything downstream consumes.

This is the glue between the crawl loop (plans/round_loop.py produces
fetched pages) and the corpus pipeline (plans/corpus_pipeline.py expects
clean text): one composed pass per page through the r5 ingest operators —

  charset sniff + decode   functions/charset.decode_pages
  page metadata            functions/metadata.extract_meta_udf (+ OG time)
  robots directives        functions/robots.page_robots_flags (JVM exprs)
  boilerplate removal      functions/boilerplate.extract_main_udf
  heuristic lang + tokens  functions/text (pure exprs)
  compressibility band     functions/quality.compressibility_band

Scale shape: EVERY stage is map-side (Arrow UDFs + JVM exprs over the
scan) — the whole plan has ZERO exchanges (plan-asserted in tests), so
at 100 TB it is one pass over the page store at input-split parallelism;
page bytes never move. Dropping noindex pages and empty extractions
happens inside the same pass.

``ingest_mixed`` adds content dispatch: ``%PDF-`` blobs route through
``operators/pdf_text`` (url riding the mapInPandas, no join-back) into
the same documents schema, so downstream corpus stages are
format-blind. Both branches stay exchange-free (plan-asserted).

Reference parity: this is the reference's open -> extract -> translate
stage chain (storage_backend.py:102-149 dispatch feeding config.py
DataSpecs extraction, then the translate step) re-expressed as one
composed Spark projection over web pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.boilerplate import extract_main_udf
from ..functions.charset import decode_html_udf
from ..functions.metadata import extract_meta_udf
from ..functions.quality import compressibility_band
from ..functions.robots import page_robots_flags
from ..functions.text import bpe_ish_token_count, lang_id_expr, ws_token_count
from ..functions.urls import host_expr


def ingest_pages(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    min_words: int = 1,
    respect_noindex: bool = True,
    boilerplate: bool = True,
    drop_soft404: bool = False,
    fix_mojibake: bool = False,
) -> DataFrame:
    """(url, host, charset, title, canonical, published_ts, noindex,
    nofollow, text, n_blocks, boilerplate_frac, lang, ws_tokens,
    bpe_ish_tokens, compression_ratio, too_repetitive, too_random,
    soft404) — one map-side pass; `boilerplate=False` keeps the flat
    tag-strip text instead of the jusText main content (for corpora
    where chrome is wanted, e.g. link-graph mining). ``drop_soft404``
    filters error pages served as 200 (quality.soft404_flags over the
    in-pass title + extracted text) — the flag column is always
    appended so callers can audit what a drop WOULD remove.
    ``fix_mojibake`` repairs server-side UTF-8-as-cp1252 double encoding
    in the decoded text before any extraction (charset.repair_mojibake's
    kernel) — still map-side, still zero exchanges."""
    d = pages.withColumn("_dec", decode_html_udf(F.col(html_col)))
    if fix_mojibake:
        from ..functions.charset import fix_mojibake_udf

        d = d.withColumn(
            "_dec",
            F.struct(
                F.col("_dec.charset").alias("charset"),
                fix_mojibake_udf(F.col("_dec.text"))["text"].alias("text"),
            ),
        )
    d = d.withColumn("_meta", extract_meta_udf(F.col("_dec.text")))
    d = d.withColumn("_rb", page_robots_flags(F.col("_dec.text")))
    if boilerplate:
        d = d.withColumn("_main", extract_main_udf(F.col("_dec.text")))
        text = F.col("_main.main_text")
        n_blocks = F.col("_main.n_blocks")
        bp_frac = F.col("_main.boilerplate_frac")
    else:
        from ..functions.text import extract_text_udf

        d = d.withColumn("_flat", extract_text_udf(F.col("_dec.text")))
        text = F.col("_flat")
        n_blocks = F.lit(None).cast("int")
        bp_frac = F.lit(None).cast("double")
    d = d.select(
        F.col(url_col).alias("url"),
        host_expr(F.col(url_col)).alias("host"),
        F.col("_dec.charset").alias("charset"),
        F.col("_meta.title").alias("title"),
        F.col("_meta.canonical").alias("canonical"),
        F.try_to_timestamp(
            F.element_at(F.col("_meta.tags"), "article:published_time")
        ).alias("published_ts"),
        F.col("_rb.noindex").alias("noindex"),
        F.col("_rb.nofollow").alias("nofollow"),
        text.alias("text"),
        n_blocks.alias("n_blocks"),
        bp_frac.alias("boilerplate_frac"),
    )
    d = _text_metrics(d)
    from ..functions.quality import soft404_flags

    d = d.withColumn(
        "soft404", soft404_flags(F.col("text"), F.col("title"))["soft404"]
    )
    if drop_soft404:
        d = d.filter(~F.col("soft404"))
    if respect_noindex:
        d = d.filter(~F.col("noindex"))
    return d.filter(F.col("ws_tokens") >= F.lit(int(min_words)))


def _text_metrics(d: DataFrame) -> DataFrame:
    """Shared tail of every ingest branch: lang id, token counts and the
    compressibility band over the extracted ``text`` — pure map-side
    expressions appended to the caller's pass."""
    d = d.withColumn("lang", lang_id_expr(F.col("text"))).withColumn(
        "ws_tokens", ws_token_count(F.col("text")).cast("long")
    ).withColumn(
        "bpe_ish_tokens", bpe_ish_token_count(F.col("text")).cast("long")
    ).withColumn("_cb", compressibility_band(F.col("text")))
    return d.select(
        "*",
        F.col("_cb.compression_ratio").alias("compression_ratio"),
        F.col("_cb.too_repetitive").alias("too_repetitive"),
        F.col("_cb.too_random").alias("too_random"),
    ).drop("_cb")


def ingest_mixed(
    pages: DataFrame,
    url_col: str = "url",
    blob_col: str = "html",
    min_words: int = 1,
    respect_noindex: bool = True,
    boilerplate: bool = True,
    fix_mojibake: bool = False,
) -> DataFrame:
    """Content-dispatched ingest: HTML blobs take :func:`ingest_pages`,
    ``%PDF-`` blobs take ``operators/pdf_text`` — both land in the SAME
    documents schema (PDF rows carry charset='pdf', no HTML metadata,
    page count in ``n_blocks``), so the corpus pipeline downstream is
    format-blind.

    Scale shape: the two branches are disjoint filters over one store —
    each stays a zero-exchange map-side pass; the union is plan-level
    only (no shuffle). When the store partitions by content_type (real
    crawl stores do), each branch prunes to its own partitions instead
    of double-scanning; on an unpartitioned store prefer materializing
    the split once upstream.
    """
    from collections.abc import Iterator

    import pandas as pd

    from ..operators.pdf_text import iter_extracted

    is_pdf = F.substring(F.col(blob_col), 1, 5) == F.lit(b"%PDF-")
    html_out = ingest_pages(
        pages.filter(~F.coalesce(is_pdf, F.lit(False))),
        url_col=url_col,
        html_col=blob_col,
        min_words=min_words,
        respect_noindex=respect_noindex,
        boilerplate=boilerplate,
        fix_mojibake=fix_mojibake,
    ).withColumn("content_kind", F.lit("html"))

    # PDF branch: url rides THROUGH the mapInPandas (no id mint, no
    # join-back shuffle — the branch stays one map-side pass like HTML)
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [
                (u, d["n_pages"], d["text"])
                for u, d in iter_extracted(b["url"], b["_blob"])
                if d["ok"]
            ]
            yield pd.DataFrame(rows, columns=["url", "n_pages", "text"])

    ext = pages.filter(is_pdf).select(
        F.col(url_col).alias("url"), F.col(blob_col).alias("_blob")
    ).mapInPandas(run, "url string, n_pages int, text string")
    pdf_rows = ext.select(
        "url",
        host_expr(F.col("url")).alias("host"),
        F.lit("pdf").alias("charset"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("canonical"),
        F.lit(None).cast("timestamp").alias("published_ts"),
        F.lit(False).alias("noindex"),
        F.lit(False).alias("nofollow"),
        F.col("text"),
        F.col("n_pages").alias("n_blocks"),
        F.lit(None).cast("double").alias("boilerplate_frac"),
    )
    from ..functions.quality import soft404_flags

    pdf_out = (
        _text_metrics(pdf_rows)
        # a PDF can still be an error page's body; title is NULL here so
        # only the body/tiny signals apply
        .withColumn(
            "soft404", soft404_flags(F.col("text"), F.col("title"))["soft404"]
        )
        .filter(F.col("ws_tokens") >= F.lit(int(min_words)))
        .withColumn("content_kind", F.lit("pdf"))
    )
    return html_out.unionByName(pdf_out)

"""Attribute sidecars + mixer: annotate once, re-filter forever.

The architecture every current pretraining-data toolkit converged on
(Dolma's taggers/mixer, NeMo-Curator's score-then-filter): quality
signals are computed ONCE and persisted as narrow id-keyed *attribute*
tables beside the immutable corpus; every curation experiment is then a
cheap *mix* — a boolean expression over attribute columns that selects
the surviving ids — instead of a fresh pass over 100 TB of text. The
corpus is write-once; only ~tens-of-bytes-per-doc sidecars churn.

Reference parity: the reference separates harvested metadata from the
stored catalogue and re-queries by facet without re-crawling
(api/run.py index/delete paths, solr facet queries); this module is the
same contract for corpus curation — annotations live beside the data,
selection is a query, the payload never rewrites.

Scale shape:
- ``tag_corpus`` runs every *scalar* tagger (pure column expressions —
  the common case) in ONE zero-Exchange map-side pass over the corpus;
  DataFrame-level taggers that genuinely aggregate (gopher_repetition's
  top-bigram pass) contribute their documented shuffles of (id, metric)
  rows only — the text column never rides any exchange this module adds.
- attribute tables are (id, struct) rows, ~100 B/doc: 100 TB of text
  yields ~10 GB sidecars per tagger set — broadcast-to-small-cluster
  territory, trivially re-joinable.
- ``mix_corpus`` evaluates the keep-expression on the attribute table
  alone, reduces to a keep-id set, and LEFT SEMI joins the corpus —
  the corpus side sees exactly one join (AQE broadcasts the id set when
  it is small; otherwise a hash semi join on the already-narrow key).
  Re-running an experiment with a different threshold touches only the
  sidecar, never re-reads text bytes except through that one semi join.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.quality import (
    c4_quality_flags,
    compressibility_band,
    gopher_quality_flags,
    gopher_repetition,
    line_quality_metrics,
    pii_counts,
)
from ..functions.text import (
    bpe_ish_token_count,
    lang_id_expr,
    quality_score_expr,
    ws_token_count,
)
from ..functions.urls import url_quality_flags


def _pii_struct(text: Column) -> Column:
    n_emails, n_phones = pii_counts(text)
    return F.struct(n_emails.alias("n_emails"), n_phones.alias("n_phones"))


def _tokens_struct(text: Column) -> Column:
    return F.struct(
        ws_token_count(text).alias("ws_tokens"),
        bpe_ish_token_count(text).alias("bpe_tokens"),
    )


def _lang_struct(text: Column) -> Column:
    return F.struct(
        lang_id_expr(text).alias("lang"),
        quality_score_expr(text).alias("quality_score"),
    )


#: scalar taggers: (text_expr, url_expr|None) -> one struct/scalar Column.
#: All pure column expressions — tag_corpus folds every requested one
#: into a single map-side select (zero Exchange, plan-asserted in tests).
SCALAR_TAGGERS: dict[str, Callable[[Column, Column | None], Column]] = {
    "gopher_quality": lambda text, url: gopher_quality_flags(text),
    "c4": lambda text, url: c4_quality_flags(text),
    "pii": lambda text, url: _pii_struct(text),
    "compressibility": lambda text, url: compressibility_band(text),
    "tokens": lambda text, url: _tokens_struct(text),
    "lang": lambda text, url: _lang_struct(text),
    "url_quality": lambda text, url: url_quality_flags(url),
}

#: DataFrame-level taggers: (df, text_col, id_col) -> (id, <metrics...>)
#: rows struct-packed by tag_corpus. These own their (documented)
#: shuffles; only (id, metric) rows move.
DF_TAGGERS: dict[str, Callable[[DataFrame, str, str], DataFrame]] = {
    "gopher_repetition": lambda df, text_col, id_col: gopher_repetition(
        df, text_col, id_col
    ),
    "line_quality": lambda df, text_col, id_col: line_quality_metrics(
        df, text_col, id_col
    ),
}

DEFAULT_TAGGERS = (
    "gopher_quality",
    "c4",
    "pii",
    "tokens",
    "lang",
)


def _pack(df: DataFrame, name: str) -> DataFrame:
    """(id, a, b, ...) -> (id, struct(a, b, ...) AS <name>)."""
    rest = [c for c in df.columns if c != "id"]
    return df.select("id", F.struct(*rest).alias(name))


def tag_corpus(
    df: DataFrame,
    taggers: Iterable[str] = DEFAULT_TAGGERS,
    text_col: str = "text",
    id_col: str = "id",
    url_col: str | None = None,
) -> DataFrame:
    """Run the named taggers and return the attribute table
    ``(id, <tagger1 struct>, <tagger2 struct>, ...)`` — one row per doc.

    Scalar taggers (most of them) evaluate in one map-side pass.
    DataFrame-level taggers (``gopher_repetition``, ``line_quality``)
    join their (id, struct) results back id-keyed; the join sides are
    attribute-narrow, never text.
    """
    names = list(taggers)
    unknown = [
        n for n in names if n not in SCALAR_TAGGERS and n not in DF_TAGGERS
    ]
    if unknown:
        raise ValueError(
            f"unknown taggers {unknown}; available: "
            f"{sorted(SCALAR_TAGGERS) + sorted(DF_TAGGERS)}"
        )
    needs_url = "url_quality" in names
    if needs_url and url_col is None:
        raise ValueError("tagger 'url_quality' requires url_col=")

    text = F.col(text_col)
    url = F.col(url_col) if url_col is not None else None
    scalar_cols = [
        SCALAR_TAGGERS[n](text, url).alias(n)
        for n in names
        if n in SCALAR_TAGGERS
    ]
    attrs = df.select(F.col(id_col).alias("id"), *scalar_cols)

    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    for n in names:
        if n in DF_TAGGERS:
            part = _pack(DF_TAGGERS[n](base, "text", "id"), n)
            attrs = attrs.join(part, "id", "left")
    return attrs


def write_attributes(
    attrs: DataFrame, out_dir: str, experiment: str
) -> str:
    """Persist one tagger run as the sidecar
    ``<out_dir>/attributes/<experiment>/`` (parquet). Returns the path.

    Sidecars are tiny relative to the corpus (~100 B/doc); a production
    layout would additionally bucket them by id so repeated
    attribute-joins co-locate shuffle-free (``sources/tables.py`` has
    the bucketed writer) — plain parquet keeps the test surface simple.
    """
    path = os.path.join(out_dir, "attributes", experiment)
    attrs.write.mode("overwrite").parquet(path)
    return path


def read_attributes(
    spark: SparkSession, out_dir: str, experiments: Iterable[str]
) -> DataFrame:
    """Load + id-join the named sidecars into one attribute table.

    Each experiment contributes its struct columns; ids missing from a
    sidecar get NULL structs (left join from the first), so mixing
    expressions must NULL-guard when sidecars cover different snapshots.

    Two experiments that ran the SAME tagger (a re-run with new
    thresholds beside the original) would produce duplicate column names
    whose ambiguity only explodes later, inside ``mix_corpus``'s keep
    expression — rejected here with the collision list; rename at write
    time (distinct experiment = distinct tagger set) or select/alias
    before joining.
    """
    names = list(experiments)
    if not names:
        raise ValueError("need at least one experiment name")
    out = None
    seen: dict[str, str] = {}
    for name in names:
        part = spark.read.parquet(os.path.join(out_dir, "attributes", name))
        clash = [
            f"{c!r} (in {seen[c]!r} and {name!r})"
            for c in part.columns
            if c != "id" and c in seen
        ]
        if clash:
            raise ValueError(
                "duplicate tagger columns across experiments: "
                + ", ".join(clash)
            )
        for c in part.columns:
            if c != "id":
                seen[c] = name
        out = part if out is None else out.join(part, "id", "left")
    return out


def mix_corpus(
    corpus: DataFrame,
    attrs: DataFrame,
    keep: str,
    id_col: str = "id",
) -> DataFrame:
    """Select the corpus rows whose attributes satisfy ``keep`` (a SQL
    boolean expression over the attribute table's columns, e.g.
    ``"NOT gopher_quality.flagged AND tokens.ws_tokens >= 50"``).

    The expression is evaluated on the narrow attribute table only; the
    corpus pays exactly one LEFT SEMI join against the resulting keep-id
    set. NULL keep-verdicts (docs a sidecar never covered) do NOT
    survive — absence of evidence is a drop, matching every curation
    toolkit's default.
    """
    keep_ids = attrs.where(F.expr(keep)).select(
        F.col("id").alias("__keep_id")
    )
    return corpus.join(
        keep_ids,
        corpus[id_col] == keep_ids["__keep_id"],
        "left_semi",
    )


def mix_report(attrs: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Per-rule attrition preview over the attribute table: for each
    named boolean keep-expression, how many docs survive it alone.
    ONE aggregate pass (each rule is a conditional count — no per-rule
    scans), so threshold sweeps are interactive even on 10^9-doc
    sidecars."""
    if not rules:
        raise ValueError("need at least one rule")
    aggs = [
        F.sum(
            F.when(F.coalesce(F.expr(expr), F.lit(False)), 1).otherwise(0)
        ).alias(name)
        for name, expr in rules.items()
    ]
    wide = attrs.agg(F.count(F.lit(1)).alias("total"), *aggs)
    names = list(rules)
    pairs = F.array(
        *[
            F.struct(
                F.lit(n).alias("rule"),
                F.col(n).cast("long").alias("kept"),
                F.col("total").alias("total"),
            )
            for n in names
        ]
    )
    return wide.select(F.explode(pairs).alias("r")).select(
        "r.rule", "r.kept", "r.total"
    )

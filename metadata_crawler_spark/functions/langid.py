"""Cavnar-Trenkle n-gram language identification (the public "textcat"
algorithm, Cavnar & Trenkle 1994) as a fully declarative Spark plan.

`functions/text.lang_id_expr` is the cheap stopword-marker heuristic; this
module is the trained upgrade a multilingual 100 TB corpus needs: build
per-language character-n-gram rank profiles from a labeled sample, then
classify every document by the out-of-place distance between its own
n-gram ranking and each profile.

Everything is column expressions + two keyed aggregations — no UDFs:

- **n-grams**: text is normalized (lowercase, non-letter runs -> ``_``,
  padded) and char 1..3-grams are generated map-side with
  ``transform(sequence(...), i -> substr(i, n))`` + explode.
- **profiles** (`train_lang_profiles`): one (lang, gram) partial-agg
  count shuffle over the labeled SAMPLE (small by construction), rank per
  lang, keep top-N. The profile table is |langs| x N rows — broadcast
  material forever after.
- **classify** (`classify_lang`): one (id, gram) count shuffle + one
  exchange by id for the per-doc rank window; the per-(doc, lang)
  distance and the final argmin reuse the id partitioning (Catalyst
  recognizes hash(id) satisfies grouping on (id, lang)), so scoring adds
  ZERO further exchanges; profiles and the language list join broadcast.
  Out-of-place distance: sum over the doc's top-N grams of
  |doc_rank - profile_rank|, with a miss penalized at N.

Reference parity: the reference extracts a language facet per object via
its DataSpecs attribute rules (api/config.py:367-458); this is the
trained analog for web text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_expr(text: Column) -> Column:
    """Lowercased letters with every non-letter run collapsed to ``_``,
    padded — the word-boundary marker Cavnar-Trenkle profiles use."""
    t = F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))), r"[^a-z]+", "_")
    return F.regexp_replace(F.concat(F.lit("_"), t, F.lit("_")), r"_+", "_")


def char_ngrams_expr(text: Column, n_lo: int = 1, n_hi: int = 3) -> Column:
    """All character n-grams (n_lo..n_hi) of the normalized text, one
    flat array built map-side (flatten of per-n transform/sequence)."""
    norm = normalize_expr(text)

    def grams_of(n: int) -> Column:
        # guard: sequence(1, 0) DESCENDS in Spark, so short strings must
        # yield an explicit empty array, not a phantom [1, 0] walk
        return F.when(
            F.length(norm) >= n,
            F.transform(
                F.sequence(F.lit(1), F.length(norm) - F.lit(n - 1)),
                lambda i: norm.substr(i, F.lit(n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.flatten(F.array(*[grams_of(n) for n in range(n_lo, n_hi + 1)]))


def exploded_grams(
    df: DataFrame,
    keys: list[str],
    text_col: str,
    n_lo: int = 1,
    n_hi: int = 3,
) -> DataFrame:
    """(keys..., gram) rows — the char-n-gram explode both the trainer
    and the classifier run on.

    NOT written as ``explode(char_ngrams_expr(...))``: Catalyst performs
    no common-subexpression elimination inside higher-order-function
    lambdas, so the normalize regexes would re-evaluate once PER GRAM
    (measured 60x slowdown). Instead the normalized string crosses a
    Generate barrier as a materialized column (explode of the position
    sequence), and each output row does only constant-time substrs."""
    base = df.select(*keys, normalize_expr(F.col(text_col)).alias("_norm"))
    idx = base.select(
        *keys,
        "_norm",
        F.explode(F.sequence(F.lit(1), F.length("_norm"))).alias("_i"),
    )
    gram_cols = [
        F.when(
            F.col("_i") + F.lit(n - 1) <= F.length("_norm"),
            F.col("_norm").substr(F.col("_i"), F.lit(n)),
        )
        for n in range(n_lo, n_hi + 1)
    ]
    return (
        idx.select(*keys, F.explode(F.array(*gram_cols)).alias("gram"))
        .filter(F.col("gram").isNotNull())
    )


def train_lang_profiles(
    labeled: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    top_n: int = 300,
) -> DataFrame:
    """(lang, gram, rank) profile table from a labeled sample: per-lang
    gram counts (one partial-agg shuffle), rank by (count DESC, gram ASC)
    for determinism, keep the top ``top_n``."""
    grams = exploded_grams(
        labeled.select(F.col(lang_col).alias("lang"), text_col), ["lang"], text_col
    )
    counts = grams.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("gram").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("lang", "gram", "rank")
    )


def classify_lang(
    df: DataFrame,
    profiles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 300,
) -> DataFrame:
    """(id, lang, dist) — the argmin-out-of-place language per document.

    Docs whose normalized text has no grams beyond the padding still get
    a row (the padding ``_`` n-grams are real grams), so every input id
    appears in the output. Ties break on lang ascending."""
    grams = exploded_grams(
        df.select(F.col(id_col).alias("id"), text_col), ["id"], text_col
    )
    counts = grams.groupBy("id", "gram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("id").orderBy(F.col("n").desc(), F.col("gram").asc())
    doc_ranks = (
        counts.withColumn("doc_rank", F.row_number().over(w))
        .filter(F.col("doc_rank") <= top_n)
        .select("id", "gram", "doc_rank")
    )
    langs = profiles.select("lang").distinct()
    scored = (
        doc_ranks.crossJoin(F.broadcast(langs))
        .join(F.broadcast(profiles), ["lang", "gram"], "left")
        .groupBy("id", "lang")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("doc_rank") - F.col("rank")), F.lit(top_n)
                )
            ).alias("dist")
        )
    )
    best = scored.groupBy("id").agg(
        F.min(F.struct("dist", "lang")).alias("m")
    )
    return best.select(
        F.col("id").alias(id_col),
        F.col("m.lang").alias("lang"),
        F.col("m.dist").alias("dist"),
    )

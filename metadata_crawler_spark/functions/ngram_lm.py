"""Trigram Stupid-Backoff cross-entropy — the third rung of the CCNet
LM-quality ladder (unigram → bigram → trigram).

Brants et al. 2007 ("Large Language Models in Machine Translation")
introduced Stupid Backoff precisely FOR distributed web-scale n-gram
models: scores are relative frequencies with a constant backoff
multiplier, so the model is nothing but count tables — exactly the
shape a groupBy produces — with no normalization pass over the
vocabulary. CCNet (Wenzek et al. 2020) gates on a 5-gram KenLM; a
trigram SB model is the same signal family built from the corpus itself
(or a held-out ``train_df``), and separates texts a bigram model
cannot: "the cat sat on the mat" vs a shuffle that preserves every
bigram's local pairs but breaks the three-word collocations.

Per position i >= 3 over the token sequence w_1..w_n:

    S(w_i | w_{i-2} w_{i-1}) =
        tcnt(w_{i-2..i}) / bcnt(w_{i-2} w_{i-1})   if the trigram was seen
        alpha * S(w_i | w_{i-1})                    otherwise
    S(w_i | w_{i-1}) =
        bcnt(w_{i-1} w_i) / ucnt(w_{i-1})           if the bigram was seen
        alpha * (ucnt(w_i) + 1) / (total + V)       otherwise

(the unigram floor is Laplace-smoothed, matching
``quality.bigram_crossentropy``, so unseen words score finitely under a
held-out model). xent3 = mean over trigram positions of -log2 S.

Plan shape (the 100 TB path, same contracts as the bigram rung):
trigrams come straight off the token ARRAY (one transform + one
explode — never a positional self-join); the three count tables build
with map-side combine; scoring joins broadcast when the bounded probe
says the model fits, else shuffle joins that AQE skew-splits on
stop-word heads; the scalar (total, V) rides a 1-row broadcast
crossJoin, never a collect.

Reference analog: the reference's quality gating is schema-rule based
(api/mixin/lookup_mixin.py); the LM ladder is the web-corpus analog the
training-data pipeline needs (SURVEY §2 LLM-ops table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .quality import _nonempty_tokens, ngram_word_structs

__all__ = ["trigram_crossentropy", "trigram_structs"]


def trigram_structs(arr: Column) -> Column:
    """(w1, w2, w3) structs for positions 3..size of a token array; the
    shared ``quality.ngram_word_structs`` builder carries the short-doc
    empty-array guard for every rung of the ladder."""
    return ngram_word_structs(arr, 3)


def trigram_crossentropy(
    df: DataFrame,
    text_col: str,
    id_col: str,
    train_df: DataFrame | None = None,
    alpha: float = 0.4,
    vocab_broadcast: bool | None = None,
    tables: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """(id, n_trigrams, xent3) per document; docs with < 3 tokens get
    n_trigrams=0 and a NULL xent3 (the operator is total over its
    input). ``train_df`` scores ``df`` under a held-out model (the CCNet
    shape); default is the corpus's own counts. ``tables`` accepts the
    (utab, btab, scal) from ``quality.sb_count_tables`` so a caller
    running multiple ladder rungs (q55) builds the lower-order count
    tables ONCE instead of once per rung."""
    from ..operators.frontier import small_enough_to_broadcast

    from .quality import sb_count_tables

    tdf = train_df if train_df is not None else df
    ttoks = _nonempty_tokens(F.col(text_col))

    utab, btab, scal = (
        tables if tables is not None else sb_count_tables(tdf, text_col)
    )
    ttab = (
        tdf.select(F.explode(trigram_structs(ttoks)).alias("tg"))
        .groupBy(
            F.col("tg.w1").alias("w1"),
            F.col("tg.w2").alias("w2"),
            F.col("tg.w3").alias("w3"),
        )
        .agg(F.count("*").alias("tcnt"))
    )
    if vocab_broadcast is None:
        # probe the TRIGRAM table — the largest of the three tables the
        # hint broadcasts (trigram vocab is typically 2-4x bigram vocab
        # on web text; gating on btab could pass the probe and then OOM
        # the driver collecting ttab)
        vocab_broadcast = small_enough_to_broadcast(ttab)
    u = F.broadcast(utab) if vocab_broadcast else utab
    b = F.broadcast(btab) if vocab_broadcast else btab
    t = F.broadcast(ttab) if vocab_broadcast else ttab

    doc_tg = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            trigram_structs(_nonempty_tokens(F.col(text_col)))
        ).alias("tg"),
    ).select(
        "id",
        F.col("tg.w1").alias("w1"),
        F.col("tg.w2").alias("w2"),
        F.col("tg.w3").alias("w3"),
    )
    scored = (
        doc_tg.join(t, ["w1", "w2", "w3"], "left")
        # trigram denominator: count of the (w1, w2) CONTEXT bigram
        .join(
            b.select(
                F.col("w1"), F.col("w2"), F.col("bcnt").alias("ctx12")
            ),
            ["w1", "w2"],
            "left",
        )
        # bigram-rung numerator: count of (w2, w3)
        .join(
            b.select(
                F.col("w1").alias("w2"),
                F.col("w2").alias("w3"),
                F.col("bcnt").alias("b23"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            u.select(F.col("tok").alias("w2"), F.col("ucnt").alias("c2")),
            "w2",
            "left",
        )
        .join(
            u.select(F.col("tok").alias("w3"), F.col("ucnt").alias("c3")),
            "w3",
            "left",
        )
        .crossJoin(F.broadcast(scal))
    )
    s2 = F.when(
        F.col("b23").isNotNull() & (F.coalesce(F.col("c2"), F.lit(0)) > 0),
        F.col("b23") / F.col("c2"),
    ).otherwise(
        F.lit(alpha)
        * (F.coalesce(F.col("c3"), F.lit(0)) + 1)
        / (F.col("total") + F.col("vsize"))
    )
    s3 = F.when(
        F.col("tcnt").isNotNull()
        & (F.coalesce(F.col("ctx12"), F.lit(0)) > 0),
        F.col("tcnt") / F.col("ctx12"),
    ).otherwise(F.lit(alpha) * s2)
    per_doc = scored.groupBy("id").agg(
        F.count("*").alias("n_trigrams"),
        F.round(F.avg(-F.log2(s3)), 6).alias("xent3"),
    )
    all_ids = df.select(F.col(id_col).alias("id")).distinct()
    return all_ids.join(per_doc, "id", "left").select(
        "id",
        F.coalesce(F.col("n_trigrams"), F.lit(0)).alias("n_trigrams"),
        F.col("xent3"),
    )

"""Corpus quality filters a training-data pipeline runs before training.

Complements functions/text.py's per-document scores with the
remaining standard families:

- :func:`gopher_repetition` — Gopher-style (Rae et al. 2021, §A1.1)
  within-document repetition metrics: mean word length, distinct-word
  fraction, and the fraction of characters covered by the most frequent
  word 2-gram; documents breaching the thresholds are flagged, not
  dropped (the caller decides).
- :func:`gopher_quality_flags` — the remaining Gopher §A1.1 quality
  rules (word-count bounds, mean-word-length band, symbol ratio, alpha
  fraction, stop-word presence) as one zero-shuffle struct expression.
- :func:`redact_pii` / :func:`pii_counts` — regex redaction of emails
  and NANP-style phone numbers (the C4/RefinedWeb scrub step), as pure
  ``regexp_replace``/``regexp_count`` column expressions.
- :func:`unigram_crossentropy` — the CCNet perplexity-bucket analog:
  per-document mean -log2 p(token) under the corpus's own unigram
  distribution.
- :func:`perplexity_buckets` — the CCNet head/middle/tail split itself
  (Wenzek et al. 2020 §4.3): per-language score tertiles via
  percentile_approx + broadcast thresholds (production) or ntile(3)
  (exact, engine-parity).

Everything is JVM-side; the only shuffle in the module is
``gopher_repetition``'s bigram count, keyed (id, bigram) with a map-side
combine, then (id) — both keys are high-cardinality and skew-free by
construction (a single document contributes at most its own length).

Reference parity: the reference has no corpus-quality stage (its objects
are NetCDF files); these are the web-corpus analogs of its per-object
DataSpecs stats rules (/root/reference/src/metadata_crawler/api/
config.py:405-458) — derived per-object columns a sink filters on.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# email + NANP phone + IPv4, deliberately simple and RE2-compatible so
# the same pattern strings run unchanged in Spark and the DuckDB oracle
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"
# dotted quad with REAL octet ranges (0-255); \b word boundaries bound
# the ends — a dotted tail like '1.2.3.4.5' still matches its first four
# parts (no lookahead in the shared RE2/Java subset), same behavior as
# common scrubbers
IP_RE = (
    r"\b(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
    r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\b"
)


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) match counts, pre-redaction."""
    return (
        F.regexp_count(text, F.lit(EMAIL_RE)),
        F.regexp_count(text, F.lit(PHONE_RE)),
    )


def ip_count(text: Column) -> Column:
    """IPv4 match count (the Dolma/RefinedWeb scrub's third PII class)."""
    return F.regexp_count(text, F.lit(IP_RE))


def redact_pii(text: Column, ips: bool = False) -> Column:
    """Replace every email with <EMAIL> and phone with <PHONE>;
    ``ips=True`` additionally masks IPv4 addresses as <IP> (opt-in so
    existing redaction contracts — q56's end-to-end oracle, the
    attribute sidecars — keep their byte-exact outputs)."""
    out = F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    if ips:
        out = F.regexp_replace(out, IP_RE, "<IP>")
    return out


def gopher_repetition(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_distinct_frac: float = 0.3,
    max_top2gram_frac: float = 0.20,
    chunk_words: int = 10,
) -> DataFrame:
    """Per-document repetition metrics + flag.

    Returns (id, n_words, mean_word_len, distinct_frac, dup_chunk_frac,
    top2gram_char_frac, flagged) where top2gram_char_frac is the Gopher
    "fraction of characters contained in the most frequent word 2-gram":
    occurrences-of-the-most-frequent-bigram x its non-space char length
    over the document's total non-space chars, counted only when that
    bigram occurs MORE THAN ONCE (one occurrence is not repetition;
    overlapping repeats can still push the fraction past 1.0 — still a
    repetition signal), and dup_chunk_frac is the
    Gopher duplicate-line fraction over ``chunk_words``-token pseudo-
    paragraphs (fraction of within-document chunks that repeat an
    earlier chunk). dup_chunk_frac is reported, not folded into the
    flag — Gopher's dup-line threshold (0.30) is a caller-side filter.

    Plan: scalar metrics are pure array expressions on the unexploded
    row; only the bigram mode needs an explode -> count -> per-doc max
    (two keyed shuffles, partial aggregation on both). A zero-shuffle
    variant exists (array_max over transform(array_distinct(bg), d ->
    size(filter(bg, = d)))) but is O(n^2) per document — wrong at
    web-document lengths, so not used.
    """
    from ..operators.dedup import paragraph_chunks_expr

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(
        F.col(id_col).alias("id"),
        toks.alias("toks"),
        paragraph_chunks_expr(F.col(text_col), chunk_words).alias("chunks"),
        F.size(toks).alias("n_words"),
        F.aggregate(
            F.transform(toks, F.length),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_chars"),
    )

    bigrams = base.select(
        "id",
        "n_words",
        F.explode(
            F.when(
                F.col("n_words") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.col("n_words") - 1),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("toks"), i, 2)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ).alias("bigram"),
    )
    # Chars of every occurrence of the MOST FREQUENT bigram, counted
    # only when it repeats (cnt > 1). NOTE (ADVICE r5): this gate is a
    # DELIBERATE deviation from common Gopher reimplementations (e.g.
    # DataTrove's find_top_duplicate counts the top bigram's coverage
    # even at cnt == 1) — a single occurrence is not repetition, and
    # without the guard every short unique document flags because one
    # bigram's chars dominate a small total. Thresholds here are tuned
    # against THIS definition (the q53 oracle encodes it). Argmax by
    # cnt via max(struct(cnt, chars)); a cnt tie takes the larger
    # coverage, so the VALUE is deterministic either way.
    top2 = (
        bigrams.groupBy("id", "bigram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("id")
        .agg(
            F.max(
                F.when(
                    F.col("cnt") > 1,
                    F.struct(
                        F.col("cnt").alias("c"),
                        (F.col("cnt") * (F.length("bigram") - 1)).alias(
                            "ch"
                        ),
                    ),
                )
            ).alias("_t2")
        )
        .select("id", F.col("_t2.ch").alias("top2_chars"))
    )

    out = (
        base.join(top2, "id", "left")
        .select(
            "id",
            "n_words",
            F.round(F.col("n_chars") / F.col("n_words"), 6).alias(
                "mean_word_len"
            ),
            F.round(
                F.size(F.array_distinct("toks")) / F.col("n_words"), 6
            ).alias("distinct_frac"),
            F.round(
                (F.size("chunks") - F.size(F.array_distinct("chunks")))
                / F.size("chunks"),
                6,
            ).alias("dup_chunk_frac"),
            # ADVICE r3: n_chars=0 (empty/whitespace-only doc) made this
            # 0/0 -> NULL and `flagged` NULL, so filter(~flagged) silently
            # dropped such docs; guard the division so the fraction (and
            # therefore the flag) is always a concrete value.
            F.round(
                F.when(
                    F.col("n_chars") > 0,
                    F.coalesce(F.col("top2_chars"), F.lit(0))
                    / F.col("n_chars"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("top2gram_char_frac"),
        )
        .withColumn(
            "flagged",
            F.coalesce(
                (F.col("distinct_frac") < min_distinct_frac)
                | (F.col("top2gram_char_frac") > max_top2gram_frac),
                F.lit(False),
            ),
        )
    )
    return out


#: Gopher §A1.1 repetition thresholds: top-n-gram char fraction caps for
#: n=2,3,4 and duplicate-n-gram char fraction caps for n=5..10
GOPHER_TOP_NGRAM_CAPS = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_CAPS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def repetition_ngram_fractions(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_ns: tuple[int, ...] = (3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
    top_caps: dict[int, float] | None = None,
    dup_caps: dict[int, float] | None = None,
) -> DataFrame:
    """The REST of the Gopher repetition ladder (Rae et al. 2021 Table
    A1) beyond :func:`gopher_repetition`'s top-2-gram, with the
    REFERENCE-FAITHFUL semantics the published thresholds assume:

    - top-n (n=3,4): chars of every occurrence of the most frequent
      n-gram, COUNTED ONLY IF it occurs more than once (a single
      occurrence is not repetition — without this guard every short
      document flags, since one n-gram's chars dominate a small total);
    - dup-n (n=5..10): fraction of characters inside ANY duplicated
      n-gram, each character counted ONCE (positional union over
      covered token indices, never the occurrence-sum that
      double-counts overlaps and runs several times hotter than the
      caps — the fraction is <= 1 by construction).

    ``rep_flagged`` fires when any metric breaches its Gopher cap.

    Returns (id, top{n}gram_char_frac..., dup{n}gram_char_frac...,
    rep_flagged). Plan: ALL the n's ride ONE explode of (n, gram, pos)
    structs; the duplicate-coverage union explodes covered token
    indices ONLY for the duplicated slice (the span_dedup pattern) and
    joins per-token lengths; every shuffle is keyed (id[, n, ...]) and
    combiner-friendly; document text never shuffles.
    """
    top_caps = dict(GOPHER_TOP_NGRAM_CAPS if top_caps is None else top_caps)
    dup_caps = dict(GOPHER_DUP_NGRAM_CAPS if dup_caps is None else dup_caps)
    all_ns = sorted(set(top_ns) | set(dup_ns))
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(
        F.col(id_col).alias("id"),
        toks.alias("toks"),
        F.size(toks).alias("n_words"),
        F.aggregate(
            F.transform(toks, F.length),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_chars"),
    )

    def grams_of(n: int) -> Column:
        k = F.col("n_words") - (n - 1)
        return F.when(
            k <= 0,
            F.array().cast("array<struct<n: int, pos: int, gram: string>>"),
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), k),
                _ngram_struct_factory(n),
            )
        )

    pairs = base.select(
        "id", F.explode(F.concat(*[grams_of(n) for n in all_ns])).alias("g")
    ).select(
        "id",
        F.col("g.n").alias("n"),
        F.col("g.pos").alias("pos"),
        F.col("g.gram").alias("gram"),
    )
    counts = pairs.groupBy("id", "n", "gram").agg(F.count("*").alias("cnt"))
    occ_chars = F.col("cnt") * (F.length("gram") - (F.col("n") - 1))
    # argmax by cnt (the MOST FREQUENT repeated n-gram's coverage, as
    # the docstring promises) — not max coverage over all repeated
    # n-grams, which over-flags long-phrase documents vs the published
    # caps; cnt ties take the larger coverage (deterministic value)
    tops = (
        counts.groupBy("id", "n")
        .agg(
            F.max(
                F.when(
                    F.col("cnt") > 1,
                    F.struct(F.col("cnt").alias("c"), occ_chars.alias("ch")),
                )
            ).alias("_top")
        )
        .select("id", "n", F.col("_top.ch").alias("topc"))
    )
    # duplicate coverage: positions of duplicated grams -> covered token
    # indices (union via distinct) -> sum of those tokens' lengths
    dup_occ = pairs.join(
        counts.filter(F.col("cnt") > 1).select("id", "n", "gram"),
        ["id", "n", "gram"],
        "left_semi",
    )
    covered = dup_occ.select(
        "id",
        "n",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.col("n") - 1)
        ).alias("tokidx"),
    ).distinct()
    tok_lens = base.select(
        "id", F.posexplode("toks").alias("tokidx0", "tok")
    ).select(
        "id",
        (F.col("tokidx0") + 1).alias("tokidx"),
        F.length("tok").alias("toklen"),
    )
    dups = covered.join(tok_lens, ["id", "tokidx"]).groupBy("id", "n").agg(
        F.sum("toklen").alias("dupc")
    )
    per_n = tops.join(dups, ["id", "n"], "full_outer")
    piv = per_n.groupBy("id").pivot("n", list(all_ns)).agg(
        F.first("topc").alias("topc"), F.first("dupc").alias("dupc")
    )

    def frac(raw: Column) -> Column:
        return F.round(
            F.when(
                F.col("n_chars") > 0,
                F.coalesce(raw, F.lit(0)) / F.col("n_chars"),
            ).otherwise(F.lit(0.0)),
            6,
        )

    out_cols = [F.col("id")]
    flags = []
    for n in top_ns:
        c = frac(F.col(f"{n}_topc")).alias(f"top{n}gram_char_frac")
        out_cols.append(c)
        if n in top_caps:
            flags.append(
                F.col(f"top{n}gram_char_frac") > F.lit(top_caps[n])
            )
    for n in dup_ns:
        c = frac(F.col(f"{n}_dupc")).alias(f"dup{n}gram_char_frac")
        out_cols.append(c)
        if n in dup_caps:
            flags.append(F.col(f"dup{n}gram_char_frac") > F.lit(dup_caps[n]))
    out = base.select("id", "n_chars").join(piv, "id", "left").select(*out_cols)
    flag = flags[0]
    for f_ in flags[1:]:
        flag = flag | f_
    return out.withColumn("rep_flagged", F.coalesce(flag, F.lit(False)))


def _ngram_struct_factory(n: int):
    """Factory so the loop variable binds per-n (the _ngram_join_factory
    convention)."""
    return lambda i: F.struct(
        F.lit(n).alias("n"),
        i.cast("int").alias("pos"),
        F.concat_ws(" ", F.slice(F.col("toks"), i, n)).alias("gram"),
    )


def ngram_word_structs(arr: Column, n: int) -> Column:
    """(w1..wn) structs for positions n..size of a token array — the
    shared builder behind every rung of the LM ladder (bigram here,
    trigram in functions/ngram_lm.py), so the subtle guard lives ONCE:
    ``sequence(n, size)`` DESCENDS when size < n (step inferred -1) and
    ``element_at`` past the end throws under ANSI, so short docs get an
    explicit empty array instead."""
    structs = F.transform(
        F.sequence(F.lit(n), F.size(arr)),
        lambda i: F.struct(
            *[
                F.element_at(arr, i - (n - 1 - k)).alias(f"w{k + 1}")
                for k in range(n)
            ]
        ),
    )
    fields = ",".join(f"w{k + 1}:string" for k in range(n))
    empty = F.array().cast(f"array<struct<{fields}>>")
    return F.when(F.size(arr) >= n, structs).otherwise(empty)


def unigram_crossentropy(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab_broadcast: bool | None = None,
) -> DataFrame:
    """CCNet-style LM quality proxy (Wenzek et al. 2020 use KenLM
    perplexity buckets; the self-corpus unigram model is the cheap,
    dependency-free stand-in): per-document mean -log2 p(token) under the
    corpus's own unigram distribution. Low = boilerplate-heavy common
    vocabulary, high = rare/surprising vocabulary; pipelines keep the
    middle buckets.

    Returns (id, n_tokens, xent).

    Plan: one (token) shuffle builds the vocabulary with map-side
    combine; the corpus total rides a 1-row broadcast (crossJoin of an
    agg, never a collect); the token->count join broadcasts the vocab
    when a bounded limit+count probe says it fits (web-corpus vocabs
    are Zipf — tens of millions of rows at 100 TB, so the probe flips
    to a shuffle join keyed on the token, which AQE skew-splits for
    stop-word keys); final per-doc mean is one keyed shuffle.
    """
    from ..operators.frontier import small_enough_to_broadcast

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    # total tokens == sum of vocab counts, but computed as a shuffle-free
    # partial-agg scan over the SOURCE (plan audit: deriving it from
    # `vocab` re-ran the whole explode+tok-shuffle a second time)
    total = df.agg(
        F.sum(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
        .cast("double")
        .alias("total")
    )
    if vocab_broadcast is None:
        vocab_broadcast = small_enough_to_broadcast(vocab)
    v = F.broadcast(vocab) if vocab_broadcast else vocab
    joined = toks.join(v, "tok").crossJoin(F.broadcast(total))
    return joined.groupBy("id").agg(
        F.count("*").alias("n_tokens"),
        F.round(
            F.avg(-F.log2(F.col("cnt") / F.col("total"))), 6
        ).alias("xent"),
    )


def sb_count_tables(
    tdf: DataFrame, text_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(utab, btab, scal) — the unigram/bigram count tables + (total,
    vsize) scalar every Stupid-Backoff rung scores against. Build ONCE
    per training corpus and pass to both :func:`bigram_crossentropy` and
    ``ngram_lm.trigram_crossentropy`` via ``tables=``: the ladder then
    shares one token-explode and one bigram-explode shuffle (identical
    plan fragments -> exchange reuse) and one broadcast-size probe per
    table instead of rebuilding per rung."""
    ttoks_arr = _nonempty_tokens(F.col(text_col))
    train_tok = tdf.select(F.explode(ttoks_arr).alias("tok"))
    utab = train_tok.groupBy("tok").agg(F.count("*").alias("ucnt"))
    btab = (
        tdf.select(F.explode(ngram_word_structs(ttoks_arr, 2)).alias("bg"))
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count("*").alias("bcnt"))
    )
    # scalars off ONE partial-agg scan of the training corpus: total
    # tokens + distinct vocab (the latter needs the tok shuffle anyway,
    # so derive both from utab — one extra agg over an already-built
    # table, not a second corpus read)
    scal = utab.agg(
        F.sum("ucnt").cast("double").alias("total"),
        F.count("*").cast("double").alias("vsize"),
    )
    return utab, btab, scal


def bigram_crossentropy(
    df: DataFrame,
    text_col: str,
    id_col: str,
    train_df: DataFrame | None = None,
    alpha: float = 0.4,
    vocab_broadcast: bool | None = None,
    tables: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Stupid-Backoff bigram cross-entropy (Brants et al. 2007) — the
    next rung of the CCNet LM-quality ladder above
    :func:`unigram_crossentropy` (Wenzek et al. 2020 use 5-gram KenLM;
    a backoff bigram captures local word order, which a unigram model is
    blind to: shuffled boilerplate and fluent prose share a unigram
    distribution but not a bigram one).

    Per position i>=2:  S(w_i | w_{i-1}) =
        count(w_{i-1} w_i) / count(w_{i-1})      if the bigram was seen,
        alpha * (count(w_i)+1) / (total+V)       otherwise
    (Laplace floor on the backoff so unseen words score finitely when
    ``train_df`` is a held-out model corpus). Returns
    (id, n_bigrams, xent2) with xent2 = mean -log2 S; docs with < 2
    tokens get n_bigrams=0, xent2 NULL.

    Plan: bigrams come straight off the token ARRAY (transform over
    sequence -> one explode) — never a positional self-join; bigram and
    unigram tables build with map-side combine; scoring joins broadcast
    when the bounded probe says the model fits (Zipf vocabs at 100 TB
    flip to shuffle joins AQE skew-splits on stop-word heads); the scalar
    (total, V) rides a 1-row broadcast crossJoin, never a collect.
    """
    from ..operators.frontier import small_enough_to_broadcast

    tdf = train_df if train_df is not None else df

    def bigram_structs(arr: Column) -> Column:
        return ngram_word_structs(arr, 2)

    utab, btab, scal = (
        tables if tables is not None else sb_count_tables(tdf, text_col)
    )
    if vocab_broadcast is None:
        # probe what we broadcast: btab (bigrams) is the 5-10x LARGER
        # table — gating both on utab alone could pass a unigram table
        # that barely fits and then ship a bigram table that doesn't
        # (the ngram_lm probe-the-largest rule)
        vocab_broadcast = small_enough_to_broadcast(btab)
    u = F.broadcast(utab) if vocab_broadcast else utab
    b = F.broadcast(btab) if vocab_broadcast else btab

    doc_bg = df.select(
        F.col(id_col).alias("id"),
        F.explode(bigram_structs(_nonempty_tokens(F.col(text_col)))).alias("bg"),
    ).select("id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    scored = (
        doc_bg.join(b, ["w1", "w2"], "left")
        .join(u.select(F.col("tok").alias("w1"), F.col("ucnt").alias("c1")), "w1", "left")
        .join(u.select(F.col("tok").alias("w2"), F.col("ucnt").alias("c2")), "w2", "left")
        .crossJoin(F.broadcast(scal))
    )
    s = F.when(
        F.col("bcnt").isNotNull() & (F.coalesce(F.col("c1"), F.lit(0)) > 0),
        F.col("bcnt") / F.col("c1"),
    ).otherwise(
        F.lit(alpha)
        * (F.coalesce(F.col("c2"), F.lit(0)) + 1)
        / (F.col("total") + F.col("vsize"))
    )
    per_doc = scored.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg(-F.log2(s)), 6).alias("xent2"),
    )
    # docs with <2 tokens produce no bigram rows: restore them with
    # n_bigrams=0 so the operator is total over its input
    all_ids = df.select(F.col(id_col).alias("id")).distinct()
    return all_ids.join(per_doc, "id", "left").select(
        "id",
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.col("xent2"),
    )


def perplexity_buckets(
    df: DataFrame,
    score_col: str,
    id_col: str,
    lang_col: str | None = None,
    out_col: str = "ppl_bucket",
    labels: tuple[str, str, str] = ("head", "middle", "tail"),
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet head/middle/tail bucketing (Wenzek et al. 2020 §4.3): split
    each language's documents into perplexity tertiles — "head" (lowest
    perplexity, Wikipedia-like), "middle", "tail" — so a pretraining mix
    can sample buckets at different rates. ``score_col`` is any LM
    quality score (``unigram_crossentropy``'s xent, the bigram rung, or
    a real KenLM perplexity column).

    Production path (``exact=False``): per-language p33/p66 thresholds
    via ``percentile_approx`` — ONE tiny partial-aggregated shuffle of
    (lang, score) pairs and a broadcast join back; the corpus itself
    never re-shuffles, so the shape survives a 100 TB corpus where a
    per-language window would funnel each language through single
    reducers. Tie policy: score <= threshold buckets low, matching the
    CDF definition.

    Oracle path (``exact=True``): ``ntile(3)`` over (lang, score, id) —
    exact tertiles with a total order, expressible identically in SQL
    engines, for parity tests and small corpora.
    """
    from pyspark.sql import Window

    lang = F.col(lang_col) if lang_col is not None else F.lit("")
    null_bucket = F.lit(None).cast("string")
    # NULL score = unscored (e.g. the <2-token docs whose bigram xent is
    # NULL by contract) -> NULL bucket in BOTH paths; the two flavors
    # previously disagreed (approx fell through to 'tail', exact's
    # NULLS-FIRST ntile put them in 'head') and neither matched the
    # module's NULL-means-unscored convention (ccnet_buckets).
    if exact:
        scored_rows = df.filter(F.col(score_col).isNotNull())
        w = Window.partitionBy(lang).orderBy(F.col(score_col), F.col(id_col))
        tile = F.ntile(3).over(w)
        bucket = (
            F.when(tile == 1, labels[0])
            .when(tile == 2, labels[1])
            .otherwise(labels[2])
        )
        return scored_rows.withColumn(out_col, bucket).unionByName(
            df.filter(F.col(score_col).isNull()).withColumn(
                out_col, null_bucket
            )
        )
    cuts = (
        df.groupBy(lang.alias("_pb_lang"))
        .agg(
            F.percentile_approx(
                F.col(score_col), [1.0 / 3.0, 2.0 / 3.0], accuracy
            ).alias("_pb_cuts")
        )
        .select(
            "_pb_lang",
            F.col("_pb_cuts")[0].alias("_pb_t1"),
            F.col("_pb_cuts")[1].alias("_pb_t2"),
        )
    )
    # eqNullSafe: a NULL lang group still gets ITS OWN cuts row (groupBy
    # keeps NULL keys); plain == would never match it and every NULL-lang
    # doc would silently land in "tail"
    joined = df.join(
        F.broadcast(cuts), lang.eqNullSafe(F.col("_pb_lang")), "left"
    )
    bucket = (
        F.when(F.col(score_col).isNull(), null_bucket)
        .when(F.col(score_col) <= F.col("_pb_t1"), labels[0])
        .when(F.col(score_col) <= F.col("_pb_t2"), labels[1])
        .otherwise(labels[2])
    )
    return joined.withColumn(out_col, bucket).drop(
        "_pb_lang", "_pb_t1", "_pb_t2"
    )


# ---------------------------------------------------------------------------
# Model-based quality scoring (fastText/DCLM-style linear classifier)
# ---------------------------------------------------------------------------

def _nonempty_tokens(text: Column) -> Column:
    """Whitespace tokens with the [""]-on-empty artifact filtered out."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def hash64_expr(s: Column, hasher: str) -> Column:
    """THE dual-hasher dispatch, shared by every feature-hash site
    (_gram_bucket, sampling.hash_uniform): hasher='xxhash64' is the
    production path (JVM, codegen'd); hasher='md5' is the portable path
    the DuckDB oracle recomputes bit-for-bit (first 8 hex chars of md5
    -> int). One definition so an oracle-parity fix can't miss a copy.
    """
    if hasher == "xxhash64":
        return F.xxhash64(s)
    if hasher == "md5":
        return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    raise ValueError(f"unknown hasher {hasher!r}")


def _gram_bucket(gram: Column, n_buckets: int, hasher: str) -> Column:
    """Feature-hash one n-gram string to a bucket id in [0, n_buckets)
    via :func:`hash64_expr` (the same dual-hasher convention as
    operators/dedup.minhash_signatures)."""
    return F.pmod(hash64_expr(gram, hasher), F.lit(n_buckets)).cast("long")


def hashed_ngram_buckets(
    text: Column,
    n_buckets: int = 1 << 20,
    ngram_sizes: tuple[int, ...] = (1, 2),
    hasher: str = "xxhash64",
) -> Column:
    """Hashed bag-of-word-n-grams feature ids as ``array<long>`` — the
    fastText input representation (Joulin et al. 2016: words + hashed
    n-grams into a fixed bucket table), entirely JVM column expressions
    so feature extraction rides whole-stage codegen with zero Python.

    One entry per token/n-gram occurrence (a bag, not a set — counts
    matter to the linear model exactly as in fastText's mean-of-rows).
    """

    def grams_of(n: int) -> Column:
        toks = _nonempty_tokens(text)
        if n == 1:
            return toks
        k = F.size(toks) - (n - 1)
        return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), k),
                _ngram_join_factory(text, n),
            )
        )

    arrays = [
        F.transform(
            grams_of(n), lambda g: _gram_bucket(g, n_buckets, hasher)
        )
        for n in ngram_sizes
    ]
    return arrays[0] if len(arrays) == 1 else F.concat(*arrays)


def _ngram_join_factory(text: Column, n: int):
    """Factory, not an inline lambda: a closure capturing the loop var
    ``n`` directly would rebind across ``ngram_sizes`` iterations."""
    toks = _nonempty_tokens(text)
    return lambda i: F.concat_ws(" ", F.slice(toks, i, n))


def train_quality_classifier(
    df: DataFrame,
    text_col: str,
    label_col: str,
    n_buckets: int = 1 << 20,
    ngram_sizes: tuple[int, ...] = (1, 2),
    hasher: str = "xxhash64",
    smoothing: float = 1.0,
) -> tuple[DataFrame, float]:
    """Train a DCLM-style linear quality classifier: per-bucket log-odds
    (multinomial Naive Bayes with add-``smoothing``) over hashed n-gram
    features — the closed-form stand-in for fastText's trained linear
    layer, chosen because it is one deterministic distributed pass
    (fastText's async SGD is order-dependent; log-odds weights are not).

    ``label_col`` is 1 for high-quality exemplars (the DCLM recipe uses
    instruction/OH-2.5 pages), 0 for random web text. Returns
    ``(weights, bias)``: weights is (bucket long, weight double) —
    sparse, at most n_buckets rows — and bias = ln(n_pos/n_neg) document
    prior. Plan shape: one explode + one bucket-keyed groupBy (partial
    agg shrinks the explode map-side; bucket cardinality is n_buckets,
    skew bounded by the hash). Nothing ever reaches the driver except
    the 2x2 class totals.
    """
    lbl = F.col(label_col).cast("double")
    feats = df.select(
        lbl.alias("_y"),
        F.explode(
            hashed_ngram_buckets(
                F.col(text_col), n_buckets, ngram_sizes, hasher
            )
        ).alias("bucket"),
    )
    counts = feats.groupBy("bucket").agg(
        F.sum("_y").alias("pos"),
        F.sum(F.lit(1.0) - F.col("_y")).alias("neg"),
    ).persist()  # consumed twice: the totals .first() and the weights
    tp, tn = counts.agg(F.sum("pos"), F.sum("neg")).first()
    a, b = float(smoothing), float(n_buckets)
    weights = counts.select(
        "bucket",
        (
            F.log((F.col("pos") + a) / F.lit(float(tp) + a * b))
            - F.log((F.col("neg") + a) / F.lit(float(tn) + a * b))
        ).alias("weight"),
    )
    n_pos, n_neg = (
        df.agg(F.sum(lbl), F.sum(F.lit(1.0) - lbl)).first()
    )
    import math

    bias = math.log((float(n_pos) + a) / (float(n_neg) + a))
    return weights, bias


def quality_classifier_score(
    df: DataFrame,
    text_col: str,
    weights,
    score_col: str = "clf_score",
    n_buckets: int = 1 << 20,
    ngram_sizes: tuple[int, ...] = (1, 2),
    hasher: str = "xxhash64",
    bias: float = 0.0,
    default_weight: float = 0.0,
) -> DataFrame:
    """Score every document with the linear classifier:
    ``sigmoid(bias + mean(weight[bucket] for each n-gram))`` — fastText's
    mean-of-feature-rows readout.

    Execution shape (the 100 TB path, VERDICT r4 item 1): feature
    hashing stays JVM-side (:func:`hashed_ngram_buckets`); the weight
    table densifies to ONE numpy vector of ``n_buckets`` doubles (8 MB
    at 2^20 — fastText-model-sized) broadcast to every executor; scoring
    is a vectorized Arrow-batch gather + segment-sum (np.bincount) in a
    scalar pandas UDF. Zero shuffles, zero per-row Python, corpus
    scanned once.

    ``weights`` is the (bucket, weight) DataFrame from
    :func:`train_quality_classifier` (collected here — bounded by
    n_buckets, it IS the model) or a prebuilt numpy array of length
    n_buckets. Buckets never seen in training score ``default_weight``.
    Documents with no features score ``sigmoid(bias)``.
    """
    import numpy as np

    if isinstance(weights, DataFrame):
        w = np.full(n_buckets, float(default_weight), dtype=np.float64)
        for bucket, weight in weights.collect():
            w[int(bucket)] = float(weight)
    else:
        w = np.asarray(weights, dtype=np.float64)
        if w.shape != (n_buckets,):
            raise ValueError(f"weights shape {w.shape} != ({n_buckets},)")
    bc = df.sparkSession.sparkContext.broadcast(w)
    bias_f = float(bias)

    @F.pandas_udf("double")
    def _score(buckets):
        import numpy as _np
        import pandas as _pd

        # NULL text -> NULL bucket array (split(NULL) is NULL): treat as
        # featureless, scoring sigmoid(bias) — same as an empty doc —
        # instead of np.asarray(None) raising TypeError mid-task
        arrs = [
            _np.asarray(a if a is not None else [], dtype=_np.int64)
            for a in buckets
        ]
        lens = _np.array([len(a) for a in arrs], dtype=_np.int64)
        if lens.sum() == 0:
            z = _np.full(len(arrs), bias_f)
        else:
            flat = _np.concatenate([a for a in arrs if len(a)])
            gathered = bc.value[flat]
            doc_idx = _np.repeat(_np.arange(len(arrs)), lens)
            sums = _np.bincount(
                doc_idx, weights=gathered, minlength=len(arrs)
            )
            z = bias_f + sums / _np.maximum(lens, 1)
        z = _np.clip(z, -60.0, 60.0)
        return _pd.Series(1.0 / (1.0 + _np.exp(-z)))

    return df.withColumn(
        score_col,
        _score(
            hashed_ngram_buckets(
                F.col(text_col), n_buckets, ngram_sizes, hasher
            )
        ),
    )


def train_domain_classifier(
    df: DataFrame,
    text_col: str,
    label_col: str,
    n_buckets: int = 1 << 20,
    ngram_sizes: tuple[int, ...] = (1, 2),
    hasher: str = "xxhash64",
    smoothing: float = 1.0,
) -> tuple[DataFrame, dict[int, float], dict[int, float]]:
    """Multi-class sibling of :func:`train_quality_classifier` — the
    domain/topic labeler a mixing pipeline needs before
    ``operators/sampling.temperature_sample`` can rebalance by domain
    (the WebOrganizer/DCLM domain-mixing stage). Multinomial Naive
    Bayes over hashed n-grams: per-(bucket, label) log-probability
    weights ``ln((count + a) / (total_label + a * n_buckets))``, one
    explode + one (bucket, label)-keyed partial-agg groupBy; only the
    per-label document totals reach the driver (the priors).

    ``label_col``: small int domain ids. Returns ``(weights, priors,
    unseen)``: weights is (bucket long, label int, weight double) with
    ``weight = ln((count + a) / a)`` — POSITIVE evidence above the
    smoothed-zero baseline, so a sparse table with default 0 is exact —
    priors maps label -> ln(n_label / n_docs), and unseen maps label ->
    ``ln(a / (total_label + a * n_buckets))``, the per-gram baseline the
    scorer adds n_grams times (the decomposition
    ``ln((c+a)/(t+aB)) = ln((c+a)/a) + ln(a/(t+aB))`` makes the dense
    NB log-likelihood recoverable from the sparse table; a naive
    default-0 over raw log-probabilities would make UNSEEN vocabulary
    outscore seen vocabulary, since log-probs are negative).
    """
    import math

    lbl = F.col(label_col).cast("int")
    feats = df.select(
        lbl.alias("label"),
        F.explode(
            hashed_ngram_buckets(
                F.col(text_col), n_buckets, ngram_sizes, hasher
            )
        ).alias("bucket"),
    )
    counts = feats.groupBy("bucket", "label").agg(
        F.count("*").cast("double").alias("c")
    )
    # the (bucket, label) table is the model (bounded by n_buckets x
    # labels): persist it so the totals pass, the weights collect and
    # any scorer reuse don't re-run the corpus explode
    counts = counts.persist()
    a, b = float(smoothing), float(n_buckets)
    weights = counts.select(
        "bucket",
        "label",
        F.log((F.col("c") + a) / F.lit(a)).alias("weight"),
    )
    totals = {
        int(r["label"]): float(r["t"])
        for r in counts.groupBy("label").agg(F.sum("c").alias("t")).collect()
    }
    doc_counts = {
        int(r["label"]): int(r["n"])
        for r in df.groupBy(lbl.alias("label"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_docs = sum(doc_counts.values())
    priors = {l: math.log(n / n_docs) for l, n in doc_counts.items()}
    unseen = {
        l: math.log(a / (totals.get(l, 0.0) + a * b)) for l in doc_counts
    }
    return weights, priors, unseen


def domain_classifier_scores(
    df: DataFrame,
    text_col: str,
    weights,
    priors: dict[int, float],
    unseen: dict[int, float],
    domain_col: str = "domain",
    score_col: str = "domain_score",
    n_buckets: int = 1 << 20,
    ngram_sizes: tuple[int, ...] = (1, 2),
    hasher: str = "xxhash64",
    round_decimals: int = 6,
) -> DataFrame:
    """Label every document with its argmax NB domain:
    ``score_l = prior_l + n_grams * unseen_l + sum(weight_l[bucket])``
    over the doc's hashed n-grams — exact multinomial NB via the sparse
    decomposition from :func:`train_domain_classifier` — argmax broken
    by (rounded score DESC, label ASC) so the decision is
    engine-portable (the oracle replays the identical rule in SQL).
    ``round_decimals``: scores are rounded BEFORE the argmax and in the
    output; oracle-compared callers should size it to the score
    magnitude (log-prob sums grow with doc length, and a 6-decimal
    boundary on a ~1000-magnitude float is within cross-engine
    summation noise — q55 passes 4).

    Execution shape: feature hashing JVM-side; the weight table
    densifies to ONE (n_labels, n_buckets) float64 matrix broadcast
    everywhere (24 MB at 3 x 2^20); scoring is one Arrow-batch gather +
    per-label bincount. Zero shuffles, corpus scanned once.
    """
    import numpy as np

    labels = sorted(priors)
    lab_index = {l: i for i, l in enumerate(labels)}
    if isinstance(weights, DataFrame):
        w = np.zeros((len(labels), n_buckets), dtype=np.float64)
        for bucket, label, weight in weights.collect():
            w[lab_index[int(label)], int(bucket)] = float(weight)
    else:
        w = np.asarray(weights, dtype=np.float64)
        if w.shape != (len(labels), n_buckets):
            raise ValueError(f"weights shape {w.shape}")
    prior_vec = np.array([priors[l] for l in labels], dtype=np.float64)
    unseen_vec = np.array([unseen[l] for l in labels], dtype=np.float64)
    label_arr = np.array(labels, dtype=np.int64)
    bc = df.sparkSession.sparkContext.broadcast(
        (w, prior_vec, unseen_vec, label_arr)
    )

    @F.pandas_udf("struct<domain: int, domain_score: double>")
    def _classify(buckets):
        import numpy as _np
        import pandas as _pd

        W, pv, uv, labs = bc.value
        arrs = [
            _np.asarray(a if a is not None else [], dtype=_np.int64)
            for a in buckets
        ]
        lens = _np.array([len(a) for a in arrs], dtype=_np.int64)
        n = len(arrs)
        scores = pv[None, :] + lens[:, None] * uv[None, :]
        if lens.sum():
            flat = _np.concatenate([a for a in arrs if len(a)])
            doc_idx = _np.repeat(_np.arange(n), lens)
            for li in range(len(labs)):
                scores[:, li] += _np.bincount(
                    doc_idx, weights=W[li, flat], minlength=n
                )
        scores = _np.round(scores, round_decimals)
        # argmax with (score DESC, label ASC): labels are sorted, and
        # np.argmax returns the FIRST max — exactly the SQL tie-break
        best = scores.argmax(axis=1)
        return _pd.DataFrame(
            {
                "domain": labs[best].astype("int32"),
                "domain_score": scores[_np.arange(n), best],
            }
        )

    out = df.withColumn(
        "_dc",
        _classify(
            hashed_ngram_buckets(
                F.col(text_col), n_buckets, ngram_sizes, hasher
            )
        ),
    )
    # withColumn REPLACES a pre-existing column of the same name instead
    # of emitting an ambiguous duplicate
    return (
        out.withColumn(domain_col, F.col("_dc.domain"))
        .withColumn(score_col, F.col("_dc.domain_score"))
        .drop("_dc")
    )


#: case-insensitive markers of an error page served with HTTP 200 —
#: the "soft 404" pattern that pollutes crawled corpora (the server
#: lies, so status-code filtering can't catch it; content must)
SOFT404_RE = (
    r"(?i)\b(404|page not found|not be found|no longer (?:exists|available)"
    r"|page (?:unavailable|does ?n[o']t exist)|file not found)\b"
)


def soft404_flags(
    text: Column,
    title: Column | None = None,
    probe_chars: int = 400,
    min_chars: int = 64,
) -> Column:
    """Soft-404 detection: error pages served with HTTP 200. Flags as ONE
    zero-shuffle struct (concrete booleans for NULL/empty input, the
    module's NULL-flag convention):

    - ``title_404``: the title carries an error marker (strongest signal
      — real 404 templates almost always title themselves);
    - ``body_404``: the marker appears in the first ``probe_chars`` of
      body text (bounded probe: a legit article MENTIONING 404 deep in
      its body should not be dropped);
    - ``tiny_body``: under ``min_chars`` non-space chars — error pages
      are navigation shells;
    - ``soft404``: title hit, or a body hit on a tiny body. A downstream
      sink filters ``~soft404`` before documents reach the corpus.
    """
    body_probe = F.substring(F.coalesce(text, F.lit("")), 1, probe_chars)
    n_chars = F.length(
        F.regexp_replace(F.coalesce(text, F.lit("")), r"\s+", "")
    )
    title_404 = (
        F.coalesce(F.coalesce(title, F.lit("")).rlike(SOFT404_RE), F.lit(False))
        if title is not None
        else F.lit(False)
    )
    body_404 = F.coalesce(body_probe.rlike(SOFT404_RE), F.lit(False))
    tiny = n_chars < min_chars
    return F.struct(
        title_404.alias("title_404"),
        body_404.alias("body_404"),
        tiny.alias("tiny_body"),
        (title_404 | (body_404 & tiny)).alias("soft404"),
    )


#: Gopher §A1.1 stop-word list (the filter requires >= 2 distinct hits)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.80,
    min_stopwords: int = 2,
) -> Column:
    """The rest of the Gopher quality-filter suite (Rae et al. 2021,
    §A1.1) as ONE zero-shuffle struct expression — complements
    :func:`gopher_repetition` (which needs a shuffle for its bigram
    mode): word-count bounds, mean-word-length band, symbol-to-word
    ratio (# and ... ellipses), fraction of words containing an
    alphabetic character, and >= ``min_stopwords`` distinct stop words.

    Fields: n_words, bad_word_count, bad_mean_word_len, high_symbol_ratio,
    low_alpha_frac, low_stopwords, flagged (OR of all). Like
    gopher_repetition the flag is a concrete boolean for every row
    (empty docs included).
    """
    # _nonempty_tokens drops the [""] artifact split(trim('')) produces,
    # so n_words is 0 for empty/whitespace-only docs (ADVICE r4) — same
    # tokenizer as the classifier's feature hashing
    toks = _nonempty_tokens(text)
    n = F.size(toks)
    n_chars = F.aggregate(
        F.transform(toks, F.length), F.lit(0).cast("long"), lambda a, x: a + x
    )
    mean_len = F.when(n > 0, n_chars / n).otherwise(F.lit(0.0))
    n_symbols = F.size(
        F.regexp_extract_all(text, F.lit(r"#|\.\.\.|…"), F.lit(0))
    )
    symbol_ratio = F.when(n > 0, n_symbols / n).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n > 0,
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / n,
    ).otherwise(F.lit(0.0))
    lower = F.transform(toks, F.lower)
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
            lambda w: F.array_contains(lower, w),
        )
    )
    bad_count = (n < min_words) | (n > max_words)
    bad_mean = (mean_len < min_mean_word_len) | (mean_len > max_mean_word_len)
    high_sym = symbol_ratio > max_symbol_ratio
    low_alpha = alpha_frac < min_alpha_word_frac
    low_stop = n_stop < min_stopwords
    return F.struct(
        n.cast("long").alias("n_words"),
        F.coalesce(bad_count, F.lit(True)).alias("bad_word_count"),
        F.coalesce(bad_mean, F.lit(True)).alias("bad_mean_word_len"),
        F.coalesce(high_sym, F.lit(False)).alias("high_symbol_ratio"),
        F.coalesce(low_alpha, F.lit(True)).alias("low_alpha_frac"),
        F.coalesce(low_stop, F.lit(True)).alias("low_stopwords"),
        F.coalesce(
            bad_count | bad_mean | high_sym | low_alpha | low_stop,
            F.lit(True),
        ).alias("flagged"),
    )


def line_quality_metrics(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_words: int = 10,
    max_removed_frac: float = 0.05,
    line_sep: str | None = "\n",
    append: bool = False,
) -> DataFrame:
    """RefinedWeb line-wise correction metrics (Penedo et al. 2023 §3.3):
    lines that are all-uppercase shouting, purely numeric, social
    counters ("3 likes"), or short navigation stubs are removal
    candidates; a document whose removed lines exceed
    ``max_removed_frac`` of its characters is flagged entirely.

    Lines are ``line_sep`` splits when the text has real newlines; with
    ``line_sep=None`` (or no newline present) the same fixed-width
    pseudo-lines as paragraph_dedup stand in, so the operator works on
    the newline-free fixture corpus too.

    Per doc: (id, n_lines, frac_upper_lines, frac_numeric_lines,
    frac_short_lines, removed_char_frac, line_flagged). ONE zero-shuffle
    struct of array expressions — same execution shape as
    gopher_quality_flags. With ``append=True`` the metric columns are
    added to ``df`` in place (all input columns kept) — the 100 TB path:
    fold line metrics into the same scan as the rest of the quality
    stage instead of re-reading the corpus and joining on id.
    """
    from ..operators.dedup import paragraph_chunks_expr

    text = F.col(text_col)
    if line_sep is None:
        lines = paragraph_chunks_expr(text, chunk_words)
    else:
        lines = F.when(
            text.contains(line_sep), F.split(text, line_sep)
        ).otherwise(paragraph_chunks_expr(text, chunk_words))
    lines = F.filter(lines, lambda ln: F.trim(ln) != "")

    def is_upper(ln: Column) -> Column:
        return (F.upper(ln) == ln) & (F.lower(ln) != ln)

    def is_numeric(ln: Column) -> Column:
        return F.trim(ln).rlike(r"^[0-9 .,%]+$")

    def is_counter(ln: Column) -> Column:
        return F.trim(ln).rlike(
            r"(?i)^[0-9]+ (likes?|views?|comments?|shares?|upvotes?)$"
        )

    def is_short(ln: Column) -> Column:
        return F.length(F.trim(ln)) <= 10

    def is_removed(ln: Column) -> Column:
        return is_upper(ln) | is_numeric(ln) | is_counter(ln) | is_short(ln)

    def _frac(pred) -> Column:
        return F.when(
            F.size(lines) > 0,
            F.size(F.filter(lines, pred)) / F.size(lines),
        ).otherwise(F.lit(0.0))

    def _chars(arr: Column) -> Column:
        return F.aggregate(arr, F.lit(0.0), lambda a, ln: a + F.length(ln))

    removed_frac = F.when(
        _chars(lines) > 0,
        _chars(F.filter(lines, is_removed)) / _chars(lines),
    ).otherwise(F.lit(0.0))
    metrics = {
        "n_lines": F.size(lines).cast("long"),
        "frac_upper_lines": F.round(_frac(is_upper), 6),
        "frac_numeric_lines": F.round(_frac(is_numeric), 6),
        "frac_short_lines": F.round(_frac(is_short), 6),
        "removed_char_frac": F.round(removed_frac, 6),
        "line_flagged": F.coalesce(
            removed_frac > F.lit(float(max_removed_frac)), F.lit(False)
        ),
    }
    if append:
        return df.withColumns(metrics)
    return df.select(
        F.col(id_col).alias("id"),
        *[c.alias(n) for n, c in metrics.items()],
    )


@F.pandas_udf(T.DoubleType())
def compression_ratio_udf(text: pd.Series) -> pd.Series:
    """zlib-compressed size / raw size per document (level 6) — the
    compressibility quality signal: highly repetitive or templated text
    compresses far below normal prose, random/encrypted gibberish
    compresses above it, so pipelines band-pass on this one number
    (cheap, language-agnostic, catches what word-level rules miss).
    Empty/NULL docs -> 1.0 (neutral). Arrow-batched; zlib runs in C."""
    import zlib

    def one(t) -> float:
        if not t:
            return 1.0
        raw = t.encode("utf-8", "replace")
        return round(len(zlib.compress(raw, 6)) / len(raw), 6)

    return text.map(one)


def compressibility_band(
    text: Column, lo: float = 0.25, hi: float = 0.70
) -> Column:
    """struct(compression_ratio, too_repetitive, too_random) — the
    band-pass flags over `compression_ratio_udf` (defaults tuned for
    English prose, which sits ~0.3-0.6)."""
    r = compression_ratio_udf(text)
    return F.struct(
        r.alias("compression_ratio"),
        (r < F.lit(lo)).alias("too_repetitive"),
        (r > F.lit(hi)).alias("too_random"),
    )


# ---------------------------------------------------------------------------
# C4 heuristic cleaning rules (Raffel et al. 2020, §2.2) — the remaining
# rules of the C4 suite beyond the PII scrub above: line-level keep
# conditions and document-level drop conditions. All pure column
# expressions (zero shuffle, zero Python), composable with the Gopher and
# RefinedWeb line rules as another map-side stage.
# ---------------------------------------------------------------------------

#: line keep conditions (C4): ends in terminal punctuation, >= 5 words,
#: not a javascript/cookies boilerplate line
_C4_TERMINAL = ('.', '!', '?', '"', "'")
_C4_MIN_LINE_WORDS = 5


def _c4_line_keep(ln: Column) -> Column:
    t = F.trim(ln)
    terminal = F.substring(t, -1, 1).isin(*_C4_TERMINAL)
    words = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
    boiler = F.lower(t).rlike("javascript|cookies? (policy|enabled)")
    return terminal & (words >= _C4_MIN_LINE_WORDS) & ~boiler


def c4_clean_lines(text: Column) -> Column:
    """The C4 line filter as a transformation: keep only lines that end in
    terminal punctuation, have >= 5 words, and aren't javascript/cookie
    boilerplate; surviving lines re-join with newlines."""
    lines = F.split(F.coalesce(text, F.lit("")), "\n")
    return F.array_join(F.filter(lines, _c4_line_keep), "\n")


def c4_quality_flags(text: Column) -> Column:
    """Document-level C4 drop conditions as ONE struct expression:

    - ``lt3_sentences`` — fewer than 3 sentences (terminal-punct count);
    - ``has_lorem_ipsum`` — placeholder text anywhere;
    - ``has_curly_brace`` — ``{`` means code, C4 drops the page;
    - ``kept_line_frac`` — fraction of lines the C4 line filter keeps
      (diagnostic; C4 itself drops the lines, not the page);
    - ``flagged`` — OR of the three page-drop rules.

    Every field is concrete (never NULL) for every row, the same contract
    as :func:`gopher_quality_flags`.
    """
    t = F.coalesce(text, F.lit(""))
    low = F.lower(t)
    n_sentences = F.coalesce(
        F.regexp_count(t, F.lit(r"[.!?]")), F.lit(0)
    )
    lines = F.split(t, "\n")
    kept = F.size(F.filter(lines, _c4_line_keep))
    frac = F.when(
        F.size(lines) > 0, F.round(kept / F.size(lines), 6)
    ).otherwise(F.lit(0.0))
    lt3 = n_sentences < 3
    lorem = low.contains("lorem ipsum")
    curly = t.contains("{")
    return F.struct(
        n_sentences.alias("n_sentences"),
        lt3.alias("lt3_sentences"),
        lorem.alias("has_lorem_ipsum"),
        curly.alias("has_curly_brace"),
        frac.alias("kept_line_frac"),
        (lt3 | lorem | curly).alias("flagged"),
    )


def ccnet_buckets(
    scored: DataFrame,
    xent_col: str = "xent",
    by_col: str | None = None,
    probs: tuple[float, float] = (1 / 3, 2 / 3),
    accuracy: int = 10_000,
    cutoffs: tuple[float, float] | None = None,
    bucket_col: str = "ppl_bucket",
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3): rank
    documents by LM cross-entropy and cut at the ``probs`` percentiles —
    lowest-perplexity third = ``head`` (closest to the LM's training
    distribution), then ``middle``, ``tail``. CCNet computes cutoffs PER
    LANGUAGE (a single global cut would put all of a distant language in
    the tail): pass ``by_col`` for that.

    Scale shape: cutoffs come from mergeable ``percentile_approx``
    sketches (map-side combine, one tiny row per group — never a global
    sort); with explicit ``cutoffs`` the whole operator is one map-side
    CASE (the production path once cutoffs are published with the
    corpus). NULL cross-entropy (unscored docs) buckets as NULL —
    concrete head/middle/tail only ever means "scored and placed".
    """
    x = F.col(xent_col)
    if cutoffs is not None:
        t1, t2 = (F.lit(float(cutoffs[0])), F.lit(float(cutoffs[1])))
    else:
        pct = F.array(F.lit(float(probs[0])), F.lit(float(probs[1])))
        sketch = F.percentile_approx(xent_col, pct, F.lit(accuracy)).alias("_cuts")
        if by_col is not None:
            # eqNullSafe like perplexity_buckets: groupBy keeps the NULL
            # group and computes ITS cuts, but a plain == join would
            # never match it back (NULL != NULL) and every NULL-group
            # doc would fall through the when-chain
            cuts = scored.groupBy(
                F.col(by_col).alias("_cb_key")
            ).agg(sketch)
            scored = scored.join(
                F.broadcast(cuts),
                F.col(by_col).eqNullSafe(F.col("_cb_key")),
                "left",
            ).drop("_cb_key")
        else:
            scored = scored.crossJoin(F.broadcast(scored.agg(sketch)))
        t1, t2 = F.col("_cuts")[0], F.col("_cuts")[1]
    bucket = (
        F.when(x.isNull(), F.lit(None).cast("string"))
        .when(x <= t1, F.lit("head"))
        .when(x <= t2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    out = scored.withColumn(bucket_col, bucket)
    return out.drop("_cuts") if cutoffs is None else out

"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016).

The reference engine counts files and parses facets; token-level modeling
is part of the LLM-pipeline surface this engine adds on top (its nearest
reference analog is the per-batch counting in
src/metadata_crawler/api/utils.py ingest counters). Everything here is
built for the 100 TB shape:

- ``word_counts``: ONE pass over the corpus collapses it to the unique-word
  frequency table — the only corpus-sized job in training. At web scale the
  unique-word table is ~10^7-10^8 rows (Heaps' law), i.e. 3-4 orders of
  magnitude smaller than the corpus; every merge iteration below runs on
  THIS table, never the corpus.
- ``train_bpe``: the classic merge loop, distributed — each iteration is
  one map-side adjacent-pair explode + one (a,b)-keyed partial-agg groupBy
  over the vocab table, with ONLY the single best pair collected to the
  driver (k rows total over k merges). The merge itself is a pure JVM
  ``aggregate`` fold over the symbol array (greedy left-to-right,
  non-overlapping — fold semantics give exactly BPE's merge order).
  ``localCheckpoint`` every ``checkpoint_every`` iterations bounds plan
  growth the same way neardup_clusters bounds its label-propagation
  lineage.
- ``bpe_encode``: encoding with the learned ranks is a broadcast
  dict + Arrow-batched pandas UDF with a per-word memo (web text repeats
  words constantly, so the memo hit rate is ~word-frequency skew); the
  GPT-2-style min-rank loop reproduces the training segmentation exactly
  (asserted in tests).

Determinism: pair ties break on (count DESC, a ASC, b ASC) — no
hash-order dependence, so the same corpus always yields the same merge
table on any cluster size.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
import re

from pyspark.sql import functions as F

EOW = "</w>"  # end-of-word marker (Sennrich-style), its own terminal symbol


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Whitespace pre-tokenized (word, cnt) table — the one corpus pass.

    Empty tokens are filtered AFTER the split rather than guarded by
    ``trim``: Spark's trim strips only ASCII spaces, so tab/newline-padded
    text would otherwise emit phantom '' words into the vocab (and
    diverge from ``bpe_encode``'s Python ``str.split()`` inventory,
    which drops all whitespace runs)."""
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != ""
    )
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _initial_symbols(word: Column) -> Column:
    """chars + EOW terminal: 'low' -> ['l','o','w','</w>']."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.concat(chars, F.array(F.lit(EOW)))


def _adjacent_pairs(syms: Column) -> Column:
    # sequence(a, b) counts DOWN when a > b, so guard the 1-symbol case
    return F.when(
        F.size(syms) < 2,
        F.array().cast("array<struct<a:string,b:string>>"),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("a"),
                F.element_at(syms, i + 1).alias("b"),
            ),
        )
    )


def _merge_pair(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping merge of (a,b) -> a+b as a pure
    JVM fold: append unless the accumulator tail is 'a' and the incoming
    symbol is 'b' (the freshly merged 'ab' tail no longer equals 'a', so
    overlapping runs like 'aaa' -> ['aa','a'] come out exactly as BPE
    defines them)."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    min_count: int = 1,
    checkpoint_every: int = 8,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``num_merges`` BPE merges over the corpus.

    Returns (merges, vocab) where ``merges`` is the ordered rule list
    (driver-side, k entries — the tokenizer model) and ``vocab`` the final
    (word, cnt, syms) table with fully-merged symbol sequences.

    Scale shape: per iteration, exactly one shuffle — the (a,b)-keyed
    pair-count groupBy over the vocab table (map-side combine applies; the
    explode is map-side) — and a 1-row collect. Stops early when the best
    remaining pair falls below ``min_count``.
    """
    vocab = (
        word_counts(df, text_col)
        .select("word", "cnt", _initial_symbols(F.col("word")).alias("syms"))
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for it in range(int(num_merges)):
        best = (
            vocab.select(
                F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "cnt"
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        vocab = vocab.withColumn("syms", _merge_pair(F.col("syms"), a, b))
        if (it + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return merges, vocab


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style min-rank merge loop; reproduces training segmentation."""
    syms = [c for c in word] + [EOW]
    while len(syms) > 1:
        pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, (a, b) = min(ranked)
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: Sequence[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col`` (array<string> of BPE symbols) to ``df``.

    The rule table rides to executors once via broadcast; encoding is an
    Arrow-batched pandas UDF with a per-executor word memo — word-frequency
    skew (Zipf) makes the memo hit rate very high on web text, so the
    per-row cost converges to a dict lookup. No shuffle is introduced.
    """
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    ranks_bc = spark.sparkContext.broadcast(
        {tuple(p): i for i, p in enumerate(merges)}
    )

    # SAME tokenization as word_counts' Java \s+ (ASCII whitespace):
    # Python str.split() is Unicode-aware, so 'foo\u00a0bar' would be
    # ONE training word but TWO encode-time words — merges learned
    # across an NBSP would silently never apply
    _ws = re.compile(r"\s+", re.ASCII)

    @pandas_udf("array<array<string>>")
    def _encode(texts: pd.Series) -> pd.Series:
        ranks = ranks_bc.value
        memo: dict[str, list[str]] = {}

        def enc(text) -> list[list[str]]:
            if text is None:
                return []
            out = []
            for w in _ws.split(text):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, ranks)
                out.append(got)
            return out

        return texts.map(enc)

    return df.withColumn(
        out_col, F.flatten(_encode(F.col(text_col)))
    ).withColumn(f"{out_col}_n", F.size(out_col))


def merges_table(spark, merges: Iterable[tuple[str, str]]) -> DataFrame:
    """The learned rule list as a (rank, a, b) DataFrame — the persistable
    tokenizer artifact (write with sources.tables for reuse across jobs)."""
    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(rows, "rank: long, a: string, b: string")

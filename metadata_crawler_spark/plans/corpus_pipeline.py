"""End-to-end corpus-cleaning pipeline: the composition a pretraining
data team actually runs, built from this repo's operators in the
RefinedWeb/CCNet stage order:

1. quality gate      — Gopher repetition flags (functions/quality)
2. PII scrub         — email/phone redaction (functions/quality)
3. exact dedup       — md5 groupBy, keep min id (operators/dedup)
4. fuzzy dedup       — MinHash -> banded LSH -> exact Jaccard verify,
                       drop the higher id of each verified pair
5. paragraph dedup   — corpus-wide first-occurrence chunk dedup +
                       document recompose; drop mostly-duplicate docs
6. decontamination   — optional n-gram overlap vs a benchmark set

Paragraph dedup runs AFTER doc-level dedup (RefinedWeb's order: fuzzy
doc dedup, then exact substring dedup) — the other order lets corpus-
wide paragraph removal hollow out near-duplicate documents before the
fuzzy stage ever sees them, hiding what each stage contributes.

Scale shape: each stage's shuffles are documented at its operator; the
composition adds only id-keyed semi/anti joins between stages (the drop
sets are tiny relative to the corpus — broadcast-eligible, and Spark's
AQE converts them when the runtime sizes allow). The text column flows
through narrow projections only; nothing here collects.

The ``hasher`` switch exists for the correctness gate: ``xxhash64`` is
the engine default (JVM codegen, 64-bit); ``md5`` produces values DuckDB
can recompute verbatim so the full pipeline is oracle-checkable end to
end (q56) — same plan shape, portable hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.quality import gopher_repetition, redact_pii
from ..operators.dedup import (
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles_expr,
)


def _md5_candidate_pairs(
    docs: DataFrame,
    text_col: str,
    k: int,
    bands: int,
    max_bucket: int,
) -> DataFrame:
    """Portable MinHash+LSH: sig_i = min md5(f"{i}|{shingle}") (hex
    strings order lexicographically in both engines), band key =
    md5(concat of the band's rows). Same banded plan as
    lsh_candidate_pairs, different hash."""
    rows_per_band = k // bands
    sh = F.array_distinct(shingles_expr(F.col(text_col), 3))
    sigs = docs.select(
        F.col("id"),
        *[
            F.array_min(
                F.transform(
                    sh,
                    (lambda i: lambda s: F.md5(F.concat(F.lit(f"{i}|"), s)))(i),
                )
            ).alias(f"sig_{i}")
            for i in range(k)
        ],
    )
    band_keys = F.array(
        *[
            F.md5(
                F.concat(
                    *[
                        F.col(f"sig_{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ]
                )
            )
            for b in range(bands)
        ]
    )
    buckets = sigs.select("id", F.posexplode(band_keys).alias("band", "bucket"))
    small = (
        buckets.groupBy("band", "bucket")
        .agg(F.collect_list("id").alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    a = small.select("band", "bucket", F.explode("ids").alias("id_a"))
    b = small.select("band", "bucket", F.explode("ids").alias("id_b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def clean_corpus(
    df: DataFrame,
    text_col: str,
    id_col: str,
    benchmark: DataFrame | None = None,
    min_distinct_frac: float = 0.3,
    max_top2gram_frac: float = 0.20,
    minhash_k: int = 32,
    lsh_bands: int = 8,
    jaccard_threshold: float = 0.8,
    chunk_words: int = 10,
    min_kept_frac: float = 0.1,
    max_bucket: int = 64,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Returns the surviving documents as (id, text) where ``text`` is
    redacted + paragraph-deduplicated. Near-dup pairs keep the LOWER id
    (greedy pairwise drop — the standard approximation; a transitive
    union-find pass is a driver-side refinement the fixture-scale
    clusters don't need).
    """
    from ..operators.dedup import paragraph_dedup

    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))

    # 1. quality gate (metrics keyed by id; keep unflagged)
    good_ids = (
        gopher_repetition(base, "text", "id", min_distinct_frac, max_top2gram_frac)
        .filter(~F.col("flagged"))
        .select("id")
    )
    survivors = base.join(good_ids, "id", "left_semi")

    # 2. PII scrub
    red = survivors.select("id", redact_pii(F.col("text")).alias("text"))

    # 3. exact dedup: keep the min id of each identical text
    keep = red.groupBy(F.md5("text").alias("h")).agg(F.min("id").alias("id"))
    red = red.join(keep.select("id"), "id", "left_semi")

    # 4. fuzzy dedup
    if hasher == "md5":
        pairs = _md5_candidate_pairs(red, "text", 8, 4, max_bucket)
    else:
        sigs = minhash_signatures(red, "text", "id", k=minhash_k)
        pairs = lsh_candidate_pairs(
            sigs, bands=lsh_bands, rows_per_band=minhash_k // lsh_bands,
            max_bucket=max_bucket,
        )
    dup_b = (
        jaccard_verify(pairs, red, "text", "id", ngram=3,
                       threshold=jaccard_threshold)
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    red = red.join(dup_b, "id", "left_anti")

    # 5. corpus-wide paragraph dedup + recompose; drop hollowed-out docs
    para = paragraph_dedup(red, "text", "id", chunk_words=chunk_words)
    out = para.filter(F.col("kept_frac") >= min_kept_frac).select(
        "id", F.col("dedup_text").alias("text")
    )

    # 6. optional decontamination vs a benchmark set
    if benchmark is not None:
        from ..operators.dedup import ngram_contamination

        flags = ngram_contamination(out, benchmark, "text", "id", ngram=8)
        clean_ids = flags.filter(~F.col("contaminated")).select(
            F.col("id")
        )
        out = out.join(clean_ids, "id", "left_semi")

    return out

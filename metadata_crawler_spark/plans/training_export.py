"""Training-set export: the end-to-end path from a raw document corpus to
packed, sampled, token-budgeted training sequences — the composition a
pretraining data team runs AFTER cleaning:

    clean_corpus (RefinedWeb stages, plans/corpus_pipeline)
      -> optional exact-substring span dedup  (operators/dedup.span_dedup)
      -> optional DSIR importance resampling  (operators/sampling)
      -> optional domain temperature mix      (operators/sampling)
      -> token counting (learned BPE via operators/bpe, or whitespace)
      -> concat-and-chunk sequence packing    (operators/packing)
      -> parquet export + one-row packing summary

Everything inherits the component operators' scale shapes (documented at
each): the composition itself adds only id-keyed semi joins and narrow
projections; the single corpus-order dependence (packing offsets) uses
the two-phase prefix scan, never a global single-partition window.

Reference analog: the reference's end state is a queryable catalogue
(api/run.py ingest -> store); this engine's end state for the LLM
pipeline is the packed training table — same "pipeline ends in a
persisted, consumable artifact" contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.packing import pack_concat_chunk, packing_summary
from ..operators.sampling import (
    bernoulli_importance_sample,
    dsir_logratio,
    dsir_score,
    temperature_sample,
)


def export_training_set(
    df: DataFrame,
    text_col: str,
    id_col: str,
    out_dir: str | None = None,
    seq_len: int = 2048,
    clean_kwargs: dict | None = None,
    span_window: int | None = None,
    dsir_target: DataFrame | None = None,
    dsir_temperature: float = 1.0,
    dsir_center: float | None = None,
    dsir_n_buckets: int = 1 << 20,
    domain_map: DataFrame | None = None,
    domain_train: DataFrame | None = None,
    mix_alpha: float = 0.7,
    bpe_merges: list | None = None,
    seed: int = 0,
    hasher: str = "xxhash64",
    stage_counts: dict | None = None,
    out_format: str = "parquet",
) -> tuple[DataFrame, DataFrame]:
    """Run the full export; returns (packed_docs, summary).

    ``packed_docs`` columns: (id, text, n_tokens, start_tok, first_seq,
    last_seq, seq_offset, n_seqs_spanned) — the packing *plan*; a trainer
    materializes sequence tensors from it with one ordered scan.
    ``summary`` is the one-row (total_tokens, n_sequences, padding_frac).

    - ``clean_kwargs`` forwards to :func:`clean_corpus` (quality gates,
      dedup family, decontamination). ``{}`` runs its defaults; None
      skips cleaning entirely (pre-cleaned input).
    - ``span_window``: excise duplicated n-token spans corpus-wide
      (Lee et al. 2022) from the CLEANED text before counting.
    - ``dsir_target``: a small exemplar corpus; raw docs are thinned by
      deterministic Bernoulli importance sampling toward it.
      ``dsir_center`` defaults to the corpus median log-weight (one
      approxQuantile sketch — no sort/collect).
    - ``domain_map``: (id, domain) table; multinomial ``mix_alpha``
      temperature rebalancing after DSIR.
    - ``domain_train``: labeled (text, label) exemplar table — when no
      ``domain_map`` is supplied, the NB domain classifier
      (functions/quality.train_domain_classifier) trains on it and
      labels the cleaned corpus itself, closing the loop a mixing
      pipeline needs: raw crawl -> learned domain labels -> temperature
      rebalance, no hand-made map.
    - ``bpe_merges``: learned rules from :func:`train_bpe` — counts use
      the real tokenizer; None counts whitespace tokens (cheap proxy).
    - ``stage_counts``: same contract as clean_corpus — pass a dict to
      collect per-stage survivor counts (keys: the clean_corpus stages,
      then span_dedup / dsir / domain_mix as enabled).
    """
    from ..operators.common import checkpoint_observed

    def _stage(name: str, stage_df: DataFrame) -> DataFrame:
        if stage_counts is None:
            return stage_df
        out, n = checkpoint_observed(stage_df, F.count(F.lit(1)))
        stage_counts[name] = int(n)
        return out

    if clean_kwargs is not None:
        from .corpus_pipeline import clean_corpus

        docs = clean_corpus(
            df, text_col, id_col,
            hasher=hasher, stage_counts=stage_counts, **clean_kwargs,
        )
    else:
        docs = df.select(
            F.col(id_col).alias("id"), F.col(text_col).alias("text")
        )

    if span_window is not None:
        from ..operators.dedup import span_dedup

        docs = _stage(
            "span_dedup",
            span_dedup(docs, "text", "id", window_tokens=span_window)
            .filter(F.col("n_tokens") > F.col("n_removed"))
            .select("id", F.col("dedup_text").alias("text")),
        )

    if dsir_target is not None:
        lr = dsir_logratio(
            dsir_target, docs, "text", n_buckets=dsir_n_buckets, hasher=hasher
        )
        scored = dsir_score(
            docs, "text", lr, n_buckets=dsir_n_buckets, hasher=hasher
        )
        if dsir_center is None:
            # localCheckpoint, not persist(): the quantile sketch is an
            # action, so a bare persist would (a) recompute the whole
            # upstream pipeline again for the export pass and (b) stay
            # pinned in the cache for the session. The checkpoint
            # materializes scored exactly once, truncates lineage for
            # both consumers, and is released on GC.
            scored = scored.localCheckpoint()
            dsir_center = scored.approxQuantile("dsir_logw", [0.5], 0.001)[0]
        docs = _stage(
            "dsir",
            bernoulli_importance_sample(
                scored, "dsir_logw", "id",
                temperature=dsir_temperature, center=dsir_center,
                seed=seed, hasher=hasher,
            )
            .filter("keep")
            .select("id", "text"),
        )

    if domain_map is None and domain_train is not None:
        from ..functions.quality import (
            domain_classifier_scores,
            train_domain_classifier,
        )

        dw, dpriors, dunseen = train_domain_classifier(
            domain_train, "text", "label",
            n_buckets=dsir_n_buckets, hasher=hasher,
        )
        domain_map = domain_classifier_scores(
            docs, "text", dw, dpriors, dunseen,
            n_buckets=dsir_n_buckets, hasher=hasher,
        ).select("id", F.col("domain").cast("string").alias("domain"))

    if domain_map is not None:
        with_domain = docs.join(domain_map, "id", "left").fillna(
            {"domain": "unknown"}
        )
        docs = _stage(
            "domain_mix",
            temperature_sample(
                with_domain, "domain", "id", alpha=mix_alpha,
                seed=seed + 1, hasher=hasher,
            )
            .filter("keep")
            .select("id", "text"),
        )

    if bpe_merges is not None:
        from ..operators.bpe import bpe_encode

        counted = bpe_encode(docs, "text", bpe_merges).select(
            "id", "text", F.col("bpe_tokens_n").cast("long").alias("n_tokens")
        )
    else:
        # filter-after-split, the word_counts guard: Spark trim strips
        # only ASCII spaces, so tab/newline-padded text would count a
        # phantom '' token and corrupt every downstream packing offset;
        # coalesce keeps NULL text at 0 like the BPE branch
        toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
        counted = docs.select(
            "id", "text",
            F.coalesce(F.size(toks), F.lit(0)).cast("long").alias("n_tokens"),
        )

    packed = pack_concat_chunk(counted, "id", "n_tokens", seq_len)
    summary = packing_summary(packed, "n_tokens", seq_len)
    if out_dir is not None:
        if out_format == "jsonl":
            # interchange layout (HuggingFace/Dolma): *.jsonl.gz shards +
            # manifest; materializing the manifest IS the write action
            import glob as _glob

            from ..sources.jsonl_sink import write_jsonl_shards

            # deterministic shard names do NOT truncate the directory
            # like parquet overwrite does: a re-export with fewer
            # partitions would leave the old run's higher-numbered
            # shards on disk and the glob read-back would mix them in.
            # Scheme-qualified out_dirs get the same sweep through the
            # Hadoop FileSystem API (ADVICE r5 — os.path/glob on an
            # object-store URI silently matches nothing).
            if "://" not in out_dir:
                for old in _glob.glob(
                    os.path.join(out_dir, "*.jsonl*")
                ):
                    os.remove(old)
            else:
                spark = packed.sparkSession
                jvm = spark._jvm
                jdir = jvm.org.apache.hadoop.fs.Path(out_dir)
                fs = jdir.getFileSystem(spark._jsc.hadoopConfiguration())
                if fs.exists(jdir):
                    jglob = jvm.org.apache.hadoop.fs.Path(
                        out_dir.rstrip("/") + "/*.jsonl*"
                    )
                    for st in fs.globStatus(jglob) or []:
                        fs.delete(st.getPath(), False)
            # ONE execution of the side-effecting export plan (ADVICE
            # r5): write_jsonl_shards is a lazy mapInPandas plan, so a
            # count() before the manifest write would run the whole
            # shard export twice. Write the manifest parquet first (the
            # single action that performs the export), then derive
            # n_shards from the read-back.
            manifest = write_jsonl_shards(packed, out_dir)
            mpath = out_dir.rstrip("/") + "_manifest"
            manifest.write.mode("overwrite").parquet(mpath)
            n_shards = packed.sparkSession.read.parquet(mpath).count()
            packed = (
                packed.sparkSession.read.json(
                    out_dir.rstrip("/") + "/*.jsonl.gz"
                )
                if n_shards
                else packed.limit(0)
            )
        elif out_format == "parquet":
            packed.write.mode("overwrite").parquet(out_dir)
            packed = packed.sparkSession.read.parquet(out_dir)
        else:
            raise ValueError(f"unknown out_format {out_format!r}")
    return packed, summary

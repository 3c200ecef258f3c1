"""End-to-end training-set export: clean -> span dedup -> DSIR -> domain
mix -> BPE count -> pack, on a planted corpus."""

from __future__ import annotations

import os
import random

from pyspark.sql import functions as F

from metadata_crawler_spark.plans.training_export import export_training_set

WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
         "kilo lima mike november oscar papa quebec romeo sierra tango").split()


def _corpus(spark, n=80, seed=3):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        text = " ".join(rng.choice(WORDS) for _ in range(40))
        rows.append((i, text, "web" if i % 4 else "books"))
    # plant exact duplicates (die at exact dedup)
    for i in range(0, n, 10):
        rows.append((1000 + i, rows[i][1], "web"))
    return spark.createDataFrame(rows, ["doc_id", "text", "domain"])


def test_export_end_to_end(spark, tmp_path):
    df = _corpus(spark)
    target = df.filter("doc_id % 5 = 0").select("text")
    domains = df.select(F.col("doc_id").alias("id"), "domain")
    counts: dict = {}
    out = str(tmp_path / "packed")
    packed, summary = export_training_set(
        df, "text", "doc_id",
        out_dir=out,
        seq_len=64,
        clean_kwargs={},
        span_window=8,
        dsir_target=target,
        domain_map=domains,
        mix_alpha=0.5,
        seed=11,
        stage_counts=counts,
    )
    rows = sorted(packed.collect(), key=lambda r: r.id)
    assert rows, "pipeline must keep documents"
    # stage counts are monotone non-increasing along the pipeline
    order = [k for k in ("input", "quality_gate", "exact_dedup",
                         "fuzzy_dedup", "paragraph_dedup", "span_dedup",
                         "dsir", "domain_mix") if k in counts]
    vals = [counts[k] for k in order]
    assert vals == sorted(vals, reverse=True)
    assert counts["exact_dedup"] < counts["input"]  # planted dups died
    # packing plan is contiguous: start_tok == running sum in id order
    run = 0
    for r in rows:
        assert r.start_tok == run
        assert r.seq_offset == run % 64
        run += r.n_tokens
    s = summary.collect()[0]
    assert s.total_tokens == run
    assert s.n_sequences == -(-run // 64)
    assert os.path.isdir(out)  # parquet written
    # determinism: same seed -> same kept set
    packed2, _ = export_training_set(
        df, "text", "doc_id", seq_len=64, clean_kwargs={}, span_window=8,
        dsir_target=target, domain_map=domains, mix_alpha=0.5, seed=11,
    )
    assert sorted(r.id for r in packed2.collect()) == [r.id for r in rows]


def test_export_precleaned_with_bpe(spark):
    from metadata_crawler_spark.operators.bpe import train_bpe

    df = _corpus(spark, n=30).select("doc_id", "text")
    merges, _ = train_bpe(df, "text", num_merges=10)
    packed, summary = export_training_set(
        df, "text", "doc_id", seq_len=128,
        clean_kwargs=None, bpe_merges=merges,
    )
    rows = packed.collect()
    # no cleaning, no sampling -> all docs survive (30 + 3 planted dups)
    assert len(rows) == 33
    # BPE counts exceed word counts (sub-word units) for these texts
    wc = {r.doc_id: len(r.text.split()) for r in df.collect()}
    for r in rows:
        assert r.n_tokens >= wc[r.id]


def test_export_jsonl_format(spark, tmp_path):
    import glob as _glob

    from metadata_crawler_spark.plans.training_export import (
        export_training_set,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(40)],
        "doc_id long, body string",
    )
    out = str(tmp_path / "export_jsonl")
    packed, summary = export_training_set(
        docs, "body", "doc_id", out_dir=out, seq_len=8, out_format="jsonl"
    )
    shards = _glob.glob(out + "/*.jsonl.gz")
    assert shards
    assert packed.count() == 40  # read back through spark.read.json
    man = spark.read.parquet(out + "_manifest")
    assert man.agg({"n_rows": "sum"}).collect()[0][0] == 40


def test_export_auto_domain_labels_drive_mixing(spark):
    """domain_train exemplars -> learned NB labels -> temperature mix:
    a strongly skewed corpus (27 code docs, 3 news docs) flattens toward
    the rare domain under a small alpha, with no hand-made domain map."""
    from metadata_crawler_spark.plans.training_export import export_training_set

    code_words = "function variable compile debug pointer array loop syntax"
    news_words = "election parliament minister policy vote senate law bill"
    rows = []
    for i in range(30):
        words = (news_words if i < 3 else code_words).split()
        rows.append((i, " ".join(words[i % 5 :] + words[: i % 5]) + f" tail{i}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    train = spark.createDataFrame(
        [(0, code_words), (1, news_words)], "label int, text string"
    )
    counts = {}
    packed, _ = export_training_set(
        df, "text", "doc_id", seq_len=64, clean_kwargs=None,
        domain_train=train, mix_alpha=0.25, seed=3, stage_counts=counts,
    )
    kept = {r.id for r in packed.collect()}
    assert "domain_mix" in counts and counts["domain_mix"] == len(kept)
    news_kept = sum(1 for i in kept if i < 3)
    code_kept = len(kept) - news_kept
    # flattening: every rare-domain doc survives, the dominant domain
    # is thinned hard (expected keep ~ (p_i^alpha/Z)/p_i per domain)
    assert news_kept == 3
    assert code_kept < 20


def test_token_count_ignores_phantom_whitespace_tokens(spark):
    """Tab/newline-padded and NULL texts: n_tokens counts real words
    only (Spark trim strips ASCII spaces only, so the old
    split-after-trim emitted a phantom \'\'-token that shifted every
    packing offset downstream)."""
    docs = spark.createDataFrame(
        [
            (1, "\tfoo bar"),
            (2, "\n"),
            (3, None),
            (4, "one two  three"),
        ],
        "doc_id long, body string",
    )
    packed, _ = export_training_set(
        docs, "body", "doc_id", seq_len=4, clean_kwargs=None
    )
    got = {r.id: r.n_tokens for r in packed.select("id", "n_tokens").collect()}
    assert got[1] == 2
    assert got[4] == 3
    assert got.get(2, 0) in (0, None) or got[2] == 0
    assert all(v is not None for v in got.values())

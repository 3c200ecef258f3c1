"""Corpus-quality operator tests: paragraph dedup must drop exactly the
planted repeats (first occurrence survives, order-deterministic), Gopher
metrics must match hand-computed values, PII redaction must hit every
planted pattern and nothing else."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from metadata_crawler_spark.functions.quality import (
    gopher_repetition,
    pii_counts,
    redact_pii,
)
from metadata_crawler_spark.operators.dedup import paragraph_dedup

# ten-word chunks by construction: each letter block is exactly 10 words
A = " ".join(f"a{i}" for i in range(10))
B = " ".join(f"b{i}" for i in range(10))
C = " ".join(f"c{i}" for i in range(10))


@pytest.fixture(scope="module")
def pdocs(spark):
    rows = [
        (0, f"{A} {B}"),        # doc 0: A,B both first occurrences
        (1, f"{B} {C}"),        # doc 1: B is a repeat, C first
        (2, f"{A} {A}"),        # doc 2: both chunks repeats (A@0 too)
        (3, C),                 # doc 3: repeat of doc 1's C
        (4, "short tail"),      # doc 4: sub-width single chunk
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_paragraph_dedup_keeps_first_occurrence(pdocs):
    out = {
        r["id"]: r
        for r in paragraph_dedup(pdocs, "text", "doc_id").collect()
    }
    assert out[0]["n_chunks"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["dedup_text"] == f"{A} {B}"
    # doc 1: B already seen in doc 0
    assert out[1]["n_kept"] == 1 and out[1]["dedup_text"] == C
    # doc 2: A seen in doc 0, and its own second A is a within-doc repeat
    assert out[2]["n_kept"] == 0 and out[2]["dedup_text"] == ""
    assert out[2]["kept_frac"] == 0.0
    # doc 3: C seen in doc 1
    assert out[3]["n_kept"] == 0
    # doc 4: unique sub-width chunk survives whole
    assert out[4]["n_chunks"] == 1 and out[4]["dedup_text"] == "short tail"


def test_paragraph_dedup_order_determinism(spark, pdocs):
    """First occurrence = min (id, pos), not partition order: reversing
    the input rows must give the identical result."""
    rev = pdocs.orderBy(F.desc("doc_id")).repartition(7)
    a = sorted(paragraph_dedup(pdocs, "text", "doc_id").collect())
    b = sorted(paragraph_dedup(rev, "text", "doc_id").collect())
    assert a == b


def test_gopher_metrics_hand_computed(spark):
    # "x y x y x" : n=5, chars=5, distinct 2/5, top bigram "x y" count 2
    # covering 2*2=4 chars of 5
    df = spark.createDataFrame([(1, "x y x y x")], "doc_id long, text string")
    r = gopher_repetition(df, "text", "doc_id").collect()[0]
    assert r["n_words"] == 5
    assert r["mean_word_len"] == 1.0
    assert r["distinct_frac"] == 0.4
    assert r["dup_chunk_frac"] == 0.0  # 5 tokens -> one chunk
    assert r["top2gram_char_frac"] == 0.8
    assert bool(r["flagged"]) is True  # 0.8 > 0.20


def test_gopher_dup_chunk_frac(spark):
    """Doc of two identical 10-token chunks -> half its chunks repeat."""
    df = spark.createDataFrame(
        [(1, f"{A} {A}")], "doc_id long, text string"
    )
    r = gopher_repetition(df, "text", "doc_id").collect()[0]
    assert r["dup_chunk_frac"] == 0.5


def test_gopher_single_word_doc(spark):
    df = spark.createDataFrame([(1, "lonely")], "doc_id long, text string")
    r = gopher_repetition(df, "text", "doc_id").collect()[0]
    assert r["n_words"] == 1 and r["top2gram_char_frac"] == 0.0
    assert bool(r["flagged"]) is False


def test_gopher_empty_doc_concrete_flag(spark):
    """ADVICE r3: n_chars=0 docs used to get NULL top2gram_char_frac and
    NULL flagged (silently dropped by filter(~flagged)); the flag must be
    a concrete boolean for every row."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "ok text here")],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in gopher_repetition(df, "text", "doc_id").collect()}
    for i in (1, 2):
        assert rows[i]["top2gram_char_frac"] == 0.0
        assert rows[i]["flagged"] is not None
    # empty docs still flag on distinct_frac semantics of their own row;
    # what matters is the flag is concrete so ~flagged keeps or drops
    # deterministically on both engines
    assert all(r["flagged"] is not None for r in rows.values())


def test_pii_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.co.uk or x@y.io and call +1-555-000-1234"),
            (2, "no pii here, not even at-signs @ alone or +1-555-123"),
        ],
        "doc_id long, text string",
    )
    ne, np_ = pii_counts(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            ne.alias("e"),
            np_.alias("p"),
            redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert out[1]["e"] == 2 and out[1]["p"] == 1
    assert out[1]["red"] == "mail <EMAIL> or <EMAIL> and call <PHONE>"
    assert out[2]["e"] == 0 and out[2]["p"] == 0
    assert out[2]["red"] == "no pii here, not even at-signs @ alone or +1-555-123"


def test_unigram_crossentropy_hand_computed(spark):
    """Corpus: doc1 'a a b', doc2 'a'. p(a)=3/4, p(b)=1/4.
    doc1 xent = (2*2-log2(3) + 2) / 3 ... computed exactly below."""
    import math

    from metadata_crawler_spark.functions.quality import unigram_crossentropy

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a")], "doc_id long, text string"
    )
    out = {
        r["id"]: r
        for r in unigram_crossentropy(df, "text", "doc_id").collect()
    }
    la = -math.log2(3 / 4)
    lb = -math.log2(1 / 4)
    assert out[1]["n_tokens"] == 3
    assert abs(out[1]["xent"] - round((2 * la + lb) / 3, 6)) < 1e-9
    assert out[2]["n_tokens"] == 1
    assert abs(out[2]["xent"] - round(la, 6)) < 1e-9


def test_unigram_crossentropy_shuffle_join_path(spark):
    """vocab_broadcast=False (the 100 TB vocab path) must agree with the
    broadcast path exactly."""
    from metadata_crawler_spark.functions.quality import unigram_crossentropy

    df = spark.createDataFrame(
        [(i, f"w{i % 5} w{i % 3} common") for i in range(30)],
        "doc_id long, text string",
    )
    a = sorted(unigram_crossentropy(df, "text", "doc_id", True).collect())
    b = sorted(unigram_crossentropy(df, "text", "doc_id", False).collect())
    assert a == b


def test_clean_corpus_stage_attribution(spark):
    """Each planted victim dies at its intended stage (engine hasher):
    low-distinct doc at the quality gate, exact copy at exact dedup,
    one-word-changed copy at fuzzy dedup, chunk-subset doc hollowed out
    by paragraph dedup; survivors carry redacted, recomposed text."""
    from metadata_crawler_spark.plans.corpus_pipeline import clean_corpus

    base_words = [f"tok{i}word" for i in range(40)]
    base = " ".join(base_words)
    near = " ".join(
        w if i != 20 else "CHANGED" for i, w in enumerate(base_words)
    )
    rows = [
        (0, base),
        (1, base),                          # exact copy -> exact dedup
        (2, near),                          # near copy -> fuzzy dedup
        (3, " ".join(["spam"] * 30)),       # low distinct -> quality gate
        # long enough that the single email bigram stays under the 0.20
        # top-2-gram char threshold (Gopher flags short docs aggressively)
        (4, "write to someone@example.org about "
            + " ".join(f"u{i}q" for i in range(40))),
        (5, " ".join(base_words[:20])),     # chunk subset -> hollowed
        (6, " ".join(f"z{i}x" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r["text"] for r in
           clean_corpus(df, "text", "doc_id").collect()}
    assert set(out) == {0, 4, 6}
    assert out[0] == base
    assert "<EMAIL>" in out[4] and "someone@example.org" not in out[4]

    # decontamination: a benchmark sharing doc 6's 8-grams removes doc 6
    bench = spark.createDataFrame(
        [(" ".join(f"z{i}x" for i in range(30)),)], "text string"
    )
    out2 = {r["id"] for r in
            clean_corpus(df, "text", "doc_id", benchmark=bench).collect()}
    assert out2 == {0, 4}


def test_clean_corpus_host_boilerplate_stage(spark):
    """With host_col set, each host's template chunk is stripped before
    the dedup stages (so two docs of one host sharing ONLY the template
    are not fuzzy-dup victims), stage_counts records the boundary, and
    the default path (host_col=None) is unchanged."""
    from metadata_crawler_spark.plans.corpus_pipeline import clean_corpus

    tpl = " ".join(f"nav{i}bar" for i in range(10))  # one 10-word chunk
    rows = [
        (0, "h1", f"{tpl} " + " ".join(f"a{i}w" for i in range(30))),
        (1, "h1", f"{tpl} " + " ".join(f"b{i}w" for i in range(30))),
        (2, "h1", f"{tpl} " + " ".join(f"c{i}w" for i in range(30))),
        (3, "h2", f"{tpl} " + " ".join(f"d{i}w" for i in range(30))),
        (4, "h2", " ".join(f"e{i}w" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    counts: dict = {}
    out = {
        r["id"]: r["text"]
        for r in clean_corpus(
            df, "text", "doc_id", host_col="host", stage_counts=counts
        ).collect()
    }
    # all five docs survive; h1 docs lost the template, h2's single-doc
    # template occurrence (1/2 docs < min_docs=2) survives there
    assert set(out) == {0, 1, 2, 3, 4}
    assert all("nav0bar" not in out[i] for i in (0, 1, 2))
    assert "nav0bar" in out[3]
    stages = list(counts)
    assert "host_boilerplate" in stages
    assert stages.index("quality_gate") < stages.index("host_boilerplate")
    assert stages.index("host_boilerplate") < stages.index("exact_dedup")
    assert counts["host_boilerplate"] == 5
    # default path ignores the host column entirely — the template is
    # then handled by CORPUS-WIDE paragraph dedup instead: keep-first
    # (doc 0 retains its occurrence, later docs lose it) rather than the
    # host stage's all-occurrence removal (docs 0-2 all lost it above)
    base = {
        r["id"]: r["text"]
        for r in clean_corpus(df, "text", "doc_id").collect()
    }
    assert set(base) == {0, 1, 2, 3, 4}
    assert "nav0bar" in base[0]
    assert all("nav0bar" not in base[i] for i in (1, 2, 3))


def test_clean_corpus_plan_no_cartesian(spark):
    """The composed pipeline must stay equi-join only — candidate
    generation is banded buckets, never an all-pairs product (both
    hasher paths)."""
    from metadata_crawler_spark.plans.corpus_pipeline import clean_corpus

    df = spark.createDataFrame(
        [(i, " ".join(f"w{i}t{j}" for j in range(25))) for i in range(50)],
        "doc_id long, text string",
    )
    for hasher in ("xxhash64", "md5"):
        plan = clean_corpus(
            df, "text", "doc_id", hasher=hasher
        )._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "CartesianProduct" not in plan, hasher
        assert "BroadcastNestedLoopJoin" not in plan, hasher


def test_paragraph_dedup_hash_only_identical(spark, pdocs):
    """VERDICT r3 item 6: the hash-only plan (keep decision over 24-byte
    (id, pos, hash) rows + text re-join) must produce exactly the
    default path's result, on the planted fixture AND on wide docs."""
    a = sorted(paragraph_dedup(pdocs, "text", "doc_id").collect())
    b = sorted(
        paragraph_dedup(pdocs, "text", "doc_id", hash_only=True).collect()
    )
    assert a == b
    wide = spark.range(200).selectExpr(
        "id AS doc_id",
        # overlapping chunk windows -> plenty of cross-doc repeats
        "concat_ws(' ', transform(sequence(0, 39), "
        "i -> concat('w', (id % 17) * 10 + i))) AS text",
    )
    c = sorted(paragraph_dedup(wide, "text", "doc_id").collect())
    d = sorted(
        paragraph_dedup(wide, "text", "doc_id", hash_only=True).collect()
    )
    assert c == d


def test_host_boilerplate_dedup_per_host_thresholds(spark):
    """Site-template removal: a chunk in >= min_pct% (and >= min_docs) of
    ONE host's docs is removed from every doc of THAT host only — the
    same chunk on another host below threshold survives there; removal is
    all-occurrences (not keep-first)."""
    from metadata_crawler_spark.operators.dedup import host_boilerplate_dedup

    T = " ".join(f"t{i}" for i in range(10))  # h1 template (3/4 docs)
    U = " ".join(f"u{i}" for i in range(10))  # h1 edge case (2/4 = 50%)
    V = " ".join(f"v{i}" for i in range(10))  # singleton (1/4 docs)
    rows = [
        (0, "h1", f"{T} {U} {V}"),
        (1, "h1", f"{T} {U}"),
        (2, "h1", T),
        (3, "h1", A),
        (4, "h2", f"{T} {B}"),  # T on h2: 1/2 docs < min_docs=2 -> kept
        (5, "h2", C),
    ]
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    out = {
        r["id"]: r
        for r in host_boilerplate_dedup(
            df, "text", "doc_id", "host", min_docs=2, min_pct=50
        ).collect()
    }
    # h1: T (3/4 = 75%) and U (2/4 = exactly 50%, >= threshold) are
    # templates; V and A are not.
    assert out[0]["n_chunks"] == 3 and out[0]["n_boiler"] == 2
    assert out[0]["clean_text"] == V
    assert out[1]["clean_text"] == ""
    assert out[2]["clean_text"] == "" and out[2]["boiler_frac"] == 1.0
    assert out[3]["clean_text"] == A
    # h2: T survives there (per-host independence), docs untouched
    assert out[4]["clean_text"] == f"{T} {B}"
    assert out[5]["clean_text"] == C
    assert out[4]["host"] == "h2" and out[4]["n_boiler"] == 0


def test_host_boilerplate_dedup_paths_and_partitioning(spark):
    """Broadcast-marked and hash-key-join paths must agree, and the
    result must be invariant to input partitioning."""
    from metadata_crawler_spark.operators.dedup import host_boilerplate_dedup

    docs = spark.range(120).selectExpr(
        "id AS doc_id",
        "concat('h', id % 7) AS host",
        # every host shares a 10-word template block; the rest is unique
        "concat_ws(' ', transform(sequence(0, 9), "
        "  i -> concat('tpl', id % 7, '_', i)), "
        "  transform(sequence(0, 9), i -> concat('u', id, '_', i))) AS text",
    )
    bc = sorted(
        host_boilerplate_dedup(
            docs, "text", "doc_id", "host", boiler_broadcast=True
        ).collect()
    )
    sj = sorted(
        host_boilerplate_dedup(
            docs, "text", "doc_id", "host", boiler_broadcast=False
        ).collect()
    )
    assert bc == sj
    # every doc lost exactly its host template chunk, kept its unique one
    assert all(r["n_chunks"] == 2 and r["n_boiler"] == 1 for r in bc)
    re_part = sorted(
        host_boilerplate_dedup(
            docs.repartition(13), "text", "doc_id", "host"
        ).collect()
    )
    assert bc == re_part


def test_paragraph_dedup_hash_only_plan_sheds_text(spark, pdocs):
    """Plan assert: in the hash-only path the window-stage exchange
    (hashpartitioning on the chunk hash) must NOT carry the paragraph
    text — only id/pos/hash ride the keep-decision shuffle."""
    import re

    def _fmt(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    plan = _fmt(paragraph_dedup(pdocs, "text", "doc_id", hash_only=True))
    # every Exchange block that partitions on the hash column h must list
    # an Input free of 'chunk'
    blocks = re.findall(
        r"\(\d+\) Exchange[^\n]*\nInput \[\d+\]: \[([^\]]*)\]", plan
    )
    hash_exchanges = [
        b for b in blocks if re.search(r"\bh#\d+", b) and "id#" in b
    ]
    assert hash_exchanges, f"no window exchange found in plan:\n{plan[:2000]}"
    for b in hash_exchanges:
        assert "chunk" not in b, f"text rides the keep-decision shuffle: {b}"
    # and the DEFAULT path demonstrably does carry text there (the trade
    # the flag exists to remove)
    plan_default = _fmt(paragraph_dedup(pdocs, "text", "doc_id"))
    blocks_d = re.findall(
        r"\(\d+\) Exchange[^\n]*\nInput \[\d+\]: \[([^\]]*)\]", plan_default
    )
    assert any("chunk" in b for b in blocks_d)


def test_q56_hot_bucket_cap_does_not_bite(spark):
    """q56 now runs clean_corpus with the PRODUCTION hot-bucket cap
    (max_bucket=64) against an uncapped DuckDB oracle; that is only valid
    while no LSH bucket on the oracle corpus exceeds the cap. Pin the
    equivalence here so a fixture change that makes the cap bite fails a
    test, not the driver gate."""
    from metadata_crawler_spark.plans.corpus_pipeline import clean_corpus

    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    corpus = d.unionByName(
        d.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat("text", F.lit(" extraword")).alias("text"),
        )
    ).unionByName(
        d.filter(F.col("doc_id") % 9 == 0).select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
        )
    )
    kw = dict(hasher="md5", minhash_k=8, lsh_bands=4)
    capped = {r["id"] for r in
              clean_corpus(corpus, "text", "doc_id", max_bucket=64, **kw).collect()}
    uncapped = {r["id"] for r in
                clean_corpus(corpus, "text", "doc_id", max_bucket=10**6, **kw).collect()}
    assert capped == uncapped


def _planted_quality_corpus(spark, n_train=40, n_test=10):
    """Deterministic high/low-quality docs: 'high' is varied English-ish
    prose sharing a stop-word-rich vocabulary; 'low' is repetitive spam
    with its own token family. Train/test split by id."""
    rows = []
    for i in range(n_train + n_test):
        good = (
            f"the quick report number {i} describes results and methods "
            f"that have been carefully written with clear prose about "
            f"topic{i % 7} and the findings of study {i}"
        )
        # distinct tokens per doc (passes the Gopher repetition gate) but
        # a spam vocabulary the classifier learns to reject
        bad = (
            f"buy cheap pills now {i} " + " ".join(
                f"click{j} here{j} winner{j} free{j} offer{j}"
                for j in range(6)
            )
        )
        rows.append((2 * i, good, 1))
        rows.append((2 * i + 1, bad, 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    split = 2 * n_train
    return df.filter(F.col("doc_id") < split), df.filter(
        F.col("doc_id") >= split
    )


def test_quality_classifier_separates_planted_docs(spark):
    """VERDICT r4 item 1: hashed-ngram log-odds classifier trained on
    planted high/low-quality docs must rank every HELD-OUT high doc above
    every held-out low doc (scores split around 0.5)."""
    from metadata_crawler_spark.functions.quality import (
        quality_classifier_score,
        train_quality_classifier,
    )

    train, test = _planted_quality_corpus(spark)
    B = 1 << 14
    weights, bias = train_quality_classifier(
        train, "text", "label", n_buckets=B
    )
    scored = quality_classifier_score(
        test, "text", weights, n_buckets=B, bias=0.0
    ).select("doc_id", "label", "clf_score").collect()
    hi = [r["clf_score"] for r in scored if r["label"] == 1]
    lo = [r["clf_score"] for r in scored if r["label"] == 0]
    assert len(hi) == 10 and len(lo) == 10
    assert min(hi) > max(lo)
    assert min(hi) > 0.5 > max(lo)


def test_quality_classifier_zero_shuffle_plan(spark):
    """The scoring path is the 100 TB path: feature hashing JVM-side, one
    ArrowEvalPython for the broadcast-weights gather, and NO Exchange —
    the corpus never shuffles to be scored."""
    import numpy as np

    from metadata_crawler_spark.functions.quality import (
        quality_classifier_score,
    )

    df = spark.createDataFrame(
        [(1, "some text here"), (2, "more words")], "doc_id long, text string"
    )
    B = 1 << 10
    out = quality_classifier_score(
        df, "text", np.zeros(B), n_buckets=B
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1
    # empty doc scores sigmoid(bias)=0.5 under zero weights, not NULL
    empty = quality_classifier_score(
        spark.createDataFrame([(3, "")], "doc_id long, text string"),
        "text", np.zeros(B), n_buckets=B,
    ).first()
    assert abs(empty["clf_score"] - 0.5) < 1e-12


def test_clean_corpus_clf_gate_and_stage_counts(spark):
    """VERDICT r4 items 1+4 together: the classifier gate drops planted
    low-quality docs inside clean_corpus, and stage_counts reports
    per-stage attrition that equals independently computed stage diffs."""
    from metadata_crawler_spark.functions.quality import (
        train_quality_classifier,
    )
    from metadata_crawler_spark.plans.corpus_pipeline import clean_corpus

    train, test = _planted_quality_corpus(spark)
    B = 1 << 14
    weights, _ = train_quality_classifier(train, "text", "label", n_buckets=B)
    # corpus: held-out docs + one exact duplicate of a good doc
    good0 = test.filter(F.col("label") == 1).limit(1).first()
    corpus = test.select("doc_id", "text").unionByName(
        spark.createDataFrame(
            [(9000, good0["text"])], "doc_id long, text string"
        )
    )
    counts: dict = {}
    out = clean_corpus(
        corpus, "text", "doc_id",
        clf_weights=weights, clf_n_buckets=B, clf_threshold=0.5,
        stage_counts=counts,
    )
    kept = {r["id"] for r in out.collect()}
    # every low-quality doc died at the clf gate; the duplicate died at
    # exact dedup (9000 > good0 id)
    low_ids = {r["doc_id"] for r in test.filter(F.col("label") == 0).collect()}
    assert kept.isdisjoint(low_ids)
    assert 9000 not in kept and good0["doc_id"] in kept
    # counters: input=21, clf gate dropped the 10 low docs, exact dedup
    # dropped the 1 duplicate; later stages dropped nothing
    assert counts["input"] == 21
    assert counts["quality_gate"] == 21  # varied prose passes Gopher
    assert counts["clf_gate"] == 11
    assert counts["exact_dedup"] == 10
    assert counts["fuzzy_dedup"] == 10
    assert counts["paragraph_dedup"] == len(kept) == 10


def test_clean_corpus_clf_top_fraction(spark):
    """DCLM-style selection: clf_keep_frac keeps the top fraction of the
    corpus by classifier score — here exactly the high-quality half."""
    from metadata_crawler_spark.functions.quality import (
        train_quality_classifier,
    )
    from metadata_crawler_spark.plans.corpus_pipeline import clean_corpus

    train, test = _planted_quality_corpus(spark)
    B = 1 << 14
    weights, _ = train_quality_classifier(train, "text", "label", n_buckets=B)
    counts: dict = {}
    # keep_frac 0.45: the (1-frac)=0.55 quantile lands on the LOWEST
    # high-quality score (11th of 20 ascending), so the inclusive >= cut
    # keeps exactly the good half — 0.5 would sit on the highest bad doc
    # and keep 11 (quantile cuts are at sample values, not between them)
    out = clean_corpus(
        test.select("doc_id", "text"), "text", "doc_id",
        clf_weights=weights, clf_n_buckets=B, clf_keep_frac=0.45,
        stage_counts=counts,
    )
    kept = {r["id"] for r in out.collect()}
    good = {r["doc_id"] for r in test.filter(F.col("label") == 1).collect()}
    assert kept == good
    assert counts["clf_gate"] == 10


def test_gopher_quality_flags_hand_computed(spark):
    """Each quality rule trips on exactly its planted victim; a normal
    English-looking doc (with stop words) trips none."""
    from metadata_crawler_spark.functions.quality import gopher_quality_flags

    ok_doc = "the quick brown fox jumps over that lazy dog and then " + \
        " ".join(f"word{i}" for i in range(45))
    rows = [
        (1, ok_doc),
        (2, "too short with the and that"),                    # < 50 words
        (3, " ".join(["a"] * 60) + " the of and that be"),     # mean len < 3
        (4, " ".join(f"w{i} #" for i in range(30)) + " the of that"),  # symbols
        (5, " ".join(["12345"] * 60) + " the of and that"),    # low alpha
        (6, " ".join(f"blandword{i}" for i in range(60))),     # no stop words
        (7, ""),                                               # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["q"]
        for r in df.select(
            "doc_id", gopher_quality_flags(F.col("text")).alias("q")
        ).collect()
    }
    assert not got[1]["flagged"], got[1]
    assert got[2]["bad_word_count"]
    assert got[3]["bad_mean_word_len"]
    assert got[4]["high_symbol_ratio"]
    assert got[5]["low_alpha_frac"]
    assert got[6]["low_stopwords"]
    for i in (2, 3, 4, 5, 6):
        assert got[i]["flagged"]
    # empty doc: concrete flag, never NULL (same contract as repetition)
    assert got[7]["flagged"] is True
    # ADVICE r4: split(trim(''), '\s+') yields [""] — n_words must still
    # report 0 (not 1) for empty and whitespace-only docs
    assert got[7]["n_words"] == 0
    ws = spark.createDataFrame([(8, "   \t\n  ")], "doc_id long, text string")
    r8 = ws.select(gopher_quality_flags(F.col("text")).alias("q")).first()["q"]
    assert r8["n_words"] == 0 and r8["flagged"] is True


def test_quality_classifier_null_text_scores_bias(spark):
    """NULL text must score sigmoid(bias) like an empty doc — not raise
    TypeError inside the Arrow batch (code-review r5 finding)."""
    import numpy as np

    from metadata_crawler_spark.functions.quality import (
        quality_classifier_score,
    )

    B = 1 << 10
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "some words here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["clf_score"] for r in quality_classifier_score(
        df, "text", np.zeros(B), n_buckets=B
    ).collect()}
    assert abs(got[1] - 0.5) < 1e-12
    assert abs(got[2] - 0.5) < 1e-12
    assert got[3] is not None


def test_line_quality_metrics_hand_computed(spark):
    """RefinedWeb line-wise correction: planted shouting / numeric /
    social-counter / short-stub lines drive the fracs exactly."""
    from metadata_crawler_spark.functions.quality import (
        line_quality_metrics,
    )

    shout = "THIS IS AN ALL CAPS SHOUTING LINE THAT KEEPS GOING"
    numeric = "123 456.78 %"
    counter = "42 likes"
    stub = "Home"
    prose = "a perfectly ordinary line of prose long enough to survive"
    doc1 = "\n".join([shout, numeric, counter, stub, prose])
    doc0 = "\n".join([prose, "another calm and unremarkable line of text"])
    rows = [(0, doc0), (1, doc1), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["id"]: r
        for r in line_quality_metrics(df, "text", "doc_id").collect()
    }

    assert out[0]["n_lines"] == 2
    assert out[0]["removed_char_frac"] == 0.0
    assert out[0]["line_flagged"] is False

    r1 = out[1]
    assert r1["n_lines"] == 5
    assert r1["frac_upper_lines"] == 0.2
    assert r1["frac_numeric_lines"] == 0.2
    # counter (len 8) and stub (len 4) are both <= 10 chars
    assert r1["frac_short_lines"] == 0.4
    removed = [shout, numeric, counter, stub]
    want = round(
        sum(len(x) for x in removed)
        / sum(len(x) for x in removed + [prose]),
        6,
    )
    assert r1["removed_char_frac"] == want
    assert r1["line_flagged"] is True

    # empty doc: zero lines, concrete zeros, NOT flagged and NOT NULL
    assert out[2]["n_lines"] == 0
    assert out[2]["removed_char_frac"] == 0.0
    assert out[2]["line_flagged"] is False


def test_line_quality_metrics_pseudo_line_fallback(spark):
    """Newline-free text falls back to 10-word pseudo-lines (the fixture
    corpus shape): a 20-word doc yields 2 lines."""
    from metadata_crawler_spark.functions.quality import (
        line_quality_metrics,
    )

    words = " ".join(f"w{i:02d}" for i in range(20))
    df = spark.createDataFrame([(0, words)], "doc_id long, text string")
    r = line_quality_metrics(df, "text", "doc_id").first()
    assert r["n_lines"] == 2
    # pseudo-lines are 10 x 4-char words + 9 spaces = 49 chars: not short
    assert r["frac_short_lines"] == 0.0


def test_line_quality_metrics_append_zero_shuffle(spark):
    """append=True keeps every input column, adds the six metric
    columns, and stays a pure projection — no Exchange in the plan."""
    from metadata_crawler_spark.functions.quality import (
        line_quality_metrics,
    )

    df = spark.createDataFrame(
        [(1, "some text", "k")], "doc_id long, text string, keep string"
    )
    out = line_quality_metrics(df, "text", "doc_id", append=True)
    assert set(df.columns) <= set(out.columns)
    assert "removed_char_frac" in out.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert out.first()["keep"] == "k"


def test_clean_corpus_semdedup_stage(spark):
    """The optional SemDeDup stage drops the centroid-nearest member of
    an embedding duplicate pair among SURVIVORS; docs without a vector
    and docs whose twin already died upstream pass through."""
    import numpy as np

    from metadata_crawler_spark.plans.corpus_pipeline import clean_corpus

    def doc(seed):
        return " ".join(f"s{seed}w{i}" for i in range(30))

    rows = [(i, doc(i)) for i in range(4)]
    rows.append((4, doc(0)))  # exact copy of doc 0 -> dies at exact dedup
    df = spark.createDataFrame(rows, "doc_id long, text string")

    e = np.eye(4)
    C = np.stack([e[0], e[1]])
    emb = spark.createDataFrame(
        [
            (0, e[0].tolist()),                       # cluster 0, cent_sim 1.0
            (1, (0.98 * e[0] + 0.2 * e[2]).tolist()),  # dup pair with 0
            (2, e[1].tolist()),                        # cluster 1 singleton
            # doc 4's vector duplicates doc 0's — but doc 4 is already
            # dead (exact dedup), so it must NOT influence the clusters
            (4, e[0].tolist()),
            # doc 3 has no vector at all
        ],
        "id long, vec array<double>",
    )
    counts: dict = {}
    out = {
        r["id"]
        for r in clean_corpus(
            df, "text", "doc_id",
            embeddings=emb, semdedup_centroids=C, semdedup_eps=0.9,
            stage_counts=counts,
        ).collect()
    }
    # doc 0 (cent_sim 1.0, the prototypical copy) is the semantic dup;
    # doc 1 survives, as do the vectorless doc 3 and singleton doc 2
    assert out == {1, 2, 3}
    assert counts["fuzzy_dedup"] == 4
    assert counts["semdedup"] == 3


def test_clean_corpus_lang_gate(spark):
    """The optional language gate drops off-language docs FIRST and
    stage_counts records the attrition; default-off leaves the plan
    untouched (same survivors as without the args)."""
    from metadata_crawler_spark.functions.langid import train_lang_profiles
    from metadata_crawler_spark.plans.corpus_pipeline import clean_corpus

    en = "the quick brown fox jumps over a lazy dog while birds sing in trees"
    de = "der hund und die katze sind in dem haus mit ihnen und den voegeln"
    docs = [(i, en + f" extra word number {i} appended here uniquely") for i in range(8)]
    docs += [(100, de + " eins"), (101, de + " zwei")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    labeled = spark.createDataFrame(
        [("en", en), ("de", de)], "lang string, text string"
    )
    profiles = train_lang_profiles(labeled, top_n=100)
    counts = {}
    out = clean_corpus(
        df, "text", "doc_id",
        lang_profiles=profiles, lang_keep={"en"},
        stage_counts=counts,
    )
    ids = {r["id"] for r in out.collect()}
    assert ids and ids.isdisjoint({100, 101})
    assert counts["input"] == 10 and counts["lang_gate"] == 8
    # default off: german docs reach the later stages (101 still dies
    # there — to FUZZY dedup against 100, not to any language gate)
    base = {r["id"] for r in clean_corpus(df, "text", "doc_id").collect()}
    assert 100 in base and 101 not in base


def test_compression_ratio_band(spark):
    """Repetitive text compresses hard (low ratio), high-entropy junk
    doesn't (high ratio), prose sits between; flags band-pass; NULL/empty
    neutral; map-side only."""
    import random
    import string

    from pyspark.sql import functions as F

    from metadata_crawler_spark.functions.quality import compressibility_band

    rng = random.Random(7)
    junk = "".join(rng.choice(string.ascii_letters + string.digits) for _ in range(4000))
    # prose stand-in with realistic entropy (~0.38): random draws from a
    # 1000-word vocabulary — a repeated real sentence would itself be
    # (correctly!) flagged as too_repetitive
    vocab = [f"w{chr(97 + i % 26)}{chr(97 + (i * 7) % 26)}{i % 100}" for i in range(1000)]
    prose = " ".join(rng.choice(vocab) for _ in range(500))
    rep = "spam " * 800
    df = spark.createDataFrame(
        [(1, rep), (2, prose), (3, junk), (4, None), (5, "")],
        "id long, text string",
    )
    out = {
        r["id"]: r["b"]
        for r in df.select("id", compressibility_band(F.col("text")).alias("b")).collect()
    }
    assert out[1]["compression_ratio"] < out[2]["compression_ratio"] < out[3]["compression_ratio"]
    assert out[1]["too_repetitive"] and not out[1]["too_random"]
    assert out[3]["too_random"] and not out[3]["too_repetitive"]
    assert not out[2]["too_repetitive"] and not out[2]["too_random"]
    assert out[4]["compression_ratio"] == 1.0 and out[5]["compression_ratio"] == 1.0
    plan = (
        df.select(compressibility_band(F.col("text")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# bigram Stupid-Backoff cross-entropy
# ---------------------------------------------------------------------------


def _sb_reference(docs, train=None, alpha=0.4):
    """Pure-Python Stupid Backoff over whitespace tokens."""
    import math
    from collections import Counter

    train = train if train is not None else docs
    uni, bi = Counter(), Counter()
    for _, t in train:
        ws = t.split()
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    total, v = sum(uni.values()), len(uni)
    out = {}
    for did, t in docs:
        ws = t.split()
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            out[did] = (0, None)
            continue
        xs = []
        for w1, w2 in pairs:
            if bi.get((w1, w2), 0) > 0 and uni.get(w1, 0) > 0:
                s = bi[(w1, w2)] / uni[w1]
            else:
                s = alpha * (uni.get(w2, 0) + 1) / (total + v)
            xs.append(-math.log2(s))
        out[did] = (len(pairs), round(sum(xs) / len(xs), 6))
    return out


def test_bigram_crossentropy_hand_computed(spark):
    from metadata_crawler_spark.functions.quality import bigram_crossentropy

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the cat"),
        (3, "zebra quark flux the cat"),
        (4, "solo"),            # <2 tokens -> n_bigrams 0, xent2 NULL
        (5, ""),                # empty
        (6, "the the the the"),  # maximally predictable repeat
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.id: (r.n_bigrams, r.xent2)
        for r in bigram_crossentropy(df, "text", "doc_id").collect()
    }
    want = _sb_reference(docs)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        if want[k][1] is None:
            assert got[k][1] is None, k
        else:
            assert abs(got[k][1] - want[k][1]) < 1e-6, k
    # self-corpus caveat: singleton bigrams are perfectly predictable
    # (count 1 / context 1), so rare-word docs score LOW here — the
    # word-order separation claim is asserted under a held-out model in
    # test_bigram_crossentropy_heldout_model instead.


def test_bigram_crossentropy_heldout_model(spark):
    from metadata_crawler_spark.functions.quality import bigram_crossentropy

    train = [(100, "alpha beta gamma alpha beta"), (101, "beta gamma delta")]
    docs = [(1, "alpha beta gamma"), (2, "omega omega alpha")]  # omega unseen
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.id: (r.n_bigrams, r.xent2)
        for r in bigram_crossentropy(ddf, "text", "doc_id", train_df=tdf).collect()
    }
    want = _sb_reference(docs, train=train)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6
    # word order matters under a held-out model: a doc whose bigram the
    # model SAW scores lower cross-entropy than its scramble (identical
    # unigram distribution -> invisible to unigram_crossentropy)
    pair = spark.createDataFrame(
        [(10, "alpha beta"), (11, "beta alpha")], "doc_id long, text string"
    )
    g2 = {
        r.id: r.xent2
        for r in bigram_crossentropy(pair, "text", "doc_id", train_df=tdf).collect()
    }
    assert g2[10] < g2[11]


def test_bigram_crossentropy_join_path_equivalence(spark):
    from metadata_crawler_spark.functions.quality import bigram_crossentropy

    docs = [(i, f"tok{i % 7} tok{(i + 1) % 7} tok{(i + 2) % 5}") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(bigram_crossentropy(df, "text", "doc_id", vocab_broadcast=True).collect())
    b = sorted(bigram_crossentropy(df, "text", "doc_id", vocab_broadcast=False).collect())
    assert a == b


# ---------------------------------------------------------------------------
# C4 heuristic rules
# ---------------------------------------------------------------------------


def test_c4_quality_flags_attribution(spark):
    from metadata_crawler_spark.functions.quality import c4_quality_flags

    docs = [
        (1, "One good sentence here. Another fine one! A third, yes?"),
        (2, "Too short."),                              # < 3 sentences
        (3, "Lorem ipsum dolor sit amet. More text here. And more there."),
        (4, "function f() { return 1; } Some prose. More prose. End here."),
        (5, None),                                      # NULL text
        (6, ""),                                        # empty
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r.c4
        for r in df.select("doc_id", c4_quality_flags(F.col("text")).alias("c4")).collect()
    }
    assert not got[1].flagged and got[1].n_sentences == 3
    assert got[2].flagged and got[2].lt3_sentences
    assert got[3].flagged and got[3].has_lorem_ipsum
    assert got[4].flagged and got[4].has_curly_brace
    # NULL/empty: concrete flags, never NULL
    for k in (5, 6):
        assert got[k].flagged is True and got[k].lt3_sentences is True
        assert got[k].has_lorem_ipsum is False


def test_c4_clean_lines(spark):
    from metadata_crawler_spark.functions.quality import c4_clean_lines

    text = "\n".join([
        "This line has five good words.",     # kept
        "Short line.",                         # < 5 words -> dropped
        "no terminal punctuation on this line at all",  # dropped
        "Please enable javascript to view this content.",  # boilerplate
        'He said "hello there my good friend."',  # kept (quote terminal)
    ])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = df.select(c4_clean_lines(F.col("text")).alias("t")).first().t
    lines = out.split("\n")
    assert lines == [
        "This line has five good words.",
        'He said "hello there my good friend."',
    ]


def test_c4_kept_line_frac(spark):
    from metadata_crawler_spark.functions.quality import c4_quality_flags

    text = "Keep this line with enough words here.\nbad\nworse line"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    c4 = df.select(c4_quality_flags(F.col("text")).alias("c4")).first().c4
    assert abs(c4.kept_line_frac - 1 / 3) < 1e-6


def test_ccnet_buckets_global_and_explicit(spark):
    from metadata_crawler_spark.functions.quality import ccnet_buckets

    rows = [(i, float(i)) for i in range(1, 10)] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id long, xent double")
    got = {r.doc_id: r.ppl_bucket for r in ccnet_buckets(df).collect()}
    # exact thirds of 1..9: head <= 3, middle <= 6, tail > 6
    assert [got[i] for i in (1, 2, 3)] == ["head"] * 3
    assert [got[i] for i in (4, 5, 6)] == ["middle"] * 3
    assert [got[i] for i in (7, 8, 9)] == ["tail"] * 3
    assert got[99] is None  # unscored stays unplaced
    exp = {r.doc_id: r.ppl_bucket
           for r in ccnet_buckets(df, cutoffs=(3.0, 6.0)).collect()}
    assert exp == got


def test_ccnet_buckets_per_language(spark):
    from metadata_crawler_spark.functions.quality import ccnet_buckets

    # lang a: xent 1..9; lang b: xent 101..109 — a global cut would dump
    # ALL of b in the tail; per-language cuts give each its own thirds
    rows = [(i, "a", float(i)) for i in range(1, 10)]
    rows += [(100 + i, "b", 100.0 + i) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, xent double")
    got = {r.doc_id: r.ppl_bucket
           for r in ccnet_buckets(df, by_col="lang").collect()}
    assert got[1] == "head" and got[101] == "head"
    assert got[5] == "middle" and got[105] == "middle"
    assert got[9] == "tail" and got[109] == "tail"


def test_soft404_flags_matrix(spark):
    from metadata_crawler_spark.functions.quality import soft404_flags

    rows = [
        (1, "404 Not Found", "x " * 200),              # title hit, big body
        (2, "Welcome", "Sorry, this page could not be found."),  # tiny + body
        (3, "Welcome", "a history of the 404 error code " + "w " * 300),
        (4, "Doc 4040", "normal text " * 30),          # 4040 is not 404
        (5, None, None),                               # NULLs stay concrete
        (6, "Error: file not found", ""),              # title hit, empty body
    ]
    df = spark.createDataFrame(rows, "id long, title string, text string")
    from pyspark.sql import functions as F

    out = {
        r.id: r
        for r in df.select(
            "id", soft404_flags(F.col("text"), F.col("title")).alias("s")
        ).select("id", "s.*").collect()
    }
    assert out[1].title_404 and not out[1].tiny_body and out[1].soft404
    assert out[2].body_404 and out[2].tiny_body and out[2].soft404
    # a long article MENTIONING 404 early is body_404 but NOT soft404
    assert out[3].body_404 and not out[3].tiny_body and not out[3].soft404
    assert not out[4].title_404 and not out[4].soft404  # \b boundary
    assert out[5].tiny_body and not out[5].soft404      # NULL -> concrete
    assert out[6].soft404
    # zero-shuffle: one projection over the scan
    plan = (
        df.select(soft404_flags(F.col("text"), F.col("title")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_repetition_ngram_fractions_vs_counter_reference(spark):
    from collections import Counter

    from metadata_crawler_spark.functions.quality import (
        GOPHER_DUP_NGRAM_CAPS,
        GOPHER_TOP_NGRAM_CAPS,
        repetition_ngram_fractions,
    )

    docs = {
        1: "a b a b a b",
        2: "w x y z q w x y z q w x y z q",
        3: "all distinct words in this one here",
        4: "",
    }

    def ref(text, n):
        toks = [t for t in text.split() if t]
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        nchars = sum(len(t) for t in toks)
        if not grams or nchars == 0:
            return 0.0, 0.0
        c = Counter(grams)
        occ = lambda g, k: k * (len(g) - (n - 1))
        # top-n counts only if the most frequent gram actually repeats
        top = max((occ(g, k) for g, k in c.items() if k > 1), default=0)
        # dup-n: positional union — each covered token's chars once
        covered = set()
        for i, g in enumerate(grams):
            if c[g] > 1:
                covered.update(range(i, i + n))
        dup = sum(len(toks[i]) for i in covered)
        return round(top / nchars, 6), round(dup / nchars, 6)

    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    out = {r.id: r for r in repetition_ngram_fractions(df, "text", "doc_id").collect()}
    for i, text in docs.items():
        for n in (3, 4):
            assert out[i][f"top{n}gram_char_frac"] == ref(text, n)[0], (i, n)
        for n in range(5, 11):
            assert out[i][f"dup{n}gram_char_frac"] == ref(text, n)[1], (i, n)
    # flag matches the canonical thresholds
    for i, text in docs.items():
        want = any(
            ref(text, n)[0] > cap for n, cap in GOPHER_TOP_NGRAM_CAPS.items()
            if n in (3, 4)
        ) or any(
            ref(text, n)[1] > cap for n, cap in GOPHER_DUP_NGRAM_CAPS.items()
        )
        assert out[i].rep_flagged == want, i


def test_repetition_ladder_gate_in_clean_corpus(spark):
    from metadata_crawler_spark.plans.corpus_pipeline import clean_corpus

    rows = [(i, f"unique{i} words flow nicely here and vary a lot {i}")
            for i in range(20)]
    rows.append((100, ("spam ham " * 40).strip()))   # dup-n-gram bomb
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base_kept = {r.id for r in clean_corpus(
        df, "text", "doc_id", min_distinct_frac=0.0, max_top2gram_frac=2.0,
    ).collect()}
    ladder_kept = {r.id for r in clean_corpus(
        df, "text", "doc_id", min_distinct_frac=0.0, max_top2gram_frac=2.0,
        repetition_ladder=True,
    ).collect()}
    assert 100 in base_kept          # base thresholds disabled above
    assert 100 not in ladder_kept    # the ladder catches the dup bomb
    assert ladder_kept <= base_kept


def test_perplexity_buckets_planted_tertiles(spark):
    """CCNet head/middle/tail (quality.perplexity_buckets): exact ntile
    flavor buckets a planted 1..9-score language into 3/3/3, per
    language independently; the approx (percentile_approx + broadcast)
    production flavor agrees on a well-separated distribution and never
    shuffles the corpus side."""
    from metadata_crawler_spark.functions.quality import perplexity_buckets

    rows = [(f"en{i}", "en", float(i)) for i in range(1, 10)]
    rows += [(f"de{i}", "de", float(100 + i)) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "id string, lang string, score double")
    exact = perplexity_buckets(
        df, "score", "id", lang_col="lang", exact=True
    ).collect()
    by = {r["id"]: r["ppl_bucket"] for r in exact}
    for lang in ("en", "de"):
        assert [by[f"{lang}{i}"] for i in range(1, 10)] == (
            ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
        )
    approx = perplexity_buckets(df, "score", "id", lang_col="lang")
    got = {r["id"]: r["ppl_bucket"] for r in approx.collect()}
    agree = sum(got[k] == by[k] for k in by)
    assert agree >= len(by) - 2  # ties at the cut may differ by policy
    plan = approx._jdf.queryExecution().executedPlan().toString()
    # production flavor: corpus side joins broadcast thresholds — no
    # per-language window funneling the corpus through one reducer
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_perplexity_buckets_no_lang(spark):
    from metadata_crawler_spark.functions.quality import perplexity_buckets

    df = spark.createDataFrame(
        [(str(i), float(i % 30)) for i in range(90)], "id string, score double"
    )
    out = perplexity_buckets(df, "score", "id", exact=True)
    counts = (
        out.groupBy("ppl_bucket").count().toPandas()
        .set_index("ppl_bucket")["count"].to_dict()
    )
    assert counts == {"head": 30, "middle": 30, "tail": 30}


def test_clean_corpus_ccnet_gate(spark):
    """ccnet_keep=("head","middle") drops roughly the top perplexity
    tertile; stage_counts records the ccnet_gate boundary; the gate
    composes with the rest of the pipeline (survivors are a subset of
    the ungated run)."""
    from metadata_crawler_spark.plans.corpus_pipeline import clean_corpus

    # 60 docs rotating through one 30-word shared vocabulary (every
    # token seen ~48x -> low xent) + 20 docs of singleton tokens (high
    # xent -> the tail bucket). 24 distinct words per doc so the Gopher
    # gate passes everything.
    vocab = [f"w{k}" for k in range(30)]
    rows = [
        (i, " ".join(vocab[(i * 7 + j) % 30] for j in range(24)))
        for i in range(60)
    ] + [
        (100 + i, " ".join(f"u{i}x{j}" for j in range(24)))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts: dict = {}
    kept = {
        r["id"]
        for r in clean_corpus(
            df, "text", "doc_id",
            ccnet_keep=("head", "middle"),
            stage_counts=counts,
        ).collect()
    }
    assert counts["quality_gate"] == 80
    # the rare-vocabulary plant IS the tail bucket: all 20 dropped,
    # every shared-vocabulary doc survives the gate
    assert counts["ccnet_gate"] == 60
    assert all(100 + i not in kept for i in range(20))
    ungated = {
        r["id"] for r in clean_corpus(df, "text", "doc_id").collect()
    }
    assert kept <= ungated


def test_perplexity_buckets_null_lang_group(spark):
    """Review fix: NULL-lang rows form their own threshold group in the
    approx flavor (eqNullSafe join) instead of all landing in 'tail'."""
    from metadata_crawler_spark.functions.quality import perplexity_buckets

    rows = [(f"n{i}", None, float(i)) for i in range(1, 10)]
    rows += [(f"e{i}", "en", float(i)) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "id string, lang string, score double")
    got = {
        r["id"]: r["ppl_bucket"]
        for r in perplexity_buckets(
            df, "score", "id", lang_col="lang"
        ).collect()
    }
    null_buckets = {got[f"n{i}"] for i in range(1, 10)}
    assert null_buckets == {"head", "middle", "tail"}


def test_clean_corpus_lang_plus_ccnet_reuses_labels(spark):
    """lang_keep + ccnet_keep together: one classify_lang pass feeds
    both gates; pipeline completes with both stage counts recorded."""
    from metadata_crawler_spark.functions.langid import train_lang_profiles
    from metadata_crawler_spark.plans.corpus_pipeline import clean_corpus

    en = "the quick brown fox jumps over the lazy dog near the old river"
    de = "der schnelle braune fuchs springt ueber den faulen hund am fluss"
    labeled = spark.createDataFrame(
        [("en", en), ("de", de)], "lang string, text string"
    )
    profiles = train_lang_profiles(labeled, top_n=200)
    vocab_en = en.split()
    rows = [
        (i, " ".join(vocab_en[(i + j) % len(vocab_en)] for j in range(24)))
        for i in range(30)
    ] + [(100 + i, de + f" extra{i} wort{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts: dict = {}
    out = clean_corpus(
        df, "text", "doc_id",
        lang_profiles=profiles, lang_keep={"en"},
        ccnet_keep=("head", "middle"),
        stage_counts=counts,
    ).collect()
    assert counts["lang_gate"] == 30  # german docs gated out
    assert 0 < counts["ccnet_gate"] <= counts["quality_gate"]
    assert all(r["id"] < 100 for r in out)


def test_gopher_top2gram_requires_repetition(spark):
    """A short document with zero repeated bigrams must NOT flag: the
    top-2-gram metric counts the most FREQUENT bigram only when it
    occurs more than once — without the guard one bigram's chars
    dominate any small total and every short unique doc flags."""
    from metadata_crawler_spark.functions.quality import gopher_repetition

    df = spark.createDataFrame(
        [(1, "The quick brown fox jumps over the lazy dog"),
         (2, "spam ham spam ham spam ham spam ham spam ham")],
        "doc_id long, text string",
    )
    got = {r.id: r for r in gopher_repetition(df, "text", "doc_id").collect()}
    assert got[1].top2gram_char_frac == 0.0
    assert got[1].flagged is False
    assert got[2].top2gram_char_frac > 0.5
    assert got[2].flagged is True


def test_repetition_topn_is_most_frequent_not_max_coverage(spark):
    """Gopher's top-n metric is the coverage of the MOST FREQUENT
    n-gram: a longer but less frequent repeated trigram must not win
    over the most frequent one."""
    from metadata_crawler_spark.functions.quality import (
        repetition_ngram_fractions,
    )

    # trigram 'a b c' occurs 4x (coverage 4*3=12 non-space chars);
    # trigram 'wwwww xxxxx yyyyy' occurs 2x (coverage 2*15=30) — the
    # old max-coverage metric reported 30/43, the most-frequent metric
    # must report 12/43
    text = (
        "a b c a b c a b c a b c "
        "wwwww xxxxx yyyyy q wwwww xxxxx yyyyy"
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = repetition_ngram_fractions(
        df, "text", "doc_id", top_ns=(3,), dup_ns=()
    ).collect()[0]
    n_chars = sum(len(t) for t in text.split())
    assert abs(row.top3gram_char_frac - round(12 / n_chars, 6)) < 1e-9


def test_perplexity_buckets_null_score_both_paths(spark):
    """NULL score = unscored -> NULL bucket, identically in the exact
    (ntile) and approx (percentile) flavors; scored rows' tertiles are
    unaffected by the NULL rows."""
    from metadata_crawler_spark.functions.quality import perplexity_buckets

    rows = [(i, float(i), "en") for i in range(9)] + [
        (90, None, "en"), (91, None, "en")
    ]
    df = spark.createDataFrame(rows, "doc_id long, xent double, lang string")
    for exact in (True, False):
        got = {
            r.doc_id: r.ppl_bucket
            for r in perplexity_buckets(
                df, "xent", "doc_id", lang_col="lang", exact=exact
            ).collect()
        }
        assert got[90] is None and got[91] is None, exact
        assert got[0] == "head" and got[8] == "tail", exact


def test_ccnet_buckets_null_group_gets_own_cuts(spark):
    """A NULL by_col group still joins its OWN percentile cuts (the
    eqNullSafe fix): NULL-lang docs bucket by their group's tertiles
    instead of all falling through to 'tail'."""
    from metadata_crawler_spark.functions.quality import ccnet_buckets

    rows = [(i, float(i), None) for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, xent double, lang string")
    got = {
        r.doc_id: r.ppl_bucket
        for r in ccnet_buckets(df, "xent", by_col="lang").collect()
    }
    assert got[0] == "head" and got[8] == "tail"
    assert set(got.values()) == {"head", "middle", "tail"}

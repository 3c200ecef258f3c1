"""BM25 full-text retrieval (operators/search.py): scoring math vs a
pure-Python reference, relevance ordering, standing-index partition
pruning, and plan hygiene."""

import math

from pyspark.sql import functions as F

from metadata_crawler_spark.operators.search import (
    bm25_topk,
    bm25_topk_batch,
    build_lexicon,
    build_postings,
    corpus_stats,
    search_index_topk,
    term_partitions,
    write_search_index,
)

DOCS = [
    (1, "spark spark spark join filter"),
    (2, "spark join join table table scan"),
    (3, "vector vector index search"),
    (4, "table scan filter filter filter scan"),
    (5, "join the the the the the the the"),
]


def _bm25_py(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for ws in toks.values():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    out = {}
    for i, ws in toks.items():
        s = 0.0
        for t in terms:
            tf = ws.count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
        if s:
            out[i] = s
    return out


def _fixture(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    post = build_postings(df)
    lex = build_lexicon(post)
    n, avgdl = corpus_stats(df)
    return df, post, lex, n, avgdl


def test_bm25_matches_python_reference(spark):
    _, post, lex, n, avgdl = _fixture(spark)
    terms = ["spark", "vector", "join"]
    got = {
        r["id"]: r["score"]
        for r in bm25_topk(post, lex, terms, n, avgdl, k=10).collect()
    }
    want = _bm25_py(DOCS, terms)
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i] - want[i]) < 1e-12, (i, got[i], want[i])


def test_bm25_relevance_ordering(spark):
    """Rare-term matches (high idf) outrank stopword-heavy matches, and
    tf saturates rather than dominating."""
    _, post, lex, n, avgdl = _fixture(spark)
    top = bm25_topk(post, lex, ["vector"], n, avgdl, k=3).collect()
    assert [r["id"] for r in top] == [3]  # only doc 3 has the term
    top = bm25_topk(post, lex, ["spark", "join"], n, avgdl, k=5).collect()
    ids = [r["id"] for r in top]
    # doc 1 (spark x3 + join) beats doc 2 (spark + join x2, longer) and
    # doc 5 (single join buried in stopwords) comes last
    assert ids[0] == 1 and ids[-1] == 5
    # n_hit counts matched terms
    assert {r["id"]: r["n_hit"] for r in top}[1] == 2


def test_bm25_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, None), (3, "   ")], "doc_id long, text string"
    )
    post = build_postings(df)
    assert post.filter(F.col("id") != 1).count() == 0  # no phantom tokens
    n, avgdl = corpus_stats(df)
    assert n == 3  # stats count every doc; empty docs just have dl 0


def test_search_index_pruned_read_parity(spark, tmp_path):
    """write_search_index + search_index_topk returns exactly the direct
    bm25_topk rows, and the scan's partition filter is the terms' pt
    IN-list (only |terms| directories read)."""
    _, post, lex, n, avgdl = _fixture(spark)
    path = str(tmp_path / "idx")
    write_search_index(post, path, n_parts=16)
    terms = ["spark", "vector"]
    direct = bm25_topk(post, lex, terms, n, avgdl, k=5).collect()
    pruned_df = search_index_topk(
        spark, path, lex, terms, n, avgdl, k=5, n_parts=16
    )
    pruned = pruned_df.collect()
    assert [(r["id"], round(r["score"], 9)) for r in direct] == [
        (r["id"], round(r["score"], 9)) for r in pruned
    ]
    plan = pruned_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pts = term_partitions(spark, terms, 16)
    assert all(str(p) in plan for p in pts)


def test_bm25_plan_hygiene(spark):
    """Top-k is TakeOrderedAndProject (no full sort shuffle); the lexicon
    joins broadcast; the only hashpartitioning Exchanges are the
    build-time postings/lexicon aggs plus the per-doc score sum."""
    import re

    _, post, lex, n, avgdl = _fixture(spark)
    q = bm25_topk(post, lex, ["spark", "join"], n, avgdl, k=3)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert not re.search(r"Exchange rangepartitioning", plan)


def test_bm25_batch_matches_single_query_path(spark):
    """bm25_topk_batch row-for-row equals per-query bm25_topk, and the
    per-query window reuses the (query_id, id) agg partitioning (no
    exchange between the sum and the rank)."""
    _, post, lex, n, avgdl = _fixture(spark)
    queries = [(10, "spark join"), (11, "vector"), (12, "table scan filter")]
    qdf = spark.createDataFrame(queries, "query_id long, query string")
    batch = {
        (r["query_id"], r["id"]): (round(r["score"], 9), r["n_hit"], r["rank"])
        for r in bm25_topk_batch(post, lex, qdf, n, avgdl, k=5).collect()
    }
    single = {}
    for qid, q in queries:
        for i, r in enumerate(
            bm25_topk(post, lex, q.split(), n, avgdl, k=5).collect()
        ):
            single[(qid, r["id"])] = (round(r["score"], 9), r["n_hit"], i + 1)
    assert batch == single
    plan = (
        bm25_topk_batch(post, lex, qdf, n, avgdl, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the query side makes ONE exchange, keyed query_id alone — the agg
    # AND the rank window both reuse it (a (query_id, id)-keyed exchange
    # would satisfy only the agg and force a second shuffle for the
    # window)
    import re

    parts = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    # ignore the tiny (query_id, token) distinct inside the broadcast
    # build side; the big-side exchanges are the ones that matter
    q_parts = [p for p in parts if "query_id" in p and "token" not in p]
    assert len(q_parts) == 1, q_parts
    assert ", id#" not in q_parts[0], q_parts  # keyed query_id ALONE
    assert "BroadcastHashJoin" in plan


def test_bm25_batch_duplicate_query_terms(spark):
    """Repeated terms in a query count once (bag semantics at the doc
    side, set semantics at the query side — same as bm25_topk's isin)."""
    _, post, lex, n, avgdl = _fixture(spark)
    qdf = spark.createDataFrame(
        [(1, "spark spark spark")], "query_id long, query string"
    )
    got = bm25_topk_batch(post, lex, qdf, n, avgdl, k=10).collect()
    want = bm25_topk(post, lex, ["spark"], n, avgdl, k=10).collect()
    assert [(r["id"], round(r["score"], 9)) for r in got] == [
        (r["id"], round(r["score"], 9)) for r in want
    ]

"""Streaming corpus quality scoring: the cleaning operators on a stream.

The point of building every quality operator as stateless column
expressions (functions/quality.py) is that they apply to a Structured
Streaming DataFrame UNCHANGED: Gopher rule flags, repetition-free
metrics and the broadcast-weights classifier score are per-row, so a
stream of newly-crawled documents gets scored in-flight — no batch
re-run, no code fork between the batch pipeline (plans/corpus_pipeline)
and the stream. The only stateful piece a streaming gate needs is
cross-batch exact dedup, which is watermark-bounded state
(``dropDuplicatesWithinWatermark``) — Spark expires the dedup keys once
the watermark passes, so state stays O(docs within the lateness window)
at any stream length.

Reference analog: the reference indexes per-batch as it harvests
(run.py add->index loop); our stream is that loop as a standing query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_STREAM_SCHEMA = "doc_id long, url string, ts timestamp, text string"


def score_documents(
    docs: DataFrame,
    clf_weights=None,
    clf_n_buckets: int = 1 << 20,
    clf_hasher: str = "xxhash64",
    clf_bias: float = 0.0,
) -> DataFrame:
    """Attach the quality columns to a (streaming or batch) documents
    frame: ``gopher`` struct (rule flags), ``clf_score`` (when weights
    given). Works identically on both because everything is stateless —
    asserted by the stream-vs-batch parity test."""
    from ..functions.quality import (
        gopher_quality_flags,
        quality_classifier_score,
    )

    out = docs.withColumn("gopher", gopher_quality_flags(F.col("text")))
    if clf_weights is not None:
        out = quality_classifier_score(
            out, "text", clf_weights,
            n_buckets=clf_n_buckets, hasher=clf_hasher, bias=clf_bias,
        )
    return out


def stream_document_scores(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    clf_weights=None,
    clf_n_buckets: int = 1 << 20,
    clf_hasher: str = "xxhash64",
    watermark: str = "1 hour",
    query_name: str = "doc_scores",
):
    """Standing query over parquet document deltas landing in
    ``input_dir``: watermarked cross-batch exact dedup on ``doc_id``
    (bounded state), then stateless scoring, into the ``query_name``
    memory sink (callers aiming at storage swap the sink; the transforms
    are the point). Returns the started StreamingQuery."""
    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["doc_id"])
    )
    scored = score_documents(
        stream, clf_weights, clf_n_buckets, clf_hasher
    ).select(
        "doc_id", "url", "ts",
        F.col("gopher.flagged").alias("gopher_flagged"),
        F.col("gopher.n_words").alias("n_words"),
        *(["clf_score"] if clf_weights is not None else []),
    )
    return (
        scored.writeStream.format("memory")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
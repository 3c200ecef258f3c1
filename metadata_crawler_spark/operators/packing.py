"""Training-sequence packing: turning a cleaned document corpus into
fixed-length model input sequences.

Two industry-standard shapes, both deterministic:

- ``pack_concat_chunk`` (GPT-style): concatenate every document's tokens in
  global (id ASC) order and cut every ``seq_len`` tokens; documents may
  span sequence boundaries. The global token offset is an EXCLUSIVE prefix
  sum — computed with a two-phase scan (per-range-partition window + a
  bounded per-partition-totals collect) instead of the classic
  single-partition ``Window.orderBy`` which serializes the whole corpus
  through one task at 100 TB.
- ``pack_bins`` (no-split packing, T5/llm-foundry style): documents stay
  whole; first-fit-decreasing within deterministic hash shards. Packing is
  embarrassingly local — practitioners shard exactly like this because a
  globally optimal packing buys <1% fill over shard-local FFD at web scale
  while costing a global sort. Runs as one ``applyInPandas`` per shard.

Reference analog: the reference batches its ingest queue by fixed batch
index (SURVEY §2 A6, api/utils.py batch splitter) — same shape, counted in
documents; packing counts in tokens.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_prefix_sum(
    df: DataFrame,
    id_col: str,
    count_col: str,
    out_col: str = "start",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive prefix sum of ``count_col`` in global ``id_col`` ASC order,
    scalable: range-partition by id, per-partition window scan (parallel),
    then add broadcast per-partition offsets (one bounded collect of
    #partitions rows). The ranged frame is localCheckpoint-ed before the
    totals job: ``repartitionByRange`` samples fresh boundaries per
    execution, so without pinning, the offsets job and the final plan could
    disagree on which partition a boundary row lands in, silently skewing
    every downstream global offset. The checkpoint makes both jobs read the
    exact same partitioning (and truncates lineage for the re-read)."""
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # lazy checkpoint (r6): the totals job right below is the first
    # consumer and materializes the pinned RDD — an eager checkpoint
    # added one extra blocking job for the same guarantee (both the
    # totals job and the final plan read the SAME materialized
    # partitioning either way)
    ranged = (
        df.repartitionByRange(n_parts, F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("_pid").orderBy(id_col)
    scanned = ranged.withColumn(
        "_local_excl",
        F.coalesce(
            F.sum(count_col).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    totals = sorted(
        (r["_pid"], r["_tot"])
        for r in ranged.groupBy("_pid")
        .agg(F.sum(count_col).alias("_tot"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, tot in totals:
        offsets[pid] = acc
        acc += tot or 0
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    ) if offsets else F.create_map()
    return (
        scanned.withColumn(
            out_col,
            (
                F.coalesce(F.element_at(off_map, F.col("_pid")), F.lit(0))
                + F.col("_local_excl")
            ).cast("long"),
        )
        .drop("_pid", "_local_excl")
    )


def pack_concat_chunk(
    df: DataFrame,
    id_col: str,
    count_col: str,
    seq_len: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk packing plan: every doc gets its global token span
    [start_tok, start_tok + n) and the training sequences it lands in.

    Adds: start_tok, first_seq, last_seq (inclusive; == first_seq for empty
    docs), seq_offset (position within first_seq), n_seqs_spanned.
    """
    L = int(seq_len)
    # r6 (guide §8 "decide with small rows, move big rows once"): the
    # prefix sum needs only (id, count) — 16 bytes/doc — but it used to
    # run over the FULL caller row (q16 feeds quality/langid/fingerprint
    # metrics), so repartitionByRange's boundary-sampling pass computed
    # every expensive column a second time and the pinning
    # localCheckpoint materialized full-width rows. Now the scan runs on
    # the pruned 2-column table and the spans join back on the unique id
    # (broadcast/shuffle decided by AQE from the observed tiny size).
    out = with_prefix_sum(
        df.select(id_col, count_col), id_col, count_col,
        out_col="start_tok", num_partitions=num_partitions,
    )
    out = df.join(out.select(id_col, "start_tok"), id_col).select(
        *df.columns, "start_tok"
    )
    n = F.col(count_col)
    start = F.col("start_tok")
    first = (start / L).cast("long")
    last = F.when(n > 0, ((start + n - 1) / L).cast("long")).otherwise(first)
    return (
        out.withColumn("first_seq", first)
        .withColumn("last_seq", last)
        .withColumn("seq_offset", (start % L).cast("long"))
        .withColumn("n_seqs_spanned", (last - first + 1).cast("long"))
    )


def packing_summary(df: DataFrame, count_col: str, seq_len: int) -> DataFrame:
    """One-row summary for concat-chunk: total tokens, sequence count, and
    padding fraction (only the final partial sequence pads)."""
    L = int(seq_len)
    tot = F.sum(count_col).cast("long")
    n_seq = F.ceil(tot / L).cast("long")
    return df.agg(
        tot.alias("total_tokens"),
        n_seq.alias("n_sequences"),
        F.round(
            F.when(n_seq > 0, (n_seq * L - tot) / (n_seq * L)).otherwise(0.0), 6
        ).alias("padding_frac"),
    )


def pack_bins(
    df: DataFrame,
    id_col: str,
    count_col: str,
    capacity: int,
    num_shards: int = 64,
) -> DataFrame:
    """No-split packing: first-fit-decreasing within deterministic hash
    shards (shard = xxhash64(id) mod num_shards — stable across cluster
    sizes). Documents longer than ``capacity`` get a dedicated oversize bin
    with ``oversize = true`` (the caller decides to split or drop them).

    Returns (id, n=count, shard, bin, oversize); (shard, bin) is the packed
    sequence key. Bin fill never exceeds capacity (asserted in tests).

    Scale: one shuffle on shard; each shard's FFD is a single Arrow batch
    sorted by (-n, id) — at 100 TB pick num_shards ~ corpus_docs / 10^6 so
    a shard's (id, n) pairs fit one executor comfortably (16 bytes/doc).
    """
    cap = int(capacity)

    def _ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n", "id"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        fills: list[int] = []
        bins: list[int] = []
        oversize: list[bool] = []
        # max_resid is an UPPER BOUND on (cap - fill) over scannable
        # bins (placements only shrink residuals; recomputed after a
        # failed scan). n > max_resid proves no bin fits, so the doc
        # opens a new bin WITHOUT scanning — identical first-fit
        # output, but the O(docs x bins) scan (hours at the docstring's
        # 10^6-doc shards) collapses to a handful of full scans.
        max_resid = -1
        for n in pdf["n"]:
            n = int(n)
            if n > cap:
                bins.append(len(fills))
                fills.append(n)  # oversize bin: never receives another doc
                oversize.append(True)
                continue
            if n > max_resid:
                bins.append(len(fills))
                fills.append(n)
                oversize.append(False)
                max_resid = max(max_resid, cap - n)
                continue
            for b, f in enumerate(fills):
                if f + n <= cap:
                    bins.append(b)
                    fills[b] = f + n
                    break
            else:
                # the bound was stale: tighten it and open a new bin
                max_resid = max(
                    (cap - f for f in fills if f <= cap), default=-1
                )
                bins.append(len(fills))
                fills.append(n)
                max_resid = max(max_resid, cap - n)
            oversize.append(False)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        pdf["oversize"] = pd.Series(oversize, dtype="bool")
        return pdf

    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(count_col).cast("long").alias("n"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards)).alias("shard"),
    )
    return keyed.groupBy("shard").applyInPandas(
        _ffd, "id long, n long, shard int, bin long, oversize boolean"
    )

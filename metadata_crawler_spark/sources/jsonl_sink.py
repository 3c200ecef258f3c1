"""JSONL shard sink: the LLM training-data interchange layout.

Parquet is this engine's internal format, but the artifacts pretraining
teams exchange (HuggingFace datasets, Dolma, RedPajama drops) are
directories of ``*.jsonl.gz`` shards — one JSON object per line,
gzipped, sharded at a target size. This sink writes that layout from
any DataFrame and returns a shard manifest.

Spark shape — the same contract as the WARC archive sink
(sources/warc.write_warc_segments):

- JSON rendering stays JVM-side: ``F.to_json(struct(*))`` is a codegen'd
  column expression, so the only thing that crosses into Python is the
  finished line (one string column per row), never per-field Python
  work.
- One writer task per input partition (mapInPandas), rolling to a new
  shard after ``target_shard_bytes`` compressed bytes; no shuffle, no
  driver data.
- Deterministic names ``{prefix}-{pid:05d}-{seq:04d}.jsonl[.gz]`` and
  ``mtime=0`` gzip headers: a retried task rewrites byte-identical
  files via tmp+atomic-rename (local) or object-store streams
  (pyarrow.fs), so the sink is idempotent.
- LAZY: shards are written when the returned manifest DataFrame is
  materialized — persist the manifest as the action so manifest and
  shards land together.

Read-back needs no custom reader: ``spark.read.json`` (and every other
tool in the ecosystem) consumes the layout directly.

Reference parity: the reference's JSONLines store is exactly this
format single-threaded — orjson-encode a record batch, newline-join,
gzip one member, append (jsonlines.py:54-68 ``_encode_records`` /
``_gzip_once`` / ``_write_table``); this sink is that writer made
partition-parallel, rolled, and idempotent.
"""

from __future__ import annotations

import gzip
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .warc import _open_out

#: default compressed roll size; tests shrink it to force rolling.
TARGET_SHARD_BYTES = 256 * 1024 * 1024

MANIFEST_SCHEMA = "shard string, n_rows long, n_bytes long"


def write_jsonl_shards(
    df: DataFrame,
    out_dir: str,
    target_shard_bytes: int = TARGET_SHARD_BYTES,
    prefix: str = "shard",
    compress: bool = True,
) -> DataFrame:
    """Write ``df`` as ``{out_dir}/{prefix}-*.jsonl[.gz]`` and return the
    manifest (shard, n_rows, n_bytes). ``n_bytes`` is the on-disk
    (compressed) size. Repartition upstream to size shards — parallelism
    == input partitions."""
    from pyspark import TaskContext

    ext = ".jsonl.gz" if compress else ".jsonl"
    lines = df.select(F.to_json(F.struct(*df.columns)).alias("j"))

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        state = {"fh": None, "gz": None, "fin": None, "abort": None,
                 "name": "", "rows": 0, "seq": 0}
        out: list[tuple] = []

        def close_current() -> None:
            if state["fh"] is None:
                return
            if state["gz"] is not None:
                state["gz"].close()  # flush trailer while fh is still open
            size = state["fh"].tell()
            state["fin"]()
            out.append((state["name"], state["rows"], size))
            state["fh"] = state["gz"] = None

        def open_next() -> None:
            state["name"] = (
                f"{out_dir.rstrip('/')}/{prefix}-{pid:05d}-{state['seq']:04d}{ext}"
            )
            state["seq"] += 1
            state["rows"] = 0
            state["fh"], state["fin"], state["abort"] = _open_out(
                state["name"]
            )
            state["gz"] = (
                # filename="" pins the gzip FNAME header empty —
                # GzipFile would otherwise embed fileobj.name, i.e. the
                # (attempt-scoped) tmp path, breaking byte-deterministic
                # rewrites
                gzip.GzipFile(
                    filename="", fileobj=state["fh"], mode="wb", mtime=0
                )
                if compress
                else None
            )

        try:
            for pdf in batches:
                for line in pdf["j"]:
                    if state["fh"] is None:
                        open_next()
                    (state["gz"] or state["fh"]).write(
                        line.encode("utf-8") + b"\n"
                    )
                    state["rows"] += 1
                    # gzip buffers, so fh.tell() lags slightly — close
                    # enough for a roll threshold (exact size lands in
                    # the manifest)
                    if state["fh"].tell() >= target_shard_bytes:
                        close_current()
        except BaseException:
            # failed task: never publish the partial shard (the retry
            # rewrites the same deterministic names)
            if state["fh"] is not None:
                state["abort"]()
            raise
        close_current()
        yield pd.DataFrame(out, columns=["shard", "n_rows", "n_bytes"])

    return lines.mapInPandas(part, MANIFEST_SCHEMA)

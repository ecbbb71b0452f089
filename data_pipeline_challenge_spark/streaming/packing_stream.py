"""Incremental sequence packing over a streaming corpus source.

The streaming face of ``operators/packing.py``'s sharded packer: corpus
increments arriving as parquet files fold into a maintained packed table
per micro-batch. Greedy packing is prefix-dependent, so a shard's bins
cannot be extended row-by-row without state — instead each micro-batch
REPACKS exactly the (group, shard) keys it touches, over all rows seen so
far for those shards. A row's shard is a pure function of its order key
(``pmod(xxhash64(order_col), n_shards)``), so shard membership is stable
across micro-batches and any new row for a shard re-touches it; therefore
after the stream drains, every shard's bins were last computed over its
full row set and the packed table equals the batch
``pack_sequences_sharded`` over the whole corpus exactly
(``test_packing_stream_equals_batch``).

Cost per micro-batch is O(touched shards × shard size), never O(corpus):
the same bounded-recompute discipline as ``rollup_stream.py``, with the
same versioned idempotent sink (versioned dirs + atomic symlink publish +
two-version retention; replayed batches skip the fold and repair the
symlink, so exactly-once holds without a transactional sink).
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.packing import pack_sequences_sharded
from .rollup_stream import _publish, _versions


def current_packed(spark: SparkSession, out_dir: str | Path) -> DataFrame | None:
    """The latest published packed table, or None before the first batch.
    Resolves the ``current`` symlink once at planning time (pinned version
    dir, two-version retention — see rollup_stream.current_rollup)."""
    import os

    rdir = Path(out_dir)
    cur = rdir / "current"
    if cur.is_symlink():
        target = rdir / os.readlink(cur)
        if target.exists():
            return spark.read.parquet(str(target))
    versions = _versions(rdir)
    if not versions:
        return None
    return spark.read.parquet(str(versions[-1][1]))


def start_packing_stream(
    spark: SparkSession,
    corpus_dir: str | Path,
    out_dir: str | Path,
    checkpoint_dir: str | Path,
    schema: str,
    group_col: str,
    order_col: str,
    token_col: str,
    capacity: int,
    n_shards: int = 64,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream corpus parquet files into the incrementally-maintained packed
    table. ``available_now=True`` drains what's landed and stops."""
    odir = Path(out_dir)
    odir.mkdir(parents=True, exist_ok=True)
    rows_dir = odir / "rows"
    gc, oc, tc = group_col, order_col, token_col

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(str(corpus_dir))

    shard_of = F.pmod(F.xxhash64(F.col(oc)), F.lit(n_shards)).cast("int")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        versions = _versions(odir)
        if versions and versions[-1][0] >= batch_id:
            # crash-replay of an already-folded batch: skip the fold,
            # repair the symlink if the crash preceded the publish
            _publish(odir, versions[-1][1])
            return
        slim = batch_df.select(gc, oc, tc).withColumn("shard", shard_of)
        # Accumulate this batch's rows under a per-batch partition dir —
        # overwrite makes a replayed append idempotent.
        slim.write.mode("overwrite").parquet(str(rows_dir / f"ingest_batch={batch_id}"))

        touched = slim.select(gc, "shard").distinct()
        seen = (
            spark.read.parquet(str(rows_dir))
            .drop("ingest_batch")
            .join(F.broadcast(touched), [gc, "shard"], "inner")
        )
        repacked = pack_sequences_sharded(
            seen, gc, oc, tc, capacity, n_shards=n_shards
        )
        prev = current_packed(spark, odir)
        if prev is None:
            merged = repacked
        else:
            kept = prev.join(F.broadcast(touched), [gc, "shard"], "left_anti")
            merged = kept.unionByName(repacked)

        tmp = odir / f"data.v{batch_id}.tmp"
        if tmp.exists():
            shutil.rmtree(tmp)
        merged.write.mode("overwrite").parquet(str(tmp))
        final = odir / f"data.v{batch_id}"
        if final.exists():
            shutil.rmtree(final)
        tmp.rename(final)
        _publish(odir, final)
        for _, p in _versions(odir)[:-2]:
            shutil.rmtree(p, ignore_errors=True)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", str(checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

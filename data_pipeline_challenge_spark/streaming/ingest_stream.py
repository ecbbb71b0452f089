"""Streaming ingestion — the reference's queue topology as one stream.

Reference: RabbitMQ consumers run forever with prefetch=1 and at-least-once
redelivery (/root/reference/app/mq.py:96,162-196). Spark upgrade (SURVEY §2
"supporting infrastructure"): a ``binaryFile`` file-source stream over the
landing directory — file arrival IS the event — checkpointed so each file
is processed exactly once across restarts; ``maxFilesPerTrigger`` is the
backpressure analog of prefetch.

Each micro-batch reuses the batch pipeline verbatim (parse → validate →
merge → ledger) inside ``foreachBatch`` — the SURVEY §3.1 redesign: "one
job per micro-batch"; the poison-message infinite-redelivery failure mode
of the reference cannot occur (a malformed file is marked failed once and
never re-enters the stream).
"""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..pipeline import ProductWarehouse


def start_ingest_stream(
    spark: SparkSession,
    landing_dir: str | Path,
    warehouse: ProductWarehouse,
    checkpoint_dir: str | Path,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the landing-dir ingestion stream.

    ``available_now=True`` drains everything currently landed then stops
    (the batch-catchup trigger); ``False`` runs continuously. The stream
    carries only file *paths* into ``foreachBatch`` — contents are re-read
    by the batch pipeline's splittable reader, so huge files never flow
    through the streaming channel itself.
    """
    reader = (
        spark.readStream.format("binaryFile")
        # binaryFile's schema is fixed but the streaming source still
        # requires it to be declared explicitly
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", "*")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(str(landing_dir)).select("path")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        paths = [r["path"].removeprefix("file:") for r in batch_df.collect()]
        # Defensive filters: tmp files (landing writes are atomic, but be
        # safe) and paths already GC'd — after a crash between batch commit
        # and checkpoint commit, the source replays the batch whose files
        # the previous attempt deleted. The merge is idempotent, so replay
        # of still-present files is safe; vanished ones must be skipped.
        paths = [
            p
            for p in paths
            if not Path(p).name.startswith(".") and Path(p).exists()
        ]
        if not paths:
            return
        warehouse.ingest_paths(paths)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", str(checkpoint_dir))
        .queryName("product-ingest")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain_ingest_stream(
    spark: SparkSession,
    landing_dir: str | Path,
    warehouse: ProductWarehouse,
    checkpoint_dir: str | Path,
    timeout_s: int = 120,
) -> None:
    """Run the ingest stream until everything currently landed is processed
    (exactly-once across repeated calls thanks to the checkpoint)."""
    q = start_ingest_stream(
        spark, landing_dir, warehouse, checkpoint_dir, available_now=True
    )
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
    if q.exception() is not None:
        raise q.exception()

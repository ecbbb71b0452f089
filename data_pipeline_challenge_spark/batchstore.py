"""Append-only micro-batch stores and their consolidation.

Several maintained structures accumulate one ``ingest_batch=B`` partition
directory per micro-batch (the packing stream's rows store, the ANN index
increment stores). Partition PRUNING keeps scans O(touched), but partition
DISCOVERY still lists every batch directory — after a year of
micro-batches the listing itself is the bottleneck. Consolidation folds
all live batches into ONE negative-id partition so the directory count
resets to O(1) while the reader view is unchanged.

Crash-safe without a transactional format, via a marker file:

- the live view is ``(ingest_batch == marker.consolidated) OR
  (ingest_batch > marker.through)`` — both planning-time partition
  filters; with no marker it is ``ingest_batch >= 0`` (so a half-written
  consolidated dir from a crashed fold is invisible);
- a fold writes the new consolidated dir (tmp + atomic rename, id =
  previous consolidated - 1, starting at -1), atomically replaces the
  marker (``os.replace``), THEN deletes the folded dirs. A crash before
  the marker swap leaves the old view fully intact; a crash after it
  leaves stale dirs the reader already excludes and the next fold sweeps;
- batch ids only grow (checkpointed stream), so a post-fold batch is
  always ``> through`` and immediately visible; a FRESH-checkpoint replay
  re-writing an already-folded batch id lands ``<= through`` and stays
  invisible — no duplicates either way.

Consolidation is OFFLINE maintenance: run it while the owning stream is
not running (the same writer-coordination contract as
``operators/maintenance.compact_published_table``). Readers need no
coordination.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_MARKER = "_consolidated.json"
_BATCH_RE = re.compile(r"^ingest_batch=(-?\d+)$")


def append_batch_increment(
    df: DataFrame, store: str | Path, batch_id: int, partition_by: str | None = None
) -> bool:
    """Write one micro-batch increment dir (``ingest_batch=B``) into a
    batch store: tmp + atomic rename, so a crash-replay overwrites its
    own directory idempotently. The ONE shared implementation of the
    protocol every streaming gate uses (dedup / near-dedup / decontam /
    filter gates) — the crash-safety-critical write path must not exist
    in per-module copies that drift.

    Returns False WITHOUT writing when ``df`` has no rows. Two reasons:
    a PARTITIONED write of an empty DataFrame produces a directory with
    no data files at all, and one such dir poisons every later
    ``spark.read.parquet`` over the store (``UNABLE_TO_INFER_SCHEMA``),
    wedging the stream on its own replay; and even readable empty dirs
    would accrete one per idle/all-filtered batch forever. Callers treat
    False as 'increment absent': their replay guard stays behind the
    batch id, which is safe because a replayed fold recomputes the same
    empty result deterministically and re-skips.

    With ``partition_by``, rows are hash-clustered onto tasks by the
    partition column first — otherwise every task writes a sliver into
    every partition value's directory (n_values × tasks small files per
    batch)."""
    store = Path(store)
    # Cache across the emptiness probe and the write: both evaluate the
    # (often join/aggregation-heavy) gate output, and without the cache
    # every non-empty micro-batch would compute its plan twice.
    df = df.cache()
    try:
        if not df.take(1):
            return False
        store.mkdir(parents=True, exist_ok=True)
        tmp = store.parent / f".{store.name}.b{batch_id}.tmp"
        if tmp.exists():
            shutil.rmtree(tmp)
        if partition_by:
            clustered = df.repartition(F.col(partition_by))
            clustered.write.mode("overwrite").partitionBy(partition_by).parquet(
                str(tmp)
            )
        else:
            df.write.mode("overwrite").parquet(str(tmp))
        final = store / f"ingest_batch={batch_id}"
        if final.exists():
            shutil.rmtree(final)
        tmp.rename(final)
        return True
    finally:
        df.unpersist()


def _read_marker(store: Path) -> dict | None:
    p = store / _MARKER
    if not p.exists():
        return None
    return json.loads(p.read_text())


def _batch_dirs(store: Path) -> list[tuple[int, Path]]:
    if not store.exists():
        return []
    return sorted(
        (int(m.group(1)), p)
        for p in store.iterdir()
        if (m := _BATCH_RE.match(p.name))
    )


def last_batch_id(store: str | Path) -> int:
    """Highest micro-batch id ever folded into the store (live dirs or
    consolidated-through), or -1 — the fresh-checkpoint replay guard."""
    store = Path(store)
    top = max((n for n, _ in _batch_dirs(store) if n >= 0), default=-1)
    marker = _read_marker(store)
    if marker:
        top = max(top, int(marker["through"]))
    return top


def read_batch_store(spark: SparkSession, store: str | Path) -> DataFrame:
    """The live view of the store: consolidated partition ∪ batches past
    it. The ``ingest_batch`` filter is a static partition filter, so
    excluded dirs (stale folds, crash leftovers, replayed-but-superseded
    batches) are pruned at planning time. The ``ingest_batch`` column is
    kept; callers drop it."""
    store = Path(store)
    df = spark.read.parquet(str(store))
    marker = _read_marker(store)
    if marker:
        return df.filter(
            (F.col("ingest_batch") == int(marker["consolidated"]))
            | (F.col("ingest_batch") > int(marker["through"]))
        )
    return df.filter(F.col("ingest_batch") >= 0)


def _sweep_stale(store: Path, marker: dict) -> int:
    """Delete every batch dir the marker's view already excludes (older
    consolidated dirs, folded positives) — the post-commit cleanup of a
    fold, also re-runnable standalone to finish a fold that crashed
    after its marker swap. Returns dirs removed."""
    cons, through = int(marker["consolidated"]), int(marker["through"])
    swept = 0
    for n, p in _batch_dirs(store):
        if n == cons:
            continue
        if n < 0 or n <= through:
            shutil.rmtree(p, ignore_errors=True)
            swept += 1
    return swept


def consolidate_batch_store(
    spark: SparkSession,
    store: str | Path,
    partition_by: list[str] | None = None,
) -> int:
    """Fold every live batch partition into one consolidated partition
    (see module docstring for the crash-safety argument). Returns the
    number of directories folded or swept (0 = nothing to do). OFFLINE:
    the owning stream must not be running.

    A re-run with no new batches still sweeps directories a crashed
    fold's marker already excludes — otherwise a fold that died between
    its marker swap and its cleanup would leave the stale dirs listed by
    every partition discovery until some future batch triggered another
    productive fold (never, on a quiesced store)."""
    store = Path(store)
    dirs = _batch_dirs(store)
    marker = _read_marker(store)
    live_positive = [n for n, _ in dirs if n >= 0]
    if marker:
        live_positive = [n for n in live_positive if n > int(marker["through"])]
    if len(live_positive) <= 1 and marker is None:
        return 0  # a single batch dir gains nothing
    if not live_positive and marker is not None:
        return _sweep_stale(store, marker)  # crash-leftover cleanup only

    through = max(
        live_positive + ([int(marker["through"])] if marker else [])
    )
    new_id = int(marker["consolidated"]) - 1 if marker else -1

    live = read_batch_store(spark, store).drop("ingest_batch")
    tmp = store / f".consolidate.{-new_id}.tmp"
    if tmp.exists():
        shutil.rmtree(tmp)
    writer = live.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(str(tmp))
    final = store / f"ingest_batch={new_id}"
    if final.exists():
        shutil.rmtree(final)
    tmp.rename(final)

    new_marker = {"consolidated": new_id, "through": through}
    mtmp = store / (_MARKER + ".tmp")
    mtmp.write_text(json.dumps(new_marker))
    os.replace(mtmp, store / _MARKER)  # the commit point

    return _sweep_stale(store, new_marker)

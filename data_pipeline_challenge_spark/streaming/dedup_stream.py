"""Incremental exact-dedup against history — the streaming face of
``operators/dedup.exact_duplicates``.

A training-data pipeline at 100 TB ingests continuously, and exact dedup
must not re-scan the corpus per arrival: only NOVEL documents (first
occurrence of a normalized-text fingerprint, ever) may flow downstream.
This stream maintains two structures under ``out_dir``:

- ``docs/`` — the novel-document store: exactly one row per distinct
  fingerprint ever seen, the first-arrival winner (earliest micro-batch,
  then smallest id — deterministic under replay). Downstream consumers
  read this instead of the raw corpus.
- ``fp_index/`` — the against-history membership index: one
  ``(fp, fp_prefix)`` row per distinct fingerprint, partitioned by
  ``fp_prefix = pmod(xxhash64(fp), n_prefix)``. Hash-only, so it is
  orders of magnitude smaller than the corpus (a 100 TB corpus of ~1e11
  docs is a few TB of fingerprints).

Per-micro-batch cost is O(batch) + O(touched-prefix slice of the index),
never O(corpus), and each half is structural:

- the batch folds to one winner per fp (one batch-sized shuffle);
- the membership probe scans the index pruned to the batch's touched
  prefixes — a driver-side literal ``isin`` that lands in
  ``PartitionFilters`` (planning-time pruning; untouched prefixes' files
  are never listed) — and joins it against the BROADCAST batch
  fingerprint set (semi join, build side = batch), so the index is
  never shuffled (pinned by
  ``test_dedup_stream_probe_pruned_and_never_shuffles_index``);
- appends are pure: one new ``ingest_batch=B`` dir per store per batch
  (tmp + atomic rename), nothing existing is read back or rewritten.

Exactly-once without a transactional sink, the repo's standard recipe:
both stores key their increment dirs by micro-batch id, ``docs`` is
written before ``fp_index``, and the replay guard skips a batch only
when it is folded into BOTH stores (min across stores, mirroring
``index_stream``'s bounds rule) — a crash between the two writes
replays into an index that does not yet contain the batch, so the novel
set recomputes identically and the docs dir is overwritten with the
same content. A fresh-checkpoint renumbered replay lands at-or-below
the guard and is skipped, so nothing duplicates.

Directory growth is bounded the same way as every micro-batch store
here: ``compact_dedup_store`` folds both stores' live batches into one
consolidated partition (``batchstore`` crash-safe marker protocol,
offline — run while the stream is stopped).

Near-dup (MinHash/SimHash) streaming maintenance composes on top: feed
``docs/`` (already exact-deduped) into the batch LSH operators, or the
persisted-index increments of ``index_stream`` for the embedding path.
"""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.streaming import StreamingQuery

from ..batchstore import (
    account_empty_fold,
    append_batch_increment,
    consolidate_batch_store,
    maybe_consolidate_in_stream,
    ensure_store_params,
    has_rebuilt_marker,
    last_batch_id,
    read_batch_store,
    sequential_fold_guard,
)
from ..functions.textfn import normalized_fingerprint


def _prefix_of(fp_col, n_prefix: int):
    from ..batchstore import prefix_bucket

    return prefix_bucket(fp_col, n_prefix)


def history_fps(
    spark: SparkSession, out_dir: str | Path, touched_prefixes: list[int]
) -> DataFrame:
    """Fingerprints ever seen in the given prefix partitions — a
    partition-pruned scan of the membership index. ``touched_prefixes``
    is a driver-side literal, so the ``isin`` is a static partition
    filter (untouched prefixes never listed). Goes through
    ``batchstore.read_batch_store`` so a consolidated index serves the
    identical view."""
    store = Path(out_dir) / "fp_index"
    return (
        read_batch_store(spark, store)
        .filter(F.col("fp_prefix").isin([int(p) for p in touched_prefixes]))
        .select("fp")
    )


def current_novel_docs(spark: SparkSession, out_dir: str | Path) -> DataFrame | None:
    """The maintained novel-document table (one row per distinct
    fingerprint, first-arrival winner), or None before the first batch."""
    store = Path(out_dir) / "docs"
    if not store.exists() or not any(store.glob("ingest_batch=*")):
        return None
    return read_batch_store(spark, store).drop("ingest_batch")


# store name -> partition columns; shared by offline compaction and the
# in-stream consolidation hook so the two can never disagree on layout.
_STORES: tuple[tuple[str, list[str] | None], ...] = (
    ("docs", None),
    ("fp_index", ["fp_prefix"]),
)


def _store_map(odir: Path) -> dict[Path, list[str] | None]:
    return {odir / name: part for name, part in _STORES}


def compact_dedup_store(spark: SparkSession, out_dir: str | Path) -> dict[str, int]:
    """Maintenance: fold each store's accumulated per-batch dirs into one
    consolidated partition (crash-safe marker protocol, ``batchstore``)
    so partition discovery stays O(1) on a long-lived warehouse. Run
    while the dedup stream is NOT running — OR let the stream do it
    itself via ``consolidate_every`` (no stop window needed). Returns
    {store: dirs folded}."""
    odir = Path(out_dir)
    out: dict[str, int] = {}
    for name, part in _STORES:
        store = odir / name
        if store.exists():
            out[name] = consolidate_batch_store(spark, store, partition_by=part)
    return out



def fold_batch(
    spark: SparkSession,
    out_dir: str | Path,
    batch_df: DataFrame,
    batch_id: int,
    id_col: str,
    text_col: str,
    n_prefix: int = 256,
) -> DataFrame | None:
    """Fold ONE micro-batch through against-history exact dedup — the
    per-batch core, exposed so ``corpus_pipeline_stream`` can chain it
    with the other gates inside a single ``foreachBatch``.

    Returns this batch's ADMITTED (novel) rows read back from the
    just-written increment dir — the downstream stage's input — or None
    when nothing was admitted. Idempotent: a batch already folded into
    both stores returns its stored increment without re-folding (the
    crash-mid-pipeline replay path: an earlier gate skips, later gates
    still get its output)."""
    odir = Path(out_dir)
    odir.mkdir(parents=True, exist_ok=True)
    # n_prefix is baked into every fp_index partition ever written; a
    # restart with a different value would probe the wrong partitions
    # and re-admit every duplicate — refuse loudly instead.
    ensure_store_params(odir, {"n_prefix": int(n_prefix)})
    docs_store = odir / "docs"
    fp_store = odir / "fp_index"

    def _stored() -> DataFrame | None:
        inc = docs_store / f"ingest_batch={batch_id}"
        return (
            spark.read.parquet(str(inc)).drop("ingest_batch")
            if inc.exists()
            else None
        )

    # Folded into BOTH stores ⇒ replay is a no-op. min, not max: a
    # crash between the docs and fp_index writes leaves docs ahead,
    # and a max-based skip would permanently drop the batch from the
    # index (every one of its fps would re-emit as novel forever).
    if not sequential_fold_guard(
        batch_id,
        min(last_batch_id(docs_store), last_batch_id(fp_store)),
        odir,
        rebuilt=has_rebuilt_marker(odir),
    ):
        return _stored()

    with_fp = batch_df.withColumn("fp", normalized_fingerprint(F.col(text_col)))
    # Intra-batch winner per fingerprint: smallest id — deterministic,
    # so a crash-replay recomputes the identical novel set. One
    # batch-sized shuffle.
    w = Window.partitionBy("fp").orderBy(F.col(id_col))
    winners = (
        with_fp.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .cache()  # reused by the touched collect, the probe, both appends
    )
    try:
        return _fold_winners(
            spark, odir, winners, batch_id, n_prefix, fp_store, docs_store, _stored
        )
    finally:
        # covers every exit, including a transient failure in the probe
        # collects — a caller that retries per tick must not strand one
        # cached frame per failed round in the long-lived session
        winners.unpersist()


def _fold_winners(
    spark, odir, winners, batch_id, n_prefix, fp_store, docs_store, _stored
):
    # Driver-side touched-prefix literal (bounded by n_prefix): the
    # membership probe below prunes the index to these partitions at
    # planning time.
    touched = sorted(
        r["p"]
        for r in winners.select(_prefix_of(F.col("fp"), n_prefix).alias("p"))
        .distinct()
        .collect()
    )
    if not touched:
        # Empty micro-batch: nothing novel by construction — sentinel
        # accounting keeps the id sequence gap-free (r18): an upstream
        # gate dropping a whole batch must not make this store look
        # like a foreign checkpoint.
        account_empty_fold(winners, (docs_store, fp_store), batch_id)
        return None
    batch_fps = winners.select("fp")
    if fp_store.exists() and any(fp_store.glob("ingest_batch=*")):
        # Which batch fps exist in history: prefix-pruned index scan,
        # semi-joined against the BROADCAST batch set — the index is
        # streamed map-side, never shuffled, never rewritten.
        hits = history_fps(spark, odir, touched).join(
            F.broadcast(batch_fps), "fp", "left_semi"
        )
        novel = winners.join(F.broadcast(hits), "fp", "left_anti")
    else:
        novel = winners
    novel = novel.cache()
    try:
        # docs BEFORE fp_index (see module docstring's crash argument).
        # BOTH stores are recorded even for an all-duplicate batch (the
        # helper leaves an empty-fold sentinel instead of a data dir), so
        # the min-across-stores guard advances and a fresh-checkpoint
        # renumbered replay skips the batch instead of overwriting
        # committed increments with different content. The contract value
        # stays None when nothing was admitted, so the composed pipeline
        # short-circuits instead of running later gates on zero rows.
        admitted = append_batch_increment(novel, docs_store, batch_id)
        append_batch_increment(
            novel.select(
                "fp", _prefix_of(F.col("fp"), n_prefix).alias("fp_prefix")
            ),
            fp_store,
            batch_id,
            partition_by="fp_prefix",
        )
        if not admitted:
            return None
    finally:
        novel.unpersist()
    return _stored()


def start_dedup_stream(
    spark: SparkSession,
    corpus_dir: str | Path,
    out_dir: str | Path,
    checkpoint_dir: str | Path,
    schema: str,
    id_col: str,
    text_col: str,
    n_prefix: int = 256,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    consolidate_every: int | None = 64,
) -> StreamingQuery:
    """Stream corpus parquet files through against-history exact dedup.
    ``available_now=True`` drains what's landed and stops.
    ``consolidate_every=N`` folds the stores' accumulated batch dirs
    in-stream every N batches (bounded at the previous batch, inside the
    same foreachBatch that owns all writes — no stop window);
    ``None`` reverts to offline-only maintenance."""
    odir = Path(out_dir)
    odir.mkdir(parents=True, exist_ok=True)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(str(corpus_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(
            spark, odir, batch_df, batch_id,
            id_col=id_col, text_col=text_col, n_prefix=n_prefix,
        )
        maybe_consolidate_in_stream(
            spark, _store_map(odir), batch_id, consolidate_every
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", str(checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Stateless filter gate — predicate screening with an audit trail, as a
stream stage.

The simplest member of the gate family (``decontam_stream``,
``dedup_stream``, ``near_dedup_stream``): a pure row predicate splits
each arriving micro-batch into admitted rows (``docs/``) and diverted
rows (``rejected/`` — stored verbatim so the rejection is auditable and
reversible, the same evidence discipline as the decontamination log).
No history, no index, no shuffle beyond the scan: the predicate is a
Catalyst expression evaluated in the same map pass that reads the batch,
so per-batch cost is exactly one O(batch) scan per store write.

The canonical predicate is :func:`gopher_keep` — the Gopher rule family
(Rae et al. 2021): token-count bounds, mean-token-length bounds, and the
most-frequent-token repetition cap, all codegen'd array expressions (the
same family the registered ``quality_gopher_filter`` query reports on).
Any Boolean ``Column`` over the row works.

Exactly-once follows the family recipe: increments keyed by micro-batch
id (tmp + atomic rename, idempotent overwrite), ``docs`` before
``rejected``, replay guard skips batches folded into both, and the
verdict is a pure function of the batch. ``fold_batch`` composes into
``corpus_pipeline_stream`` as the quality stage — cheapest screen first,
so later (stateful) gates never pay for rows a pure predicate would have
dropped.
"""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..batchstore import (
    account_empty_fold,
    append_batch_increment,
    consolidate_batch_store,
    has_rebuilt_marker,
    last_batch_id,
    maybe_consolidate_in_stream,
    read_batch_store,
    sequential_fold_guard,
)
from ..functions.textfn import top_token_fraction

# store name -> partition columns; shared by offline compaction and the
# in-stream consolidation hook so the two can never disagree on layout.
_STORES: tuple[tuple[str, list | None], ...] = (("docs", None), ("rejected", None))


def _store_map(odir: Path) -> dict:
    return {odir / name: part for name, part in _STORES}


def gopher_keep(
    text_col: str,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_top_fraction: float = 0.12,
) -> Column:
    """The Gopher quality rule family as one Boolean Column (defaults per
    Rae et al. 2021; the registered ``quality_gopher_filter`` query uses
    tighter bounds fitted to the synthetic corpus)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    mean_len = F.length(F.array_join(toks, "")).cast("double") / n
    return (
        n.between(min_tokens, max_tokens)
        & (mean_len >= min_mean_len)
        & (mean_len <= max_mean_len)
        & (top_token_fraction(toks) <= max_top_fraction)
    )


def current_admitted_docs(
    spark: SparkSession, out_dir: str | Path
) -> DataFrame | None:
    """Rows the gate admitted so far, or None before the first batch."""
    store = Path(out_dir) / "docs"
    if not store.exists() or not any(store.glob("ingest_batch=*")):
        return None
    return read_batch_store(spark, store).drop("ingest_batch")


def rejected_log(spark: SparkSession, out_dir: str | Path) -> DataFrame | None:
    """Diverted rows, verbatim, or None if nothing was ever rejected."""
    store = Path(out_dir) / "rejected"
    if not store.exists() or not any(store.glob("ingest_batch=*")):
        return None
    return read_batch_store(spark, store).drop("ingest_batch")


def compact_filter_gate_store(
    spark: SparkSession, out_dir: str | Path
) -> dict[str, int]:
    """OFFLINE: fold per-batch dirs of both stores. Run while the gate
    stream is NOT running."""
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
    keep_expr: Column,
) -> DataFrame | None:
    """Screen ONE micro-batch with ``keep_expr``. Returns the admitted
    rows read back from the just-written increment, or None for an empty
    batch. Idempotent: an already-folded batch returns its stored
    increment."""
    odir = Path(out_dir)
    odir.mkdir(parents=True, exist_ok=True)
    docs_store = odir / "docs"
    rej_store = odir / "rejected"

    def _stored() -> DataFrame | None:
        inc = docs_store / f"ingest_batch={batch_id}"
        return spark.read.parquet(str(inc)) if inc.exists() else None

    if not sequential_fold_guard(
        batch_id,
        min(last_batch_id(docs_store), last_batch_id(rej_store)),
        odir,
        rebuilt=has_rebuilt_marker(odir),
    ):
        return _stored()
    batch = batch_df.cache()
    try:
        if not batch.take(1):
            # empty micro-batch: sentinel accounting keeps the id
            # sequence gap-free for the sequential guard (r18)
            account_empty_fold(batch, (docs_store, rej_store), batch_id)
            return None
        # docs BEFORE rejected (replay-guard ordering). Either side may
        # be empty; empty increments are skipped (append_batch_increment)
        # and a replayed fold recomputes the same split.
        append_batch_increment(batch.filter(keep_expr), docs_store, batch_id)
        append_batch_increment(
            batch.filter(~F.coalesce(keep_expr, F.lit(False))), rej_store, batch_id
        )
    finally:
        batch.unpersist()
    return _stored()


def start_filter_gate_stream(
    spark: SparkSession,
    corpus_dir: str | Path,
    out_dir: str | Path,
    checkpoint_dir: str | Path,
    schema: str,
    keep_expr: Column,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    consolidate_every: int | None = 64,
) -> StreamingQuery:
    """Stream corpus parquet files through the predicate gate.
    ``available_now=True`` drains what's landed and stops.
    ``consolidate_every=N`` folds the stores' batch dirs in-stream every
    N batches (no stop-the-stream window); ``None`` = offline-only."""
    odir = Path(out_dir)
    odir.mkdir(parents=True, exist_ok=True)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(str(corpus_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(spark, odir, batch_df, batch_id, keep_expr)
        maybe_consolidate_in_stream(
            spark, _store_map(odir), batch_id, consolidate_every
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", str(checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

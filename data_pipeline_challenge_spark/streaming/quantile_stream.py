"""Maintained exact quantiles — the streaming twin of
``operators/profiling.exact_quantiles``.

Each micro-batch folds its value histogram (group-count by integer
value, O(distinct values) rows per batch) into a ``counts`` batch
store. Histograms ADD, so the maintained store IS the exact
distribution of everything folded — no sketch, no error bound, and the
report equals the batch operator over the concatenated input
(``test_quantile_stream_equals_batch``). State is O(distinct metric
values), which for the integer pipeline metrics this serves (token
counts, document lengths, bin fills) is small and bounded by the
metric's range, not the corpus.

Exactly-once is the simplest in the family: ONE store, so the
``append_batch_increment`` replay guard (skip batches at-or-below the
store's last id) is the whole protocol — there is no summary file and
therefore no commit-point window to read consistently across
(cf. heavy_stream, which needs its snapshot bounded at the summary's
batch id).

Reference parity: no counterpart in the reference (838-LoC ETL, no
analytics surface); north-star extension of the profiling family.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..batchstore import (
    append_batch_increment,
    consolidate_batch_store,
    ensure_store_params,
    has_rebuilt_marker,
    last_batch_id,
    maybe_consolidate_in_stream,
    read_batch_store,
    sequential_fold_guard,
)

_STORES: tuple[tuple[str, list | None], ...] = (("counts", None),)


def _store_map(odir: Path) -> dict:
    return {odir / name: part for name, part in _STORES}


def fold_batch(
    spark: SparkSession,
    out_dir: str | Path,
    batch_df: DataFrame,
    batch_id: int,
    value_col: str,
    group_cols: list[str] | None = None,
) -> None:
    """Fold ONE micro-batch's value histogram (per ``group_cols`` when
    given — grouped histograms add exactly like global ones, so the
    grouped store stays the exact stratified distribution). Idempotent:
    a replayed batch is skipped by the store's last-id guard (its
    increment dir is already the committed content)."""
    odir = Path(out_dir)
    odir.mkdir(parents=True, exist_ok=True)
    params: dict = {"value_col": value_col}
    if group_cols:  # absent key keeps pre-grouped warehouses adoptable
        params["group_cols"] = list(group_cols)
    ensure_store_params(odir, params)
    store = odir / "counts"
    if not sequential_fold_guard(
        batch_id, last_batch_id(store), odir, rebuilt=has_rebuilt_marker(odir)
    ):
        return
    from ..operators.profiling import grouped_value_histogram, value_histogram

    hist = (
        grouped_value_histogram(batch_df, list(group_cols), value_col)
        if group_cols
        else value_histogram(batch_df, value_col)
    )
    append_batch_increment(hist, store, batch_id)


def quantile_report(
    spark: SparkSession,
    out_dir: str | Path,
    fractions: list[tuple[int, int]],
    group_cols: list[str] | None = None,
) -> DataFrame | None:
    """EXACT quantiles of everything folded so far: the batch
    operator's shared core (``profiling.histogram_quantiles`` — ONE
    implementation of the integer pick rule, grouped or global) over
    the maintained histogram store. Pass the same ``group_cols`` the
    stream folds with. None before the first batch."""
    from ..operators.profiling import histogram_quantiles

    store = Path(out_dir) / "counts"
    if not store.exists() or not any(store.glob("ingest_batch=*")):
        return None
    gcs = list(group_cols or ())
    return histogram_quantiles(
        read_batch_store(spark, store).select(*gcs, "v", "n"),
        fractions,
        group_cols=gcs or None,
    )


def compact_quantile_store(
    spark: SparkSession, out_dir: str | Path
) -> dict[str, int]:
    """OFFLINE: fold the counts store's per-batch dirs (run while the
    stream is not). Consolidation unions the increments' rows into one
    directory (duplicate values across increments stay separate rows —
    the report's groupBy(v) sums them); per-batch DIRECTORY count is
    what it bounds, the row count is O(distinct values x folded
    batches) between compactions and the report's first aggregation
    collapses it."""
    odir = Path(out_dir)
    out: dict[str, int] = {}
    for name, part in _STORES:
        store = odir / name
        if store.exists():
            out[name] = consolidate_batch_store(spark, store, partition_by=part)
    return out


def start_quantile_stream(
    spark: SparkSession,
    corpus_dir: str | Path,
    out_dir: str | Path,
    checkpoint_dir: str | Path,
    schema: str,
    value_col: str,
    group_cols: list[str] | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    consolidate_every: int | None = 64,
) -> StreamingQuery:
    """Stream parquet batches into the maintained distribution
    (stratified per ``group_cols`` when given).
    ``available_now=True`` drains what's landed and stops."""
    odir = Path(out_dir)
    odir.mkdir(parents=True, exist_ok=True)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(str(corpus_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(spark, odir, batch_df, batch_id, value_col, group_cols)
        maybe_consolidate_in_stream(
            spark, _store_map(odir), batch_id, consolidate_every
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", str(checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

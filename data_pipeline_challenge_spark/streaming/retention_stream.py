"""Maintained retention-cohort matrix — the streaming twin of
``plans/events.events_retention_weekly`` (the store keeps DAY-granular
activity, the finest view; the report coarsens to any
``days_per_bucket``, weekly included, because floor division composes
and DISTINCT survives coarsening).

The retention matrix is a pure function of the DISTINCT (user, day)
activity set, and distinct sets merge by union — so the maintained
store folds each micro-batch's own (user, day) set (bounded by the
batch's users x days, far under batch volume) and the report recomputes
cohort day (min per user) and offsets over the collapsed union. Raw
events are read exactly once; state is O(users x active days) at any
event volume — the same reduce-to-sufficient-statistics argument as the
quantile histograms (exact, not a sketch: the activity set IS the
sufficient statistic). First-active day needs no separate frontier
store: it is min(day) over the union, and min is associative, so late
batches can only refine it correctly.

Exactly-once follows cms_stream's minimal protocol (one store, last-id
replay guard); consolidation collapses duplicate (user, day) rows via
the fold-time transform.

Reference parity: no counterpart in the reference; north-star extension
of the behavioral family (retention cohorts, r15).
"""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..batchstore import (
    append_batch_increment,
    consolidate_batch_store,
    has_rebuilt_marker,
    last_batch_id,
    maybe_consolidate_in_stream,
    read_batch_store,
    sequential_fold_guard,
)

def _act_set(batch_df: DataFrame) -> DataFrame:
    """The batch's own distinct (user_id, day) activity rows — the one
    definition the fold and any backfill share."""
    # dtype-conditional epoch (ADVICE r15): see catalog.ts_epoch_us
    from ..catalog import epoch_day_expr, ts_epoch_us

    return (
        batch_df.select(
            "user_id", ts_epoch_us(batch_df, "ts").alias("__us")
        )
        .select("user_id", epoch_day_expr("__us").alias("day"))
        .distinct()
    )


def _distinct_rows(df: DataFrame) -> DataFrame:
    return df.select("user_id", "day").distinct()


def fold_batch(
    spark: SparkSession,
    out_dir: str | Path,
    batch_df: DataFrame,
    batch_id: int,
) -> None:
    """Fold ONE micro-batch of events (needs user_id, ts) into the
    activity-set store. Idempotent via the store's last-id guard."""
    odir = Path(out_dir)
    odir.mkdir(parents=True, exist_ok=True)
    store = odir / "act"
    if not sequential_fold_guard(
        batch_id, last_batch_id(store), odir, rebuilt=has_rebuilt_marker(odir)
    ):
        return
    append_batch_increment(_act_set(batch_df), store, batch_id)


def retention_report(
    spark: SparkSession,
    out_dir: str | Path,
    days_per_bucket: int = 1,
) -> DataFrame | None:
    """(cohort_bucket, bucket_offset, n_users) over everything folded —
    identical arithmetic to the batch retention queries on the
    collapsed activity set. ``days_per_bucket=7`` serves the declared
    ``events_retention_weekly`` matrix exactly (floor division
    composes: day-granular activity coarsens to the same week ids the
    batch query derives from raw timestamps, and DISTINCT survives the
    coarsening). None before the first batch."""
    store = Path(out_dir) / "act"
    if not store.exists() or not any(store.glob("ingest_batch=*")):
        return None
    act = _distinct_rows(read_batch_store(spark, store))
    if days_per_bucket != 1:
        d = int(days_per_bucket)
        act = act.select(
            "user_id",
            F.expr(f"(day - pmod(day, {d})) div {d}").alias("day"),
        ).distinct()  # day-granular buckets: plain integer floor-div
    first = act.groupBy("user_id").agg(F.min("day").alias("cohort_bucket"))
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort_bucket",
            (F.col("day") - F.col("cohort_bucket")).alias("bucket_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def compact_retention_store(
    spark: SparkSession, out_dir: str | Path
) -> dict[str, int]:
    """OFFLINE consolidation: duplicate (user, day) rows across
    increments collapse at fold time, so the compacted store holds the
    distinct activity set exactly."""
    store = Path(out_dir) / "act"
    out: dict[str, int] = {}
    if store.exists():
        out["act"] = consolidate_batch_store(
            spark, store, transform=_distinct_rows
        )
    return out


def start_retention_stream(
    spark: SparkSession,
    events_dir: str | Path,
    out_dir: str | Path,
    checkpoint_dir: str | Path,
    schema: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    consolidate_every: int | None = 64,
) -> StreamingQuery:
    """Stream event parquet files into the maintained retention store.
    ``available_now=True`` drains what's landed and stops."""
    odir = Path(out_dir)
    odir.mkdir(parents=True, exist_ok=True)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(str(events_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(spark, odir, batch_df, batch_id)
        maybe_consolidate_in_stream(
            spark,
            {odir / "act": None},
            batch_id,
            consolidate_every,
            transforms={odir / "act": _distinct_rows},
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", str(checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

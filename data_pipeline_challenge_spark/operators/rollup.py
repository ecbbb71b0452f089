"""Incremental time-bucket rollup maintenance (hypertable-style).

A continuous aggregate over an append-only event stream: raw events fold
into per-(bucket, event_type) partial aggregates once, and every later
read — coarser granularities, new batches arriving, backfills — works on
the partials without rescanning raw history. This is the shape that makes
a 100 TB events table queryable: the hourly rollup is ~n_types×n_hours
rows regardless of raw volume, merging a new batch touches only the
buckets the batch lands in, and day/week/month views re-aggregate the
hourly table (bounded) instead of the raw one (unbounded).

Correctness rests on every kept measure being associative + commutative:
counts and integer sums add, min/max fold, so
``merge(rollup(A), rollup(B)) == rollup(A ∪ B)`` exactly. The value sum is
kept as **integer cents** (``floor(value*100 + 0.5)`` per event) — double
sums are only associative up to rounding order, which would make the
incremental path diverge from a full recompute (and from a SQL oracle) in
the last ulp; integer sums make both bit-identical.

Buckets are epoch arithmetic on ``ts_ns`` (timezone-agnostic), matching
plans/events.py conventions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_NS_PER_HOUR = 3600 * 1_000_000_000

# measure columns every rollup level carries
MEASURES = ("n_events", "sum_cents", "min_value", "max_value")


def _floordiv(col_name: str, divisor: int) -> "F.Column":
    """Exact floor division of a long column, entirely in long arithmetic.

    ``F.col(x) / lit`` is double division in Spark; at epoch-nanosecond
    magnitude a double's ulp is 256 ns, so a genuine ns-precision value
    within ~128 ns below a bucket boundary could round ONTO the boundary
    and misbucket vs an exact integer oracle. Subtracting the (always
    non-negative) ``pmod`` remainder first makes the numerator an exact
    multiple, so ``div``'s truncation equals floor for any sign."""
    return F.expr(f"({col_name} - pmod({col_name}, {divisor})) div {divisor}")


def money_cents(col) -> "F.Column":
    """The maintained money-sum stores' shared 2dp-grid quantization:
    ``floor(value*100 + 0.5)`` as BIGINT cents. ONE definition
    (code-review r17 — three hand-rolled copies had emerged across
    rollup/sessions/attribution): every money store's stream==batch
    parity rests on all folds quantizing bit-identically, so the rule
    must not exist in per-module copies that can drift."""
    return F.floor(col * 100 + F.lit(0.5)).cast("bigint")


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Fold raw events (needs ``ts_ns``, ``event_type``, ``value``) into
    per-(hour-bucket, type) partials. One shuffle on the bucket key with
    map-side partial aggregation — the only pass that ever reads raw."""
    return (
        events.select(
            _floordiv("ts_ns", _NS_PER_HOUR).cast("bigint").alias("bucket_hr"),
            "event_type",
            money_cents(F.col("value")).alias("cents"),
            "value",
        )
        .groupBy("bucket_hr", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def merge_rollups(
    existing: DataFrame, delta: DataFrame, key: str = "bucket_hr"
) -> DataFrame:
    """Combine two partial-aggregate tables (e.g. yesterday's rollup + a
    new batch's). Union + re-fold: buckets untouched by the delta pass
    through unchanged; shared buckets combine associatively. At scale both
    sides are already tiny relative to raw, and writing the result
    partitioned by bucket range turns the update into touched-partition
    overwrites only. ``key`` names the bucket column — ``bucket_hr`` for
    hourly tables, ``bucket`` for :func:`reaggregate` output."""
    return (
        existing.unionByName(delta)
        .groupBy(key, "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def reaggregate(rollup: DataFrame, hours_per_bucket: int) -> DataFrame:
    """Coarsen an hourly rollup to ``hours_per_bucket``-hour buckets (24 =
    daily, 168 = weekly) by pure partial-aggregate combination — raw
    events are never touched. The output keeps the same measure columns
    under the key column ``bucket``, so it can itself be merged
    (``merge_rollups(a, b, key="bucket")``) — it cannot be coarsened
    further by this function, whose input key is hourly by definition."""
    return (
        rollup.withColumn(
            "bucket",
            _floordiv("bucket_hr", hours_per_bucket).cast("bigint"),
        )
        .groupBy("bucket", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def repeated_median_trend(hourly: DataFrame) -> DataFrame:
    """Siegel's repeated-median robust trend over an (event_type, h,
    sv) hourly frame — the ONE definition shared by the declared
    ``events_trend_theil_sen_repeated_median`` query (which builds the
    frame from raw events) and :func:`trend_repeated_median` (which
    builds it from a maintained rollup store), so the view and the
    batch query cannot drift (VERDICT r15 #7; the gapfill twins'
    one-core rationale).

    Per hourly point: the median of that point's slopes to every other
    point of its type; the estimate is the median of those per-point
    medians. Both median layers are the DISCRETE ceil(n/2) rank pick
    (a value at a rank, never an interpolation), the outer one
    tie-broken by the point's hour — bit-equal across engines over the
    pre-rounded hourly sums. Shape at scale: the pair join is over the
    HOURLY frame ((span hours)² pairs per type, a function of time,
    not volume) and the largest rank partition is span-hours rows per
    (type, point)."""
    from pyspark.sql import Window

    a, b = hourly.alias("a"), hourly.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.h") != F.col("b.h")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.h").alias("hi"),
        (
            (F.col("b.sv") - F.col("a.sv"))
            / ((F.col("b.h") - F.col("a.h")) / F.lit(3600.0))
        ).alias("slope"),
    )
    wp = Window.partitionBy("event_type", "hi").orderBy("slope")
    wpn = Window.partitionBy("event_type", "hi")
    point_med = (
        slopes.select(
            "event_type",
            "hi",
            "slope",
            F.row_number().over(wp).alias("rn"),
            F.count(F.lit(1)).over(wpn).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", "hi", F.col("slope").alias("m"))
    )
    wm = Window.partitionBy("event_type").orderBy("m", "hi")
    wmn = Window.partitionBy("event_type")
    return (
        point_med.select(
            "event_type",
            "m",
            F.row_number().over(wm).alias("rn"),
            F.count(F.lit(1)).over(wmn).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(
            "event_type",
            F.round("m", 6).alias("trend_per_hour"),
            F.col("n").alias("n_points"),
        )
    )


def trend_repeated_median(
    rollup: DataFrame,
    bucket_col: str = "bucket_hr",
    key_col: str = "event_type",
) -> DataFrame:
    """Repeated-median trend VIEW over a rollup frame (batch
    :func:`hourly_rollup` output or the maintained store's
    ``current_rollup``) — the maintained twin of the declared
    repeated-median query, read-side only: the hourly rollup already
    IS the sufficient statistic, so no extra streaming state exists.

    ``sum_cents / 100.0`` is bit-identical to the declared query's
    ``round(sum(value), 2)`` for 2dp-grid metrics (both are the
    nearest double to the same 2dp decimal — the gapfill_interp
    cross-check precedent), and ``bucket_hr × 3600`` is the query's
    epoch-second hour key, so the view reproduces the batch answer
    exactly on grid-valued events (pinned by
    test_trend_view_over_maintained_rollup_equals_batch)."""
    hourly = rollup.select(
        F.col(key_col).alias("event_type"),
        (F.col(bucket_col) * 3600).cast("long").alias("h"),
        (F.col("sum_cents").cast("double") / F.lit(100.0)).alias("sv"),
    )
    return repeated_median_trend(hourly)


def gapfill_locf(
    rollup: DataFrame,
    bucket_col: str = "bucket_hr",
    key_col: str = "event_type",
) -> DataFrame:
    """Gap-fill + last-observation-carried-forward VIEW over a rollup
    frame (batch :func:`hourly_rollup` output or the maintained store's
    ``current_rollup`` — a read-side transform, so the maintained store
    needs no extra state to serve dense time series).

    Per key: a dense bucket grid from the key's first to last active
    bucket; missing buckets emit n_events=0, sum_cents carried forward
    from the last active bucket, gap_filled=true. All-integer arithmetic
    (buckets and cents), so stream==batch equality is exact.

    Shape at scale: the grid explodes from the per-key SPAN aggregate —
    (keys x span buckets) rows, a function of time, not event volume;
    the LOCF window partitions by key over that bounded grid. The raw
    table is never touched (the input is already the rollup)."""
    from pyspark.sql import Window

    span = rollup.groupBy(key_col).agg(
        F.min(bucket_col).alias("lo"), F.max(bucket_col).alias("hi")
    )
    grid = span.select(
        key_col, F.explode(F.sequence("lo", "hi")).alias(bucket_col)
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(rollup, [key_col, bucket_col], "left").select(
        key_col,
        bucket_col,
        F.coalesce(F.col("n_events"), F.lit(0).cast("long")).alias("n_events"),
        F.last("sum_cents", ignorenulls=True).over(w).alias("sum_cents_locf"),
        F.col("n_events").isNull().alias("gap_filled"),
    )


def gapfill_interp(
    rollup: DataFrame,
    bucket_col: str = "bucket_hr",
    key_col: str = "event_type",
) -> DataFrame:
    """Gap-fill with LINEAR INTERPOLATION over a rollup frame — the
    forward-frontier sibling of :func:`gapfill_locf`, and the maintained
    twin of the declared ``events_gapfill_hourly_interp`` query
    (plans/events.py): because the maintained store IS the full hourly
    rollup (not just a trailing frontier), the forward pass is a
    read-side window over the bounded grid — no extra streaming state.

    Per key: interior gaps take the line between the neighboring
    observed sums (``sum_cents/100.0`` — exactly the 2dp-rounded hourly
    sum for grid-valued metrics, so the view cross-checks against the
    declared query's output); leading/trailing gaps fall back to the
    nearest observation. Output rounds to 6dp like the declared query.

    Shape at scale: identical to LOCF — grid from the per-key SPAN
    aggregate ((keys x span buckets) rows, a function of time, not
    volume); the backward pass is the same bounded window reversed."""
    from pyspark.sql import Window

    span = rollup.groupBy(key_col).agg(
        F.min(bucket_col).alias("lo"), F.max(bucket_col).alias("hi")
    )
    grid = span.select(
        key_col, F.explode(F.sequence("lo", "hi")).alias(bucket_col)
    )
    joined = grid.join(
        rollup.select(key_col, bucket_col, "n_events", "sum_cents"),
        [key_col, bucket_col],
        "left",
    ).withColumn("__sv", F.col("sum_cents").cast("double") / F.lit(100.0))
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t_obs = F.when(F.col("__sv").isNotNull(), F.col(bucket_col))
    filled = joined.select(
        key_col,
        bucket_col,
        "n_events",
        "__sv",
        F.last("__sv", ignorenulls=True).over(w_prev).alias("prev_sv"),
        F.last(t_obs, ignorenulls=True).over(w_prev).alias("prev_t"),
        F.first("__sv", ignorenulls=True).over(w_next).alias("next_sv"),
        F.first(t_obs, ignorenulls=True).over(w_next).alias("next_t"),
    )
    interp = (
        F.when(F.col("__sv").isNotNull(), F.col("__sv"))
        .when(
            F.col("prev_sv").isNotNull() & F.col("next_sv").isNotNull(),
            F.col("prev_sv")
            + (F.col("next_sv") - F.col("prev_sv"))
            * (
                (F.col(bucket_col) - F.col("prev_t")).cast("double")
                / (F.col("next_t") - F.col("prev_t"))
            ),
        )
        .otherwise(F.coalesce("prev_sv", "next_sv"))
    )
    return filled.select(
        key_col,
        bucket_col,
        F.coalesce(F.col("n_events"), F.lit(0).cast("long")).alias("n_events"),
        F.round(interp, 6).alias("sum_value_interp"),
        F.col("__sv").isNull().alias("gap_filled"),
    )

"""Session-interval cores shared by the declared queries and the
maintained session store (one-definition rule: the gap arithmetic and
the hour-grid explode must not exist in per-module copies that drift —
the repeated_median_trend / _bottom_k precedent, self-review r16).

``GAP_US`` is the 10-minute inactivity threshold every session surface
in the repo uses (``events_session_windows``,
``events_active_sessions_per_hour``, ``streaming/sessions_stream``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

GAP_US = 600_000_000  # 10 minutes, the declared queries' threshold


def merge_session_intervals(rows: DataFrame) -> DataFrame:
    """The ONE interval-merge rule (the maintained store's fold, report,
    and consolidation all share it): per user, order intervals
    (user_id, first_us, last_us, n_events, sum_cents) by
    (first_us, last_us), start a new island when first_us − running
    max(last_us) >= GAP_US, then fold each island's
    counts/sums/bounds. Integer microseconds and cents throughout —
    bit-stable under any batch split.

    Shape at scale: the window runs over the INTERVAL rows (users ×
    sessions), not events; the raw table is reduced by the per-batch
    fold's one event-level pass before this ever runs."""
    w = Window.partitionBy("user_id").orderBy("first_us", "last_us")
    prev_max = F.max("last_us").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = rows.withColumn(
        "__new",
        F.when(
            prev_max.isNull()
            | (F.col("first_us") - prev_max >= F.lit(GAP_US)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    island = F.sum("__new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.withColumn("__island", island)
        .groupBy("user_id", "__island")
        .agg(
            F.min("first_us").alias("first_us"),
            F.max("last_us").alias("last_us"),
            F.sum("n_events").alias("n_events"),
            F.sum("sum_cents").alias("sum_cents"),
        )
        .drop("__island")
    )


def active_hours_from_spans(
    spans: DataFrame, start_col: str = "start_s", end_col: str = "end_s"
) -> DataFrame:
    """(hour_s, active_sessions) from session spans in epoch SECONDS —
    the interval-overlap core shared by the declared
    ``events_active_sessions_per_hour`` query and the maintained
    store's serving view. Each span explodes only into the hours its
    OWN length covers (``sequence`` over floor(start/3600)..
    floor(end/3600) — bounded by session length, never the grid); the
    count is one map-side-combinable groupBy. All-integer second/hour
    arithmetic, so both engines agree exactly."""
    hours = spans.select(
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / 3600).cast("long"),
                F.floor(F.col(end_col) / 3600).cast("long"),
            )
        ).alias("hr")
    )
    return hours.groupBy((F.col("hr") * 3600).alias("hour_s")).agg(
        F.count(F.lit(1)).alias("active_sessions")
    )

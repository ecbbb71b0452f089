"""Event-time windowed aggregation — batch/stream-agnostic builders.

The reference stream has no event-time semantics at all (SURVEY §2
"Streaming": arrival order, external counters); these builders add the
standard Spark event-time surface. Each takes any events DataFrame — a
batch frame (what the oracle checks, plans/events.py) or a streaming frame
— and returns the same logical plan; for streaming input a watermark bounds
state so late data beyond ``late_threshold`` is dropped and windows can be
finalized (append mode).

Output boundaries are epoch-second bigints (timezone-agnostic), matching
the batch query inventory.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..catalog import ntz_epoch_us


def _epoch_s(ev: DataFrame, col, ts_col: str = "ts") -> F.Column:
    """Epoch seconds of a window boundary, timezone-agnostic for BOTH
    timestamp flavors. A plain TIMESTAMP denotes an instant, so
    ``unix_timestamp`` is session-zone-independent there; TIMESTAMP_NTZ
    is a wall clock that ``unix_timestamp`` would resolve through
    ``spark.sql.session.timeZone`` (shifting every boundary by the zone
    offset on a session this package did not build) — read it as UTC via
    field arithmetic instead (``catalog.ntz_epoch_us``, which also
    documents the DST-gap hazard of cast-based conversions).

    The flavor is decided by the EVENT-TIME column's dtype (``ts_col`` —
    the column the window was built over, whose flavor the window
    boundaries inherit). A missing ``ts_col`` raises instead of silently
    falling back to the session-zone path: a rename would otherwise
    reintroduce the timezone dependence this helper exists to remove
    (ADVICE r7)."""
    dtypes = dict(ev.dtypes)
    if ts_col not in dtypes:
        raise ValueError(
            f"event-time column {ts_col!r} not in frame (columns: "
            f"{list(dtypes)}); pass ts_col= so the timestamp flavor can "
            "be determined without a session-timezone fallback"
        )
    if dtypes[ts_col] == "timestamp_ntz":
        return (ntz_epoch_us(col) / F.lit(1_000_000)).cast("long")
    return F.unix_timestamp(col)


def _with_watermark(events: DataFrame, late_threshold: str | None) -> DataFrame:
    if events.isStreaming and late_threshold:
        return events.withWatermark("ts", late_threshold)
    return events


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", late_threshold: str | None = "30 minutes"
) -> DataFrame:
    ev = _with_watermark(events, late_threshold)
    return (
        ev.groupBy(F.window("ts", width).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            _epoch_s(ev, F.col("w.start")).alias("window_start_s"),
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    late_threshold: str | None = "30 minutes",
) -> DataFrame:
    ev = _with_watermark(events, late_threshold)
    return (
        ev.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            _epoch_s(ev, F.col("w.start")).alias("window_start_s"),
            "n_events",
            "sum_value",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "10 minutes", late_threshold: str | None = "30 minutes"
) -> DataFrame:
    """Per-user session windows (inactivity gap). In streaming mode the
    watermark is what allows session state to be finalized and evicted —
    unbounded-state sessionization is the classic 100 TB streaming foot-gun."""
    ev = _with_watermark(events, late_threshold)
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            _epoch_s(ev, F.col("w.start")).alias("session_start_s"),
            _epoch_s(ev, F.col("w.end")).alias("session_end_s"),
            "n_events",
            "sum_value",
        )
    )


def dedup_latest_per_key(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Streaming-safe latest-per-key via max_by aggregation (the upsert
    primitive, SURVEY §2 op 12, as a continuously maintained view)."""
    payload = F.struct("ts", "event_id", "event_type", "value")
    return (
        events.groupBy(key)
        .agg(F.max_by(payload, F.struct("ts", "event_id")).alias("last"))
        .select(
            key,
            F.col("last.event_id").alias("last_event_id"),
            F.col("last.event_type").alias("last_type"),
            F.round(F.col("last.value"), 4).alias("last_value"),
        )
    )

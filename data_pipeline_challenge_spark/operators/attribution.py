"""Last-touch conversion attribution — the ONE core the declared batch
query (``plans/events.events_attribution_last_touch``) and its
maintained streaming twin (``streaming/attribution_stream``) share, so
the two surfaces cannot drift (the sessions/trend precedent: one
definition, two callers).

Semantics (marketing-analytics last-touch): each conversion credits the
same user's most recent touch at-or-before the conversion instant
(backward as-of; a touch at the exact conversion timestamp counts),
provided it falls within ``lookback_us``; otherwise the conversion is
``'direct'``. Touches colliding on (user, instant) dedupe FIRST — max
event id wins and its type rides (:func:`touch_rollup`) — so the
attributed type is deterministic under any partitioning, and any
oracle must apply the same tie rule (the batch query's DuckDB twin
uses ``arg_max``).

Everything runs on timezone-agnostic EPOCH-MICROSECOND longs
(``catalog.ts_epoch_us`` at the callers) rather than raw timestamps:
the epoch mapping is injective at the events' µs precision, so
ordering, (user, instant) tie groups, and the lookback difference are
all preserved exactly — and the maintained fold can compare instants
across micro-batches folded under different session timezones (the
transition-frontier discipline).

Shape at scale: the as-of is ``operators/asof.asof_join``'s union +
one (user)-keyed window — one shuffle, no range explosion; the touch
rollup is one map-side-combinable aggregate.

Reference parity: none — north-star extension of the events family
(VERDICT r16 #5 wires the maintained twin).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .asof import asof_join

#: The batch query's 30-minute lookback, in epoch microseconds.
LOOKBACK_US = 1_800_000_000


def touch_rollup(
    touches: DataFrame,
    user_col: str = "user_id",
    ts_us_col: str = "t_us",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """One touch row per (user, instant): max event id wins, its type
    rides — the engine tie rule for touches colliding on a timestamp.
    Returns (user_col, ts_us_col, t_event_id, t_type)."""
    return touches.groupBy(user_col, ts_us_col).agg(
        F.max(id_col).alias("t_event_id"),
        F.max_by(type_col, id_col).alias("t_type"),
    )


def attribute_conversions(
    conv: DataFrame,
    touches: DataFrame,
    lookback_us: int = LOOKBACK_US,
    user_col: str = "user_id",
    conv_ts_us_col: str = "c_us",
) -> DataFrame:
    """Attach ``attributed`` to each conversion row: the latest
    same-user touch type with ``t_us <= c_us`` and within
    ``lookback_us``, else ``'direct'``. ``touches`` must already be
    deduped per (user, instant) by :func:`touch_rollup`'s tie rule.
    All of ``conv``'s columns ride through."""
    j = asof_join(
        conv,
        touches,
        key=user_col,
        left_ts=conv_ts_us_col,
        right_ts="t_us",
        right_payload=["t_type", "t_us"],
        suffix="",
        right_tiebreak="t_event_id",
    )
    attributed = F.when(
        F.col("t_us").isNotNull()
        & (F.col(conv_ts_us_col) - F.col("t_us") <= F.lit(int(lookback_us))),
        F.col("t_type"),
    ).otherwise(F.lit("direct"))
    return j.withColumn("attributed", attributed).drop("t_type", "t_us")

"""Custom stateful streaming operator via applyInPandasWithState.

The reference keeps its only processing state (per-file counters) in
MongoDB, incremented by concurrent workers
(/root/reference/app/processing/data_processor.py:115-124). Spark-native
equivalent: keyed state managed by the engine itself — checkpointed,
rescalable, no external store. This module implements a per-user running
aggregate (count / sum / last event time) as a GroupState operator, the
pattern for any custom accumulator the built-in windowed aggs can't
express.

Works in both worlds:
- streaming: ``running_user_stats(stream_df)`` — incremental GroupState
  updates per micro-batch. State is deliberately NOT timed out
  (``GroupStateTimeout.NoTimeout``): these are lifetime running totals,
  and evicting a user's state would silently reset their counts — an
  operator wanting TTL eviction (e.g. sessionization) would use
  ``ProcessingTimeTimeout`` and re-emit on expiry instead;
- batch: the same output computed with one groupBy, for oracle/testing
  parity (``running_user_stats_batch``).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, last_event_us long"
STATE_SCHEMA = "n long, s double, last_us long"


def _make_round_half_up():
    """HALF_UP rounding matching Spark's ``F.round`` on doubles (which
    rounds BigDecimal.valueOf(double) HALF_UP). Python's builtin
    ``round`` is banker's rounding — it disagrees at exact .005
    boundaries (round(0.125, 2) = 0.12 vs F.round = 0.13), which would
    break the advertised stream==batch parity. Returned as a standalone
    function so state-update closures capture it BY VALUE (cloudpickle)
    and stay self-contained on executors."""

    def _round_half_up(x: float, digits: int = 2) -> float:
        import decimal as _d

        q = _d.Decimal(1).scaleb(-digits)
        return float(_d.Decimal(repr(x)).quantize(q, rounding=_d.ROUND_HALF_UP))

    return _round_half_up


def _make_update():
    """Build the GroupState update function as a self-contained closure
    (pickled by value — executors need no package install, same rationale
    as sources/json_ingest.py)."""
    import pandas as _pd

    _round_half_up = _make_round_half_up()

    def update(key, pdfs, state):
        (user_id,) = key
        if state.exists:
            n, s, last_us = state.get
        else:
            n, s, last_us = 0, 0.0, 0
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            if len(pdf):
                # ts arrives as datetime64 (ns or us depending on
                # pandas/Arrow); normalize to epoch micros (tz-free)
                us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
                last_us = max(last_us, int(us.max()))
        state.update((n, s, last_us))
        yield _pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [_round_half_up(s)],
                "last_event_us": [last_us],
            }
        )

    return update


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming: continuously updated per-user totals (GroupState).

    Update output mode: each micro-batch emits the refreshed rows for the
    users it touched. State is O(users) and engine-checkpointed."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update(),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_stats_batch(events: DataFrame) -> DataFrame:
    """Batch reference implementation of the same semantics (one groupBy).

    ``last_event_us`` must be timezone-agnostic like the streaming
    closure's wall-clock-as-UTC arithmetic: ``unix_micros`` on a
    TIMESTAMP_NTZ column resolves through the session zone, so NTZ input
    goes through ``catalog.ntz_epoch_us`` instead."""
    from ..catalog import ts_epoch_us

    ts_us = ts_epoch_us(events, "ts")
    return (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.max(ts_us).alias("last_event_us"),
        )
        .select("user_id", "n_events", "sum_value", "last_event_us")
    )


def _make_processor():
    """Build the Spark 4 ``StatefulProcessor`` twin of the GroupState
    update function. Defined inside a factory so the class cloudpickles by
    value (repo closure convention)."""
    import pandas as _pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    _round_half_up = _make_round_half_up()

    class RunningUserStats(StatefulProcessor):
        def init(self, handle):
            self._state = handle.getValueState(
                "totals", "n long, s double, last_us long"
            )

        def handleInputRows(self, key, rows, timer_values):
            (user_id,) = key
            got = self._state.get()
            n, s, last_us = got if got is not None else (0, 0.0, 0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
                if len(pdf):
                    us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
                    last_us = max(last_us, int(us.max()))
            self._state.update((n, s, last_us))
            yield _pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "sum_value": [_round_half_up(s)],
                    "last_event_us": [last_us],
                }
            )

        def close(self):
            pass

    return RunningUserStats()


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """The same running per-user totals on the Spark 4
    ``transformWithStateInPandas`` API (typed per-key ValueState, timer
    support, rescalable RocksDB-backed state) — the successor to
    applyInPandasWithState; both are kept so the engine covers each
    stateful API generation. Semantics identical to
    :func:`running_user_stats`; the stream==batch equivalence test drives
    both against :func:`running_user_stats_batch`.

    Runtime requirements: the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and the
    ``protobuf`` package (the TWS driver worker's control channel) — the
    test skips where protobuf is absent; applyInPandasWithState is the
    path exercised everywhere."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_make_processor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )

"""Event-time windowing queries over the ``events`` table.

The reference pipeline is a stream with NO event-time semantics (arrival
order only, external counters — SURVEY.md §2 "Streaming"); these queries add
the event-time surface a Spark engine provides: tumbling / sliding / session
windows, latest-per-key dedup (the upsert primitive), JSON extraction.

Every window boundary is emitted as **epoch seconds (bigint)** computed by
pure arithmetic on the internal microsecond value — the output is identical
under any driver session timezone, which a raw TimestampType column would
not be. The same queries run unchanged as Structured Streaming plans (see
``streaming/windows.py``); batch mode here is what the oracle can check.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import epoch_day_expr, load_events
from .registry import query

# DuckDB-side epoch seconds for a naive timestamp, truncating toward -inf
# (all test timestamps are post-1970 so integer division is fine).
_DUCK_EPOCH_S = "(epoch_us(ts) // 1000000)"


@query(
    "events_tumbling_hour",
    f"""
    SELECT ({_DUCK_EPOCH_S} // 3600) * 3600 AS window_start_s,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY window_start_s
    """,
    tags=("events", "window-time"),
    bench=True,
)
def events_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregate via Spark's native window() —
    epoch-aligned buckets, partial-aggregated map-side like any groupBy."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "events_sliding_hour",
    f"""
    WITH buckets AS (
        SELECT ({_DUCK_EPOCH_S} // 1800) * 1800 AS window_start_s, value FROM events
        UNION ALL
        SELECT ({_DUCK_EPOCH_S} // 1800) * 1800 - 1800 AS window_start_s, value FROM events
    )
    SELECT window_start_s, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM buckets GROUP BY window_start_s
    """,
    tags=("events", "window-time"),
)
def events_sliding_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 min (each event lands in 2 windows).
    The oracle expresses the same thing as an explicit 2-way bucket union."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "events_session_windows",
    f"""
    WITH marked AS (
        SELECT user_id, event_id, {_DUCK_EPOCH_S} AS t_s, epoch_us(ts) AS t_us, value,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) >= 600000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        -- the running sum MUST use the same (t_us, event_id) order as the
        -- lag above: ordered by t_us alone, two equal-timestamp events
        -- could straddle a session boundary nondeterministically (the
        -- flag-carrying row placed second), splitting what Spark's
        -- session_window merges
        SELECT user_id, t_s, t_us, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked
    )
    SELECT user_id,
           min(t_s) AS session_start_s,
           (max(t_us) + 600000000) // 1000000 AS session_end_s,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM sessions GROUP BY user_id, session_id
    """,
    tags=("events", "window-time", "session"),
    bench=True,
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows, 10-minute inactivity gap, via Spark's
    native session_window(). Session end = last event + gap. The oracle is
    the classic gaps-and-islands rewrite (lag + running sum), which is also
    the portable formulation on engines without session windows."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start_s"),
            F.unix_timestamp(F.col("w.end")).alias("session_end_s"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "events_latest_per_user",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_type,
           round(value, 4) AS last_value
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    tags=("events", "window", "dedup"),
)
def events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per key — the exact dedup-to-latest primitive our keyed
    merge uses for the reference's upsert (SURVEY §2 op 12)."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ev = load_events(spark, sf_dir)
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
            F.round("value", 4).alias("last_value"),
        )
    )


@query(
    "events_pivot_type_counts",
    """
    SELECT user_id,
           count(CASE WHEN event_type = 'click'    THEN 1 END) AS n_click,
           count(CASE WHEN event_type = 'view'     THEN 1 END) AS n_view,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
           count(CASE WHEN event_type = 'signup'   THEN 1 END) AS n_signup,
           count(CASE WHEN event_type = 'error'    THEN 1 END) AS n_error,
           count(*) AS n_total
    FROM events GROUP BY user_id
    """,
    tags=("events", "pivot", "agg"),
)
def events_pivot_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type histogram (conditional aggregation — one pass)."""
    ev = load_events(spark, sf_dir)

    def n(t: str):
        return F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")

    return ev.groupBy("user_id").agg(
        n("click"), n("view"), n("purchase"), n("signup"), n("error"),
        F.count(F.lit(1)).alias("n_total"),
    )


@query(
    "events_json_extract",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events WHERE event_id < 2000
    """,
    tags=("events", "json", "scalar"),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the semi-structured props column — the
    engine's bronze-layer pattern for the reference's `extra = "allow"`
    schemaless fields (SURVEY §1.3 option 3)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.filter(F.col("event_id") < 2000)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        )
    )


@query(
    "events_asof_purchase_signup",
    """
    SELECT p.event_id, p.user_id,
           s.event_id AS signup_event_id_asof,
           (epoch_us(p.ts) - epoch_us(s.ts)) // 1000000 AS secs_since_signup
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
        -- mirror the engine's tie rule: equal (user_id, ts) → max event_id
        SELECT user_id, ts, max(event_id) AS event_id
        FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
    ) s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    tags=("events", "asof", "join"),
    bench=True,
)
def events_asof_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase matched to the user's most recent
    prior signup (operators/asof.py — the union+window formulation; the
    oracle is DuckDB's native ASOF JOIN)."""
    from ..operators.asof import asof_join

    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("s_event_id"), "user_id", F.col("ts").alias("s_ts")
    )
    joined = asof_join(
        purchases, signups, key="user_id", left_ts="ts", right_ts="s_ts",
        right_payload=["s_event_id", "s_ts"], suffix="",
        right_tiebreak="s_event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("s_event_id").alias("signup_event_id_asof"),
        F.floor(
            (F.unix_micros("ts") - F.unix_micros("s_ts")) / F.lit(1_000_000)
        ).cast("long").alias("secs_since_signup"),
    )


@query(
    "events_rate_by_type",
    """
    SELECT event_type, count(*) AS n_events,
           round(avg(value), 4) AS avg_value,
           round(stddev_samp(value), 4) AS sd_value,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    tags=("events", "agg"),
)
def events_rate_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type statistics incl. sample stddev and distinct users."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.stddev_samp("value"), 4).alias("sd_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "events_retention_weekly",
    """
    WITH t AS (
        SELECT DISTINCT user_id,
               CAST(epoch_ns(ts) // (CAST(7 AS BIGINT) * 86400 * 1000000000)
                    AS BIGINT) AS wk
        FROM events
    ), f AS (
        SELECT user_id, min(wk) AS cohort_wk FROM t GROUP BY user_id
    )
    SELECT f.cohort_wk, t.wk - f.cohort_wk AS weeks_since,
           count(*) AS n_users
    FROM t JOIN f ON t.user_id = f.user_id
    GROUP BY 1, 2
    """,
    tags=("events", "retention", "agg"),
    bench=True,
)
def events_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users bucketed by first-activity week,
    counted in every later week they return. Week ids are pure epoch
    integer division on ``ts_ns`` — timezone-agnostic by construction
    (calendar month/day extraction would read differently under the
    driver's unknown session timezone). Two keyed aggregations joined on
    user_id — the same shuffle key throughout, so the exchanges line up
    (and vanish on a user-bucketed table). The distinct-per-week set is
    reduced BEFORE the join, so the join input is (users × active weeks),
    not raw events."""
    ev = load_events(spark, sf_dir)
    # exact long floor division — double division misbuckets genuine
    # ns-precision values within an ulp of a week boundary
    _wk_ns = 7 * 86400 * 1_000_000_000
    wk = F.expr(f"(ts_ns - pmod(ts_ns, {_wk_ns})) div {_wk_ns}").cast("bigint")
    t = ev.select("user_id", wk.alias("wk")).distinct()
    f = t.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        t.join(f, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("weeks_since"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "events_rollup_day_from_hour",
    """
    SELECT CAST(epoch_ns(ts) // (CAST(86400 AS BIGINT) * 1000000000)
                AS BIGINT) AS bucket,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events GROUP BY 1, 2
    """,
    tags=("events", "rollup", "incremental"),
)
def events_rollup_day_from_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily continuous-aggregate view computed the hypertable way: fold
    raw events into the hourly rollup once (operators/rollup.py), then
    re-aggregate the partials 24→1 — raw is scanned exactly once and the
    day view touches only ~n_types×n_hours rows. The oracle aggregates
    raw straight to days; hash equality proves the two-level partial
    fold is exactly associative (integer-cent sums, count, min/max)."""
    from ..operators.rollup import hourly_rollup, reaggregate

    ev = load_events(spark, sf_dir)
    return reaggregate(hourly_rollup(ev), 24)


@query(
    "events_user_sequences",
    """
    WITH o AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_events
        FROM events
    )
    SELECT user_id,
           CAST(max(n_events) AS BIGINT) AS n_events,
           string_agg(event_type, ' ' ORDER BY rn) AS seq_prefix
    FROM o WHERE rn <= 16
    GROUP BY user_id
    """,
    tags=("events", "sequence"),
)
def events_user_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-sequence assembly — turning an event log into ordered
    per-user training sequences (the shape a recommender / behavioral-LM
    pipeline feeds a tokenizer): each user's first 16 event types in
    (ts, event_id) order as one string, plus the user's TOTAL event
    count. Scale shape: the prefix cut is a windowed row_number filter
    BEFORE any collect, so the per-group array is bounded at 16
    regardless of how hot a user is — never collect-then-truncate."""
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts_ns"), F.col("event_id"))
    wc = Window.partitionBy("user_id")
    t = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_events"),
    )
    ordered = F.array_sort(F.collect_list(F.struct("rn", "event_type")))
    return (
        t.filter(F.col("rn") <= 16)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.concat_ws(
                " ", F.transform(ordered, lambda s: s["event_type"])
            ).alias("seq_prefix"),
        )
    )



def _hourly_grid(ev: DataFrame, agg_cols: "list"):
    """Shared gap-fill scaffold for the LOCF and interpolation fills:
    hourly pre-agg (the only raw-data shuffle, map-side combinable) →
    per-type span aggregate → sequence()-exploded dense grid → left
    join. Grid size is (types x span hours) — a function of TIME, not
    event volume. Returns the grid⋈hourly frame."""
    hourly = ev.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600) * 3600).alias("hour_s"),
    ).agg(*agg_cols)
    span = hourly.groupBy("event_type").agg(
        F.min("hour_s").alias("lo"), F.max("hour_s").alias("hi")
    )
    grid = span.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.lit(3600).cast("long"))).alias("hour_s"),
    )
    return grid.join(hourly, ["event_type", "hour_s"], "left")


@query(
    "events_gapfill_hourly_locf",
    f"""
    WITH hourly AS (
        SELECT event_type, ({_DUCK_EPOCH_S} // 3600) * 3600 AS hour_s,
               count(*) AS n, round(sum(value), 2) AS sv
        FROM events GROUP BY event_type, hour_s
    ), span AS (
        SELECT event_type, min(hour_s) AS lo, max(hour_s) AS hi
        FROM hourly GROUP BY event_type
    ), grid AS (
        SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS hour_s
        FROM span
    )
    SELECT g.event_type, g.hour_s,
           coalesce(h.n, 0) AS n_events,
           last_value(h.sv IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hour_s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS sum_value_locf,
           (h.hour_s IS NULL) AS gap_filled
    FROM grid g LEFT JOIN hourly h USING (event_type, hour_s)
    """,
    tags=("events", "window-time", "gapfill"),
    bench=True,
)
def events_gapfill_hourly_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap-fill: per event_type, a dense hourly grid
    from the type's first to last active hour, missing buckets emitted
    with n_events=0 and the last observed hourly sum carried forward
    (LOCF) — the `time_bucket_gapfill` + `locf` shape time-series stores
    provide, expressed as declarative Spark.

    Shape at scale: the only raw-data shuffle is the hourly pre-agg
    (map-side combinable, output = active (type, hour) pairs). The grid
    is `sequence()`-exploded from the per-type span aggregate — its size
    is (types x span hours), a function of TIME, not of event volume, so
    a 100 TB event log gap-fills over the same few-thousand-row grid.
    The LOCF window partitions by event_type over that bounded grid;
    for high-cardinality keys (per-user grids) the same plan shards by
    key. Hourly sums are rounded to 2 BEFORE the carry-forward so the
    propagated value is byte-identical across engines; leading grid rows
    before a type's first sum are NULL on both sides."""
    ev = load_events(spark, sf_dir)
    filled = _hourly_grid(
        ev, [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv")]
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        filled
        .select(
            "event_type",
            "hour_s",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.last("sv", ignorenulls=True).over(w).alias("sum_value_locf"),
            F.col("n").isNull().alias("gap_filled"),
        )
    )


@query(
    "events_attribution_last_touch",
    """
    WITH conv AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    ), t AS (
        -- one touch row per (user, ts): max event_id wins, its type rides
        SELECT user_id, ts, max(event_id) AS t_event_id,
               arg_max(event_type, event_id) AS t_type
        FROM events WHERE event_type IN ('click', 'view')
        GROUP BY user_id, ts
    ), j AS (
        SELECT c.event_id, c.value,
               CASE WHEN t.ts IS NOT NULL
                         AND epoch_us(c.ts) - epoch_us(t.ts) <= 1800000000
                    THEN t.t_type ELSE 'direct' END AS attributed
        FROM conv c ASOF LEFT JOIN t
          ON c.user_id = t.user_id AND c.ts >= t.ts
    )
    SELECT attributed, count(*) AS n_conversions,
           round(sum(value), 2) AS attributed_value
    FROM j GROUP BY attributed
    """,
    tags=("events", "asof", "attribution"),
    bench=True,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase credits the
    user's most recent click/view within a 30-minute lookback (as-of
    join + window cut), else 'direct' — the marketing-analytics shape of
    the backward as-of join. Touches colliding on (user, ts) dedupe to
    the max event_id BEFORE the as-of (the engine tie rule, mirrored in
    the oracle with arg_max), so the attributed type is deterministic.

    Since r17 the tie rule, as-of, and lookback live in ONE shared core
    (``operators/attribution.py``) this query and the MAINTAINED twin
    (``streaming/attribution_stream.py`` — resequenced, late-arrival-
    tolerant) both call, on timezone-agnostic epoch-µs longs (injective
    at the events' µs precision, so ordering/ties/lookback are exactly
    the raw-timestamp semantics the oracle computes).

    Shape at scale: the as-of is operators/asof.py's union + one
    (user_id)-keyed window — one shuffle, no range explosion; the
    lookback cut is a post-join filter; the report is a 3-row
    aggregate."""
    from ..catalog import ts_epoch_us
    from ..operators.attribution import attribute_conversions, touch_rollup

    ev = load_events(spark, sf_dir)
    t_us = ts_epoch_us(ev, "ts")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", t_us.alias("c_us"), "value"
    )
    touches = touch_rollup(
        ev.filter(F.col("event_type").isin("click", "view")).select(
            "user_id", t_us.alias("t_us"), "event_id", "event_type"
        )
    )
    return (
        attribute_conversions(conv, touches)
        .groupBy("attributed")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.round(F.sum("value"), 2).alias("attributed_value"),
        )
    )


@query(
    "events_type_transition_matrix",
    """
    WITH seq AS (
        SELECT user_id, event_type AS cur,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS nxt
        FROM events
    ), pairs AS (
        SELECT cur, nxt, count(*) AS n FROM seq
        WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ), totals AS (
        SELECT cur, sum(n) AS n_cur FROM pairs GROUP BY cur
    )
    SELECT p.cur, p.nxt, p.n,
           round(CAST(p.n AS DOUBLE) / t.n_cur, 6) AS prob
    FROM pairs p JOIN totals t USING (cur)
    """,
    tags=("events", "window", "sequence"),
)
def events_type_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences — the behavioral-model summary (and the bigram-LM shape of
    plans/text.py applied to event streams). (ts, event_id) orders ties
    deterministically on both engines.

    Shape at scale: one user-keyed window pass for lead() (state = one
    row), then two bounded aggregations (pairs <= |types|² = 25 rows);
    the probability normalization joins the 5-row totals frame — nothing
    after the window is corpus-sized."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    pairs = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("cur").agg(F.sum("n").alias("n_cur"))
    return pairs.join(F.broadcast(totals), "cur").select(
        "cur",
        "nxt",
        "n",
        F.round(F.col("n").cast("double") / F.col("n_cur"), 6).alias("prob"),
    )


@query(
    "events_active_sessions_per_hour",
    f"""
    WITH marked AS (
        SELECT user_id, event_id, epoch_us(ts) AS t_us,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) >= 600000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, t_us,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked
    ), spans AS (
        SELECT user_id, session_id,
               min(t_us) // 1000000 AS start_s,
               (max(t_us) + 600000000) // 1000000 AS end_s
        FROM sessions GROUP BY user_id, session_id
    ), hours AS (
        SELECT unnest(generate_series(start_s // 3600, end_s // 3600)) AS hr
        FROM spans
    )
    SELECT hr * 3600 AS hour_s, count(*) AS active_sessions
    FROM hours GROUP BY hour_s
    """,
    tags=("events", "window-time", "session", "interval"),
)
def events_active_sessions_per_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap aggregation: per hour, how many user sessions
    (10-min-gap session windows, end = last event + gap — the same
    definition as events_session_windows) were active at any point in
    that hour — the concurrency report capacity planning reads off an
    event log.

    Shape at scale: sessions are the usual gaps-and-islands fold (one
    user-keyed window pass + one aggregation); the hour explode and
    count are the shared ``operators/sessions.active_hours_from_spans``
    core (also serving the maintained session store's view — one
    definition, r16): each session explodes only into the hours its
    OWN span covers, and the final count is one map-side-combinable
    groupBy. All-integer second/hour arithmetic, so both engines agree
    exactly."""
    from ..operators.sessions import active_hours_from_spans

    ev = load_events(spark, sf_dir)
    sessions = ev.groupBy(
        "user_id", F.session_window("ts", "10 minutes").alias("w")
    ).agg(
        F.unix_timestamp(F.col("w.start")).alias("start_s"),
        F.unix_timestamp(F.col("w.end")).alias("end_s"),
    )
    return active_hours_from_spans(sessions, "start_s", "end_s")


@query(
    "events_gapfill_hourly_interp",
    f"""
    WITH hourly AS (
        SELECT event_type, ({_DUCK_EPOCH_S} // 3600) * 3600 AS hour_s,
               round(sum(value), 2) AS sv
        FROM events GROUP BY event_type, hour_s
    ), span AS (
        SELECT event_type, min(hour_s) AS lo, max(hour_s) AS hi
        FROM hourly GROUP BY event_type
    ), grid AS (
        SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS hour_s
        FROM span
    ), filled AS (
        SELECT g.event_type, g.hour_s, h.sv,
               last_value(h.sv IGNORE NULLS) OVER w_prev AS prev_sv,
               last_value(CASE WHEN h.sv IS NOT NULL THEN g.hour_s END
                          IGNORE NULLS) OVER w_prev AS prev_t,
               first_value(h.sv IGNORE NULLS) OVER w_next AS next_sv,
               first_value(CASE WHEN h.sv IS NOT NULL THEN g.hour_s END
                           IGNORE NULLS) OVER w_next AS next_t
        FROM grid g LEFT JOIN hourly h USING (event_type, hour_s)
        WINDOW w_prev AS (PARTITION BY g.event_type ORDER BY g.hour_s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w_next AS (PARTITION BY g.event_type ORDER BY g.hour_s
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, hour_s,
           round(CASE
               WHEN sv IS NOT NULL THEN sv
               WHEN prev_sv IS NOT NULL AND next_sv IS NOT NULL THEN
                   prev_sv + (next_sv - prev_sv)
                   * (CAST(hour_s - prev_t AS DOUBLE) / (next_t - prev_t))
               ELSE coalesce(prev_sv, next_sv)
           END, 6) AS sum_value_interp,
           (sv IS NULL) AS gap_filled
    FROM filled
    """,
    tags=("events", "window-time", "gapfill"),
)
def events_gapfill_hourly_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill with LINEAR INTERPOLATION — the `interpolate()` sibling
    of events_gapfill_hourly_locf: interior gaps take the line between
    the neighboring observed hourly sums, leading/trailing gaps fall
    back to the nearest observation. Interpolation arithmetic is one
    subtraction, one integer-ratio division, one multiply-add — fixed
    order on both engines over the pre-rounded (2dp) hourly sums, so
    the 6dp output hash-matches.

    Shape at scale: identical to the LOCF form (grid from the span
    aggregate, two bounded windows per key instead of one — the
    backward pass is the same window reversed)."""
    ev = load_events(spark, sf_dir)
    joined = _hourly_grid(ev, [F.round(F.sum("value"), 2).alias("sv")])
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hour_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("hour_s")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t_obs = F.when(F.col("sv").isNotNull(), F.col("hour_s"))
    filled = joined.select(
        "event_type",
        "hour_s",
        "sv",
        F.last("sv", ignorenulls=True).over(w_prev).alias("prev_sv"),
        F.last(t_obs, ignorenulls=True).over(w_prev).alias("prev_t"),
        F.first("sv", ignorenulls=True).over(w_next).alias("next_sv"),
        F.first(t_obs, ignorenulls=True).over(w_next).alias("next_t"),
    )
    interp = (
        F.when(F.col("sv").isNotNull(), F.col("sv"))
        .when(
            F.col("prev_sv").isNotNull() & F.col("next_sv").isNotNull(),
            F.col("prev_sv")
            + (F.col("next_sv") - F.col("prev_sv"))
            * (
                (F.col("hour_s") - F.col("prev_t")).cast("double")
                / (F.col("next_t") - F.col("prev_t"))
            ),
        )
        .otherwise(F.coalesce("prev_sv", "next_sv"))
    )
    return filled.select(
        "event_type",
        "hour_s",
        F.round(interp, 6).alias("sum_value_interp"),
        F.col("sv").isNull().alias("gap_filled"),
    )


@query(
    "events_top_daily_paths",
    """
    WITH base AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day,
               epoch_us(ts) AS t, event_id, event_type
        FROM events
    ), ranked AS (
        SELECT user_id, day, event_type,
               row_number() OVER (PARTITION BY user_id, day
                                  ORDER BY t, event_id) AS rn
        FROM base
    ), paths AS (
        SELECT user_id, day,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM ranked WHERE rn <= 3 GROUP BY user_id, day
    )
    SELECT path, count(*) AS n_user_days
    FROM paths GROUP BY path
    ORDER BY n_user_days DESC, path LIMIT 20
    """,
    tags=("events", "behavioral", "paths", "window"),
    bench=True,
)
def events_top_daily_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the top starting event-type PATHS (first three
    events of each user-day, in event-time order, joined with '>') —
    the "how do sessions begin" report that complements the transition
    matrix (Markov pairs lose the ordering beyond one step). Total
    (t, event_id) order makes every path deterministic; counts are
    integers.

    Shape at scale: the rank filter (rn <= 3) compiles to
    WindowGroupLimit over the high-cardinality (user, day) key —
    partial per-partition top-3 before the shuffle, no user-day ever
    sorts more than its own events; path assembly aggregates ≤3-row
    groups; the final count is map-side-combinable with a
    TakeOrderedAndProject top-20."""
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    base = ev.select(
        "user_id",
        epoch_day_expr("unix_micros(ts)").alias("day"),
        F.unix_micros("ts").alias("t"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id", "day").orderBy("t", "event_id")
    ranked = base.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 3
    )
    paths = ranked.groupBy("user_id", "day").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("rn"), F.col("event_type")))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_user_days"))
        .orderBy(F.col("n_user_days").desc(), "path")
        .limit(20)
    )

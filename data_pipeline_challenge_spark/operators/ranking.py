"""Distributed global-order ranking: row_number / ntile / percent_rank over
a TOTAL ordering without a single-partition window.

Spark executes an un-partitioned window (``OVER (ORDER BY ...)``) by moving
the entire input to ONE partition — fine at test scale, fatal at 100 TB.
But a global rank only needs two facts per row: its range partition's
offset and its position within that partition. So:

1. ``repartitionByRange`` on the order keys — a distributed sort shuffle,
   the same work any global sort pays; materialized once so both passes see
   identical partitioning.
2. One tiny per-partition count aggregation → cumulative offsets (K rows
   for K partitions, collected to the driver and broadcast back).
3. A window partitioned BY PARTITION ID (fully parallel) for the local row
   number, plus the broadcast offset.

For ROW_NUMBER/ntile/cumsum the order keys must be a total order (include
a unique tiebreaker) — the registry's determinism rule for every ranked
query; with ties those are order-dependent exactly as SQL's row_number
is. :func:`with_grouped_rank_stats` is tie-CORRECT regardless: it
computes true ``rank()`` and tie counts locally (equal order keys always
co-locate — a range partitioner assigns a partition by key value, so a
tie run can never straddle a partition boundary) and both extra window
expressions share the local window's partitioning, costing no shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

_PID = "__rank_pid"
_OFF = "__rank_offset"

# Driver-collect guard for the per-(partition, group) offset cells: the
# protocol is designed for LOW-cardinality strata (source, nation,
# event_type) where the cell table is partitions + groups rows. A
# high-cardinality group key (user_id) would silently collect O(groups)
# rows to the driver — refuse loudly instead (ADVICE r15). The probe
# collects at most the cap + 1 rows (limit BEFORE collect), so the guard
# itself cannot OOM the driver it protects.
MAX_OFFSET_CELLS = 262_144


def with_global_row_number(
    df: DataFrame,
    order_by: Sequence[str | Column],
    out: str = "rn",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Add a 1-based global row number ``out`` under the total order
    ``order_by``. Returns (df, total_row_count) — the total falls out of
    the offset pass for free, and ntile/percent_rank need it.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if num_partitions:
        part = df.repartitionByRange(num_partitions, *cols)
    else:
        part = df.repartitionByRange(*cols)
    # Pin the partitioning: the count pass and the rank pass must see the
    # exact same row→partition assignment.
    part = part.withColumn(_PID, F.spark_partition_id()).localCheckpoint(eager=True)

    sizes = {
        r[_PID]: r["cnt"]
        for r in part.groupBy(_PID).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    total, offsets = 0, []
    for pid in sorted(sizes):
        offsets.append((pid, total))
        total += sizes[pid]
    offsets_df = part.sparkSession.createDataFrame(offsets, f"{_PID} int, {_OFF} long")

    w = Window.partitionBy(_PID).orderBy(*cols)
    ranked = (
        part.join(F.broadcast(offsets_df), _PID)
        .withColumn(out, F.row_number().over(w).cast("long") + F.col(_OFF))
        .drop(_PID, _OFF)
    )
    return ranked, total


def with_grouped_row_number(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[str | Column],
    out: str = "rn",
    total_col: str = "n_group",
    num_partitions: int | None = None,
) -> DataFrame:
    """PER-GROUP 1-based row number under the total order ``order_by``,
    without ``Window.partitionBy(group)`` over the raw table — the shape
    that serializes a hot stratum (one web-crawl source = most of a
    100 TB corpus) into a single task.

    Same three steps as :func:`with_global_row_number`, stratified: the
    range shuffle keys on (group, order) so each group occupies a
    contiguous partition span; the offset pass counts (partition, group)
    cells — at most partitions + groups rows, driver-tiny — and
    prefix-sums them PER GROUP; the local window partitions by
    (partition id, group), fully parallel even when one group is the
    whole table. Adds ``out`` (the in-group row number) and
    ``total_col`` (the group's row count, for percent_rank/ntile
    arithmetic). ``order_by`` must be a total order within each group.
    A NULL group key is its own group, exactly as
    ``Window.partitionBy`` treats it (the offset join is null-safe).

    Implementation: a row number IS the cumulative sum of 1s, so this
    delegates to the one grouped prefix-sum core
    (:func:`_grouped_prefix`) — the crash-prone range-partition/offset
    protocol exists once, not in per-function copies that can drift."""
    return (
        _grouped_prefix(
            df.withColumn("__gr_one", F.lit(1).cast("long")),
            group_cols,
            order_by,
            "__gr_one",
            out=out,
            total_col=total_col,
            num_partitions=num_partitions,
        )
        .drop("__gr_one")
    )


def _grouped_prefix(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[str | Column],
    weight_col: str,
    out: str,
    total_col: str | None = None,
    num_partitions: int | None = None,
    max_offset_cells: int = MAX_OFFSET_CELLS,
    rank_out: str | None = None,
    tie_count_out: str | None = None,
) -> DataFrame:
    """The shared grouped prefix-sum core: range shuffle on (group,
    order), per-(partition, group) WEIGHT sums prefix-summed to
    driver-tiny broadcast offsets (null-safe join), local cumsum window
    by (partition id, group). ``total_col`` (optional) adds each
    group's total weight. Weights must be integral-typed so the
    offsets are exact. ``max_offset_cells`` bounds the driver collect
    (see :data:`MAX_OFFSET_CELLS`).

    ``rank_out`` / ``tie_count_out`` (optional, only meaningful with an
    all-ones weight) add the TRUE SQL ``rank()`` under the total
    (group, order) position and the order-key tie-run size: rank =
    offset + local rank (valid because a range partitioner assigns by
    key value, so equal keys — hence tie runs — never straddle a
    partition boundary, and everything in earlier partitions is
    strictly smaller); both windows share the local window's
    partitioning, so they compile into the same (or an exchange-free
    sibling) Window exec — no additional shuffle."""
    gcols = [F.col(c) for c in group_cols]
    ocols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    keys = gcols + ocols
    if num_partitions:
        part = df.repartitionByRange(num_partitions, *keys)
    else:
        part = df.repartitionByRange(*keys)
    part = part.withColumn(_PID, F.spark_partition_id()).localCheckpoint(eager=True)

    cells = (
        part.groupBy(_PID, *group_cols)
        .agg(F.sum(weight_col).alias("w"))
        .limit(max_offset_cells + 1)
        .collect()
    )
    if len(cells) > max_offset_cells:
        raise ValueError(
            f"grouped ranking offset table exceeds {max_offset_cells} "
            "(partition, group) cells — the group key is too "
            "high-cardinality for the driver-broadcast offset protocol "
            "(it is built for low-cardinality strata like source/nation); "
            "aggregate per group instead, or raise max_offset_cells "
            "deliberately"
        )
    per_group: dict[tuple, list[tuple[int, int]]] = {}
    for r in cells:
        per_group.setdefault(tuple(r[c] for c in group_cols), []).append(
            (r[_PID], r["w"] or 0)
        )
    offsets = []
    for gkey, pids in per_group.items():
        total = sum(c for _, c in pids)
        run = 0
        for pid, w_sum in sorted(pids):
            row = (pid, *gkey, run) + ((total,) if total_col else ())
            offsets.append(row)
            run += w_sum
    schema = (
        f"{_PID} int, "
        + ", ".join(f"{c} {dict(part.dtypes)[c]}" for c in group_cols)
        + f", {_OFF} long"
        + (f", {total_col} long" if total_col else "")
    )
    offsets_df = part.sparkSession.createDataFrame(offsets, schema)

    w = (
        Window.partitionBy(_PID, *group_cols)
        .orderBy(*ocols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = _null_safe_offset_join(part, offsets_df, group_cols).withColumn(
        out, F.sum(weight_col).over(w).cast("long") + F.col(_OFF)
    )
    if rank_out is not None:
        w_rank = Window.partitionBy(_PID, *group_cols).orderBy(*ocols)
        joined = joined.withColumn(
            rank_out, F.rank().over(w_rank).cast("long") + F.col(_OFF)
        )
    if tie_count_out is not None:
        # Partitioning by (pid, group, order keys) is satisfied by the
        # local window's (pid, group) hash exchange (subset rule) and by
        # its sort order — Catalyst plans it exchange-free.
        w_tie = Window.partitionBy(_PID, *group_cols, *ocols)
        joined = joined.withColumn(
            tie_count_out, F.count(F.lit(1)).over(w_tie).cast("long")
        )
    return joined.drop(_PID, _OFF)


def _null_safe_offset_join(
    part: DataFrame, offsets_df: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Join the range-partitioned frame to its broadcast offsets on
    (partition id, group) with NULL-SAFE group equality: a plain
    equi-join would silently drop every NULL-keyed row (NULL != NULL),
    while the Window.partitionBy forms these operators replace treat
    NULL as its own partition."""
    off = offsets_df
    for c in (_PID, *group_cols):
        off = off.withColumnRenamed(c, f"__off_{c}")
    cond = part[_PID] == off[f"__off_{_PID}"]
    for c in group_cols:
        cond = cond & part[c].eqNullSafe(off[f"__off_{c}"])
    joined = part.join(F.broadcast(off), cond)
    return joined.drop(*[f"__off_{c}" for c in (_PID, *group_cols)])


def _is_sort_order(c: Column) -> bool:
    """True when ``c`` is a ``.desc()``/``.asc()`` SORT-ORDER column
    rather than a value expression. Primary check inspects the
    underlying Catalyst expression class (stable API surface, works
    whatever the repr prints); the repr-suffix match is only the
    fallback for runtimes that don't expose the JVM column (e.g. Spark
    Connect), where the repr is the only signal available (ADVICE r16:
    the repr format alone is not a stable contract)."""
    try:
        return c._jc.expr().getClass().getSimpleName() == "SortOrder"
    except Exception:  # Connect / repr-only fallback
        return str(c).rstrip("'>").endswith(
            ("DESC NULLS LAST", "DESC NULLS FIRST",
             "ASC NULLS LAST", "ASC NULLS FIRST")
        )


def with_grouped_rank_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[str | Column],
    percent_rank_col: str = "prank",
    cume_dist_col: str | None = None,
) -> DataFrame:
    """``percent_rank() OVER (PARTITION BY group ORDER BY ...)`` (and
    optionally ``cume_dist``) without a per-group raw-table sort window
    — TIE-CORRECT (ADVICE r15): the core emits true SQL ``rank()`` and
    the order-key tie-run size (offset + local rank/count — sound
    because a range partitioner co-locates equal keys, so tie runs
    never straddle partitions), and with n the group total,
    percent_rank = (rank-1)/(n-1) (0.0 for singleton groups) and
    cume_dist = (rank-1+ties)/n — bit-equal to the window forms on both
    engines whether or not the order keys are unique. Both extra window
    expressions ride the existing local window's partitioning: no
    additional shuffle versus :func:`with_grouped_row_number`."""
    for c in order_by:
        # the tie-count window PARTITIONS by the order expressions, and
        # a sort-order column (.desc()/.asc()) is not a value
        # expression — refuse loudly at the boundary instead of failing
        # deep in analysis (code-review r16); callers wanting reversed
        # rank stats pre-compute a sortable value column
        if not isinstance(c, str) and _is_sort_order(c):
            raise ValueError(
                "with_grouped_rank_stats order_by entries must be value "
                "expressions (column names or plain Columns), not "
                ".desc()/.asc() sort orders — pre-compute a sortable "
                "column (e.g. negate a numeric) for descending stats"
            )
    ranked = _grouped_prefix(
        df.withColumn("__gr_one", F.lit(1).cast("long")),
        group_cols,
        order_by,
        "__gr_one",
        out="__rank_rn",
        total_col="__rank_n",
        rank_out="__rank_rk",
        tie_count_out="__rank_ties",
    ).drop("__gr_one")
    rk, n, ties = F.col("__rank_rk"), F.col("__rank_n"), F.col("__rank_ties")
    prank = F.when(n <= 1, F.lit(0.0)).otherwise(
        (rk - 1).cast("double") / (n - 1).cast("double")
    )
    outdf = ranked.withColumn(percent_rank_col, prank)
    if cume_dist_col is not None:
        outdf = outdf.withColumn(
            cume_dist_col, (rk - 1 + ties).cast("double") / n.cast("double")
        )
    return outdf.drop("__rank_rn", "__rank_n", "__rank_rk", "__rank_ties")


def with_grouped_cumsum(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[str | Column],
    weight_col: str,
    out: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """PER-GROUP running sum of ``weight_col`` under the total order
    ``order_by`` — the weighted generalization of
    :func:`with_grouped_row_number` (a row number is a cumsum of 1s),
    for token-budget sampling and any other prefix-budget cut that would
    otherwise serialize a hot stratum into one
    ``Window.partitionBy(group)`` task.

    Delegates to the one grouped prefix-sum core
    (:func:`_grouped_prefix`): range shuffle on (group, order), the
    offset pass SUMS ``weight_col`` per (partition, group) cell and
    prefix-sums the driver-tiny cell table per group, local cumsum
    window by (partition id, group). Weights must be integral-typed for
    the offsets to be exact (floats would reintroduce
    order-dependence)."""
    return _grouped_prefix(
        df,
        group_cols,
        order_by,
        weight_col,
        out=out,
        num_partitions=num_partitions,
    )


def with_grouped_ntile(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[str | Column],
    n_tiles: int,
    out: str = "tile",
) -> DataFrame:
    """SQL-exact ``ntile(n) OVER (PARTITION BY group ORDER BY ...)``
    without a per-group raw-table sort window: in-group rank and group
    total come from :func:`with_grouped_row_number`, and the tile is the
    same first-``total%n``-tiles-get-one-extra arithmetic as
    :func:`with_global_ntile` — computed per ROW from (rn, n) columns,
    since each group's total differs."""
    ranked = with_grouped_row_number(
        df, group_cols, order_by, out="__rank_rn", total_col="__rank_n"
    )
    n, t = F.col("__rank_n"), F.lit(int(n_tiles))
    q = F.floor(n / t).cast("long")
    r = n % t
    rn0 = F.col("__rank_rn") - 1
    big = q + 1
    tile = F.when(q == 0, rn0 + 1).otherwise(
        F.when(rn0 < r * big, F.floor(rn0 / big)).otherwise(
            r + F.floor((rn0 - r * big) / q)
        )
        + 1
    )
    return ranked.withColumn(out, tile.cast("long")).drop(
        "__rank_rn", "__rank_n"
    )


def with_global_ntile(
    df: DataFrame,
    order_by: Sequence[str | Column],
    n_tiles: int,
    out: str = "tile",
) -> DataFrame:
    """SQL-exact ``ntile(n) OVER (ORDER BY ...)``: the first ``total % n``
    tiles get ``ceil(total/n)`` rows, the rest ``floor(total/n)`` —
    computed from the global row number, no single-partition window."""
    ranked, total = with_global_row_number(df, order_by, out="__rank_rn")
    q, r = divmod(total, n_tiles)
    rn0 = F.col("__rank_rn") - 1  # 0-based
    big = F.lit(q + 1)
    if q == 0:  # fewer rows than tiles: one row per tile
        tile = rn0 + 1
    else:
        tile = (
            F.when(rn0 < r * (q + 1), F.floor(rn0 / big))
            .otherwise(r + F.floor((rn0 - r * (q + 1)) / F.lit(q)))
            + 1
        )
    return ranked.withColumn(out, tile.cast("long")).drop("__rank_rn")


def with_global_rank_stats(
    df: DataFrame,
    order_by: Sequence[str | Column],
    percent_rank_col: str = "prank",
    cume_dist_col: str = "cume",
) -> DataFrame:
    """``percent_rank()`` and ``cume_dist()`` over a global TOTAL order:
    with unique order keys rank == row_number, so
    percent_rank = (rn-1)/(total-1) and cume_dist = rn/total exactly as the
    single-partition window would compute them."""
    ranked, total = with_global_row_number(df, order_by, out="__rank_rn")
    rn = F.col("__rank_rn")
    prank = (
        F.lit(0.0) if total <= 1 else (rn - 1).cast("double") / F.lit(float(total - 1))
    )
    return (
        ranked.withColumn(percent_rank_col, prank)
        .withColumn(cume_dist_col, rn.cast("double") / F.lit(float(total)))
        .drop("__rank_rn")
    )

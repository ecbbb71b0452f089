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

The order keys must be a total order (include a unique tiebreaker) — that
is already the registry's determinism rule for every ranked query, and it
makes rank == row_number, so percent_rank/cume_dist are pure arithmetic.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

_PID = "__rank_pid"
_OFF = "__rank_offset"


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

"""Multi-dimensional data layout: Z-order (Morton) clustering for
file/row-group skipping on MORE THAN ONE filter column.

A table range-sorted on x prunes x-filters perfectly and y-filters not
at all — every file's y-range spans the domain. Interleaving the bits
of quantized (x, y, ...) ranks gives every file a small hyper-RECTANGLE
of the key space instead of a thin slab, so parquet min/max stats prune
scans filtered on ANY clustered dimension (the Delta/Iceberg OPTIMIZE
ZORDER BY shape, built here from pure Catalyst bit arithmetic — no UDF,
whole-stage-codegen'd).

At 100 TB this is a write-once, skip-forever lever: the z-value is
computed per row from broadcast-small quantization bounds, the
range-repartition on z is the one shuffle a re-layout pays anyway, and
readers need no cooperation — pruning happens in the parquet reader's
ordinary stats filtering. Quantization bounds come from table stats
(here: caller-provided min/max; at scale the column stats the writer
already has). The oracle-style proof lives in
``tests/test_scale_patterns.py::test_zorder_layout_prunes_both_dims``:
per-file footer ranges admit ~sqrt-fraction of files for a single-dim
filter where a linear sort admits all of them.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def quantize_minmax(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Linear-scale a numeric column into [0, 2**bits) integer cells.
    Values at/below ``lo`` map to 0, at/above ``hi`` to the top cell —
    clamping keeps stragglers outside the stats bounds legal rather than
    corrupting the interleave. NULL/NaN inputs map to cell 0 (ADVICE
    r14): ``floor(NaN)`` is null, which would survive least/greatest
    into a null z-value and land the row in an arbitrary range
    partition, silently widening one file's footer stats — pinning such
    rows to the first cell keeps them in one corner of the key space
    instead."""
    if not (float(hi) > float(lo)):
        raise ValueError(
            f"quantize_minmax needs hi > lo (got lo={lo}, hi={hi}): "
            "degenerate bounds would NaN every cell and silently destroy "
            "the clustering"
        )
    cells = (1 << bits) - 1
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    q = F.floor(scaled * F.lit(cells + 1)).cast("long")
    return F.coalesce(
        F.least(F.greatest(q, F.lit(0)), F.lit(cells)), F.lit(0).cast("long")
    )


def zorder_value(quantized: list[Column], bits: int) -> Column:
    """Morton-interleave the bit planes of ``len(quantized)`` cell
    columns: output bit (b * n + i) = bit b of column i. Pure
    shift/and/or Catalyst expressions — 2*bits*n ops inside one
    whole-stage-codegen'd projection, no Python on the data path.
    Total bits (bits * n) must fit a long (<= 62)."""
    n = len(quantized)
    if bits * n > 62:
        raise ValueError(f"{bits} bits x {n} cols overflows a long")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, q in enumerate(quantized):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def quantize_rank_cells(boundaries: list[float], col: str) -> Column:
    """EQUI-DEPTH quantization cell for one column given its quantile
    ``boundaries``: cell = count of boundaries at-or-below the value — a
    chain of codegen'd comparisons, no UDF. Each cell holds ~equal ROWS,
    which is what makes the interleave prune on skewed real columns:
    linear min-max quantization spends its top bits on the empty tail of
    a heavy-tailed metric (events.value: p75 at 14% of max), collapsing
    the z-curve to the other dimension's order for most of the mass —
    the same reason Delta's OPTIMIZE ZORDER uses range-partition ids,
    not scaled values. NULL/NaN pin to cell 0 (ADVICE r14: an arbitrary
    cell would silently widen one file's footer stats)."""
    c = F.col(col).cast("double")
    cell = F.lit(0).cast("long")
    for b in sorted(set(boundaries)):
        cell = cell + (c >= F.lit(float(b))).cast("long")
    return F.when(c.isNull() | F.isnan(c), F.lit(0).cast("long")).otherwise(cell)


def auto_zorder_expr(
    df: DataFrame, cols: list[str], bits: int = 8, eps: float = 0.001
) -> Column:
    """Z-value expression over EQUI-DEPTH cells of ``cols`` (see
    :func:`quantize_rank_cells`) — the self-tuning form a maintenance
    rewrite uses when no curated bounds exist: ONE multi-column
    approxQuantile sketch pass fetches every column's boundaries (a
    per-column pass would rescan the full table len(cols) times), then
    the same Morton interleave. ``bits=8`` (256 cells/dim, 255
    comparisons/row/dim) localizes 2**8 range partitions per dimension
    — far more than any re-layout's file count needs — while keeping
    the projection a bounded codegen chain."""
    n_cells = 1 << bits
    probs = [i / n_cells for i in range(1, n_cells)]
    # NaN rows must not reach the quantile sketch (ADVICE r15): Spark
    # sorts NaN above every value, so high boundaries would come back
    # NaN and quantize_rank_cells' `>= NaN` terms never fire — silently
    # collapsing the top cells. Those rows are already pinned to cell 0
    # on the quantize side, and dropping them here only nudges the
    # equi-depth boundaries (they are layout tuning, not semantics).
    # NULLs are ignored by approxQuantile either way; the cast keeps
    # isnan legal on integer columns (int→double never produces NaN).
    clean = df
    for c in cols:
        clean = clean.filter(~F.isnan(F.col(c).cast("double")) | F.col(c).isNull())
    all_bounds = clean.approxQuantile(list(cols), probs, eps)
    qs = [
        quantize_rank_cells(bounds, c) for c, bounds in zip(cols, all_bounds)
    ]
    return zorder_value(qs, bits)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[tuple[str, float, float]],
    bits: int = 16,
    n_files: int = 32,
) -> None:
    """Re-layout ``df`` into ``n_files`` parquet files clustered by the
    Z-order of ``cols`` (each (name, min, max) — the quantization
    bounds). One range-repartition shuffle on the z-value, a
    within-partition sort so every file's z-range is tight, and the
    helper column is dropped before write — the layout is invisible in
    the schema, visible only in the footer stats that make it useful."""
    qs = [quantize_minmax(F.col(c), lo, hi, bits) for c, lo, hi in cols]
    z = zorder_value(qs, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )

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
    corrupting the interleave."""
    if not (float(hi) > float(lo)):
        raise ValueError(
            f"quantize_minmax needs hi > lo (got lo={lo}, hi={hi}): "
            "degenerate bounds would NaN every cell and silently destroy "
            "the clustering"
        )
    cells = (1 << bits) - 1
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    q = F.floor(scaled * F.lit(cells + 1)).cast("long")
    return F.least(F.greatest(q, F.lit(0)), F.lit(cells))


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

"""Embedding quantization — symmetric per-vector int8, Catalyst-only.

Production vector stores quantize float32 embeddings to int8 (4× smaller,
SIMD-friendly dot products) with a per-vector scale: q_i =
round(x_i / amax * 127), dequantized as q_i * amax / 127. At 100 TB of
embeddings this runs as a pure map — no shuffle, no Python — so it is
expressed entirely in Catalyst array functions (transform / aggregate
folds), never a UDF.

Engine-stable by construction: the rounding is floor(x + 0.5) (IEEE-
identical everywhere, unlike round() — see q2_min_cost_supplier), and the
reported stats are INTEGER aggregates of the quantized values (exact,
order-independent), so the oracle comparison never touches a float sum.

Reference parity: no counterpart in the reference; north-star extension
(the brief's embedding-column family).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def int8_quantize(emb: Column) -> tuple[Column, Column]:
    """Return (scale, q) where scale = max(|x|) and q = int8 codes as an
    array<bigint> (0 for the all-zero vector). floor(x/scale*127 + 0.5)
    rounds half toward +inf identically in Spark and DuckDB; the single
    +127.5 edge (x = +scale) clamps to 127."""
    xd = F.transform(emb, lambda x: x.cast("double"))
    scale = F.array_max(F.transform(xd, F.abs))
    q = F.when(scale == 0.0, F.transform(xd, lambda x: F.lit(0).cast("bigint"))).otherwise(
        F.transform(
            xd,
            lambda x: F.least(
                F.lit(127).cast("bigint"),
                F.floor(x / scale * F.lit(127.0) + F.lit(0.5)).cast("bigint"),
            ),
        )
    )
    return scale, q


def quantization_stats(df: DataFrame, id_cols: list[str], emb_col: str) -> DataFrame:
    """Per-vector int8 quantization report: the scale plus exact integer
    stats of the code vector (sum, sum of |codes|, squared norm, count at
    the +/-127 rails). One pass, whole-map, shuffle-free."""
    scale, q = int8_quantize(F.col(emb_col))

    def int_fold(arr: Column, fn) -> Column:
        return F.aggregate(
            arr, F.lit(0).cast("bigint"), lambda acc, x: acc + fn(x)
        )

    qc = F.col("__q")
    return (
        df.select(*id_cols, scale.alias("scale"), q.alias("__q"))
        .select(
            *id_cols,
            "scale",
            int_fold(qc, lambda x: x).alias("q_sum"),
            int_fold(qc, F.abs).alias("q_abs_sum"),
            int_fold(qc, lambda x: x * x).alias("q_norm2"),
            int_fold(
                qc, lambda x: (F.abs(x) == 127).cast("bigint")
            ).alias("n_saturated"),
        )
    )

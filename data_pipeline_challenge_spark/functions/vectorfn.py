"""Vector column expressions over ``array<float>`` embedding columns.

Dot products / norms are expressed as left-fold ``aggregate`` over doubles —
a strictly sequential summation, so the result is bit-identical to any other
engine that folds left-to-right in doubles (this is what makes the cosine
queries oracle-checkable). All JVM-side; no Python per row.

For 100 TB embedding tables the same expressions apply unchanged; the scale
lever is candidate pruning (LSH bucketing, see operators/similarity.py), not
the arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity (inputs are cast to double first by callers)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))

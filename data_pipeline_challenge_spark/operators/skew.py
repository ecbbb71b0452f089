"""Skew mitigation: salted joins and hot-key diagnostics.

AQE's skew-join splitting (on by default, session.py) handles most skew at
runtime by splitting oversized partitions. Salting is the *plan-level*
lever for the pathological case AQE can't fix: a single join key carrying
a double-digit percentage of the rows (the "null key" / "default user" /
boilerplate-document problem). This module provides the standard
replicate-and-salt formulation as a reusable operator plus the diagnostic
that tells you when to use it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def key_skew_profile(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Hot-key diagnostic: per-key row counts + share of total for the
    heaviest keys. Run this before deciding to salt."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / F.lit(float(total)), 6))
        .orderBy(F.col("n_rows").desc(), F.col(key))
        .limit(top)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed keys: salt the big side with a
    random bucket in [0, salt), replicate the small side ``salt`` times,
    and join on (key, salt_bucket).

    The hot key's rows spread over ``salt`` reducers instead of one. Cost:
    the small side shuffles ``salt``× (it must be genuinely small). Result
    is identical to ``big.join(small, key, how)`` for inner/left joins —
    property-tested in tests/test_operators.py. Other join types are
    REFUSED: the replicated small side would emit its unmatched rows
    once per salt bucket under right/full/anti semantics — silently
    wrong row counts are worse than a loud error."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: "
            "the salt-replicated small side duplicates unmatched rows "
            "under right/full/semi/anti semantics"
        )
    big_salted = big.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    small_rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_salted.join(small_rep, on=[key, "__salt"], how=how)
    return out.drop("__salt")

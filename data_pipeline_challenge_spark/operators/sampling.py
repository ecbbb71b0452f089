"""Deterministic sampling operators for corpus curation.

Training-data pipelines need samples that are (a) reproducible across
runs, engines, and partitionings, and (b) exact-size per stratum (a
uniform ``df.sample`` gives neither). The trick is the same one the
engine's hash-split uses: order by a content-free cryptographic hash of
the key — effectively uniform, perfectly stable — and rank within each
stratum with a plain partitioned window (no global ordering, so this
scales to any stratum count).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def hash_rank_in_stratum(
    df: DataFrame,
    strata: Sequence[str],
    key: str | Column,
    out: str = "samp_rank",
) -> DataFrame:
    """Add a 1-based rank within each stratum under the md5-of-key order
    (key appended as tiebreaker → total order)."""
    key_col = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(*strata).orderBy(F.md5(key_col.cast("string")), key_col)
    return df.withColumn(out, F.row_number().over(w).cast("long"))


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    n_per_stratum: int,
    key: str | Column,
    out: str = "samp_rank",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer when the stratum
    is smaller), chosen by deterministic key hash."""
    return hash_rank_in_stratum(df, strata, key, out).filter(
        F.col(out) <= n_per_stratum
    )

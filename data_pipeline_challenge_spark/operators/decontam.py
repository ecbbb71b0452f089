"""Benchmark decontamination — n-gram overlap between a training corpus
and an evaluation/benchmark set.

Before a corpus becomes training data, every document sharing enough
n-grams with a held-out benchmark must be found (and usually dropped):
test-set leakage inflates eval scores. The standard check is exact
word-n-gram overlap (the GPT-3 / PaLM decontamination recipe, applied
per benchmark).

Plan shape: shingle both sides with the same ``word_shingles`` Catalyst
expression the dedup family uses, then ONE join keyed on the shingle
string, aggregated per training document. The eval side is a benchmark —
thousands of documents, not billions — so its shingle table broadcasts:
the 100 TB training corpus is scanned once, never shuffled, and the
per-doc counts fold map-side. With ``broadcast_eval=False`` the same
plan runs as a shuffle join for oversized eval sets.

Reference parity: no counterpart in the reference (its corpus is product
records); north-star extension from the brief.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .dedup import _shingle_table


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per contaminated training doc: how many distinct n-gram shingles it
    shares with the eval set (``n_shared``) and how many distinct eval
    docs it overlaps (``n_eval_docs``). Docs with zero overlap are absent
    (inner join — the interesting set is the contaminated one)."""
    tr = _shingle_table(train, id_col, text_col, n)
    ev = _shingle_table(eval_df, id_col, text_col, n).select(
        F.col("doc").alias("eval_doc"), "s"
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (
        tr.join(ev, "s")
        .groupBy(F.col("doc").alias(id_col))
        .agg(
            F.count_distinct("s").alias("n_shared"),
            F.count_distinct("eval_doc").alias("n_eval_docs"),
        )
    )

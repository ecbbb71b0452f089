"""Cross-source content-overlap primitives, shared by the batch query
(``plans/text.source_shingle_overlap``) and the streaming IVM twin
(``streaming/overlap_stream.py``) — one definition of the pair/Jaccard
arithmetic so the two views can never silently diverge (they are pinned
row-equal by ``test_overlap_stream_equals_batch``)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def source_overlap_matrix(docs: DataFrame, shingle_n: int = 8) -> DataFrame:
    """For every source pair, the number of DISTINCT n-token shingles
    they share and the Jaccard of their shingle sets — the feed-level
    leakage report ("which two feeds syndicate the same boilerplate?")
    that decides whether dedup must run across sources or can shard by
    source. ``docs`` needs ``source`` and ``text`` columns.

    Scale shape: the frame is (source, shingle) DISTINCT with md5'd
    shingles; the pair join is shingle-KEYED (equi-join), and each
    shingle contributes at most (sources-it-appears-in choose 2) pair
    rows — bounded by the source count squared per shingle, never by
    corpus size; per-source set sizes are a partial agg broadcast into
    the final small matrix. Exact integers + one rounded division."""
    from ..functions.textfn import doc_shingles

    sh = doc_shingles(docs, shingle_n, "source")
    counts = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("source").alias("s1"), "s")
    b = sh.select(F.col("source").alias("s2"), "s")
    pairs = (
        a.join(b, "s")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return jaccard_matrix(pairs, counts)


def jaccard_matrix(pairs: DataFrame, counts: DataFrame) -> DataFrame:
    """The matrix-finishing step both views share: join per-source set
    sizes (``source``, ``n``) onto the shared-count pairs (``s1``,
    ``s2``, ``n_shared``) and compute ``round(|A∩B| / |A∪B|, 6)``. The
    counts side is matrix-small by contract (one row per source) and
    broadcast."""
    n1 = counts.select(F.col("source").alias("s1"), F.col("n").alias("_n1"))
    n2 = counts.select(F.col("source").alias("s2"), F.col("n").alias("_n2"))
    jac = F.round(
        F.col("n_shared")
        * F.lit(1.0)
        / (F.col("_n1") + F.col("_n2") - F.col("n_shared")),
        6,
    )
    return (
        pairs.join(F.broadcast(n1), "s1")
        .join(F.broadcast(n2), "s2")
        .select("s1", "s2", "n_shared", jac.alias("jaccard"))
    )

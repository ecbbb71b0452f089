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


def contrastive_negatives(
    docs: DataFrame,
    id_col: str,
    source_col: str,
    k: int = 3,
    extra_draws: int = 8,
    anchors: DataFrame | None = None,
) -> DataFrame:
    """Deterministic contrastive negatives for EVERY doc (or a supplied
    anchor frame): up to ``k`` pseudo-random negatives per anchor from a
    DIFFERENT source, reproducible across runs/partitionings (all
    randomness is md5-derived).

    The registered ``contrastive_negatives_top3`` query broadcasts its
    16-anchor frame against a 1/16 corpus slice — correct for a tiny
    anchor set, the wrong shape when anchors ≈ corpus (VERDICT r11 #7:
    anchors × slice is quadratic). This operator is the linear-shape
    generalization, draw-by-position instead of scan-the-slice:

    1. Every doc gets a deterministic POSITION within its md5 bucket
       (first hex digit, 16 buckets — the query's candidate-slice rule):
       rank by md5 within (bucket, sub-bucket) — sub = hex digits 2-3,
       4096 windowed groups, never a global sort — plus cumulated
       sub-bucket offsets (a ≤256-row window per bucket). The composed
       order is exactly md5 order within the bucket.
    2. Each anchor makes ``k + extra_draws`` draws: draw i targets
       position md5("{anchor}:{i}")[:15] mod bucket_size — joined to the
       positioned docs on (bucket, position), a well-distributed
       shuffle-hash key with NO broadcast of the anchor side. Output is
       |anchors| x (k+extra) rows, linear in anchors.
    3. Same-source and self hits are rejected, repeats deduped to their
       first draw, survivors ranked in draw order, top k kept — so an
       anchor may get fewer than k when its rejection rate is extreme;
       raise ``extra_draws`` to push the shortfall probability down.

    Returns ``(anchor_id, neg_id, rnk)`` with rnk 1..k in draw order.
    Broadcasts are metadata-sized only: the 4096-row offset table, the
    16-row bucket totals, the draw indices."""
    m = int(k) + int(extra_draws)
    hx = F.md5(F.col(id_col).cast("string"))
    cand = docs.select(
        F.col(id_col).alias("neg_id"),
        F.col(source_col).alias("c_source"),
        hx.alias("hx"),
        F.substring(hx, 1, 1).alias("bucket"),
        F.conv(F.substring(hx, 2, 2), 16, 10).cast("int").alias("sub"),
    )
    w_sub = Window.partitionBy("bucket", "sub").orderBy("hx", "neg_id")
    ranked = cand.withColumn("r", F.row_number().over(w_sub) - F.lit(1))
    cnts = cand.groupBy("bucket", "sub").agg(F.count(F.lit(1)).alias("n_sub"))
    w_off = (
        Window.partitionBy("bucket")
        .orderBy("sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = cnts.withColumn(
        "off", F.coalesce(F.sum("n_sub").over(w_off), F.lit(0))
    ).select("bucket", "sub", "off")
    pos_docs = ranked.join(F.broadcast(offs), ["bucket", "sub"]).select(
        "bucket", (F.col("off") + F.col("r")).alias("pos"), "neg_id", "c_source"
    )
    n_b = cnts.groupBy("bucket").agg(F.sum("n_sub").alias("n_bucket"))

    if anchors is None:
        anchors = docs
    a_hx = F.md5(F.col(id_col).cast("string"))
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(source_col).alias("a_source"),
        F.substring(a_hx, 1, 1).alias("bucket"),
    )
    draws = docs.sparkSession.range(m).select(F.col("id").cast("int").alias("draw"))
    ph = F.md5(
        F.concat_ws(":", F.col("anchor_id").cast("string"), F.col("draw").cast("string"))
    )
    picks = (
        a.join(F.broadcast(draws))  # anchors x m, linear fan-out
        .join(F.broadcast(n_b), "bucket")
        .select(
            "anchor_id", "a_source", "bucket", "draw",
            F.pmod(
                F.conv(F.substring(ph, 1, 15), 16, 10).cast("long"),
                F.col("n_bucket"),
            ).alias("pos"),
        )
    )
    hits = (
        picks.join(pos_docs, ["bucket", "pos"])  # shuffle join, never broadcast
        .filter(
            (F.col("c_source") != F.col("a_source"))
            & (F.col("neg_id") != F.col("anchor_id"))
        )
        .groupBy("anchor_id", "neg_id")
        .agg(F.min("draw").alias("draw"))
    )
    w_rank = Window.partitionBy("anchor_id").orderBy("draw")
    return (
        hits.select(
            "anchor_id", "neg_id",
            F.row_number().over(w_rank).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= k)
    )


def sqrt_temperature_sample(
    df: DataFrame,
    stratum: str,
    key: str | Column,
    scale: float = 8.0,
    out: str = "samp_rank",
) -> DataFrame:
    """Temperature-smoothed domain mixing: per stratum keep the
    ``ceil(scale * sqrt(n))`` smallest-hash rows (capped at n) — the
    sqrt-smoothing rule multilingual/domain training mixes use to damp
    over-represented domains toward sqrt of their size while keeping
    small domains whole.

    Engine-stable by construction: the quota is sqrt → one multiply →
    ceil, each an IEEE-754 correctly-rounded operation, so Spark and
    any SQL oracle compute the IDENTICAL integer quota — unlike
    normalized ``pow(n, alpha)`` weights, whose cross-source summation
    order makes the threshold engine-dependent at the ULP. Membership
    is the md5-of-key order (reproducible across runs/partitionings);
    one stratum-keyed window shuffle, no global sort."""
    ranked = hash_rank_in_stratum(df, [stratum], key, out).withColumn(
        "_stratum_n", F.count(F.lit(1)).over(Window.partitionBy(stratum))
    )
    quota = F.least(
        F.col("_stratum_n"),
        F.ceil(F.lit(float(scale)) * F.sqrt(F.col("_stratum_n"))).cast("long"),
    )
    return ranked.filter(F.col(out) <= quota).drop(out, "_stratum_n")


def cluster_aware_split(
    docs: DataFrame,
    id_col: str,
    pairs: DataFrame,
    src: str,
    dst: str,
    train_lt: str = "cd",
    val_lt: str = "e6",
) -> DataFrame:
    """Leakage-free train/val/test split: a plain per-doc hash split
    (``sample_hash_split``) puts near-duplicate documents on BOTH sides
    of the split boundary — the eval set then contains near-copies of
    training docs and measures memorization, not generalization. Here
    the split key is the doc's near-duplicate CLUSTER representative
    (connected component over the supplied pair graph; singletons are
    their own representative), so every member of a cluster lands in
    the SAME split by construction.

    Assignment is the md5-prefix rule the hash split uses: the first
    two hex chars of md5(representative) — ``< train_lt`` → train,
    ``< val_lt`` → val, else test (defaults 'cd'/'e6' ≈ 80/10/10 in
    cluster mass). Deterministic across runs/engines/partitionings.

    Scale shape: the component labels are PAIR-GRAPH-sized (near-dup
    pairs, ≪ corpus), joined to the corpus on the id — one key-equality
    shuffle join that AQE broadcasts when the label side is small; no
    global sort, no per-doc Python. Returns (id_col, split_key, split);
    ``split_key`` is the representative, exposed so an auditor can
    group by it and verify no key straddles splits."""
    from .graph import connected_components

    # internal names so a doc table whose id column is literally
    # 'vertex'/'component' cannot collide with the label frame
    labels = connected_components(pairs, src=src, dst=dst).select(
        F.col("vertex").alias("__cas_vertex"),
        F.col("component").alias("__cas_component"),
    )
    rep = (
        docs.select(id_col)
        .join(labels, docs[id_col] == labels["__cas_vertex"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__cas_component"), F.col(id_col)).alias(
                "split_key"
            ),
        )
    )
    h2 = F.substring(F.md5(F.col("split_key").cast("string")), 1, 2)
    split = (
        F.when(h2 < F.lit(train_lt), "train")
        .when(h2 < F.lit(val_lt), "val")
        .otherwise("test")
    )
    return rep.select(id_col, "split_key", split.alias("split"))

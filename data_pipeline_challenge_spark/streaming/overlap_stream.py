"""Incrementally-maintained cross-source overlap matrix — the streaming
IVM (incremental view maintenance) twin of the batch
``source_shingle_overlap`` query.

The batch query computes, for every source pair, the count of DISTINCT
8-token shingles both hold plus the Jaccard of their shingle sets. That
view is expensively non-monotonic to recompute (a corpus-wide shingle
self-join) but cheaply MAINTAINABLE: the matrix only changes when a
(source, shingle) membership pair is seen for the FIRST time, and each
such new pair adds exactly one shared-shingle count with every OTHER
source already holding (or newly gaining) that shingle. So a micro-batch
folds in three additive steps:

1. ``shingles/`` — the ever-seen DISTINCT (source, s) membership store,
   PARTITIONED by a shingle hash bucket. The batch's candidate pairs
   anti-join against history pruned to the batch's buckets (driver-side
   literal ⇒ planning-time partition pruning), yielding the batch's NEW
   membership pairs. Per-batch cost is O(batch shingles + matched
   buckets), never O(history).
2. ``pair_inc/`` — additive (s1, s2, d) increments: new-holder × distinct
   history holders of the same shingle, plus new × new pairs within the
   batch. Each shingle contributes at most (holders choose 2) pair rows
   over its LIFETIME — bounded by source count squared, not corpus size.
3. ``count_inc/`` — additive (source, d) per-source distinct-shingle set
   size increments.

``overlap_report`` sums the increments and computes Jaccard with the
batch query's exact arithmetic — equal to the batch view over the
concatenated input (``test_overlap_stream_equals_batch``).

Exactly-once: increments are written FIRST, the membership append LAST —
the membership store's last batch id is the commit point. A replayed
batch at-or-below it skips; a crash between the writes replays against
UNCHANGED history, recomputing byte-identical increments into the same
overwritten dirs. ``overlap_report`` bounds its increment scan at the
commit point (negative consolidated ids admitted — offline compaction
bounds itself at the frontier, mirroring ``compact_retrieval_index``),
so a mid-crash report never sees an increment whose membership append
didn't land.

Reference parity: no counterpart in the reference (838-LoC ETL, no
analytics); north-star extension — the maintained corpus-health
dashboard entry for feed-syndication drift.
"""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..batchstore import (
    append_batch_increment,
    consolidate_batch_store,
    ensure_store_params,
    has_rebuilt_marker,
    last_batch_id,
    maybe_consolidate_in_stream,
    prefix_bucket,
    read_batch_store,
    sequential_fold_guard,
)

_N_BUCKETS = 64

_STORES: tuple[tuple[str, list | None], ...] = (
    ("shingles", ["bucket"]),
    ("pair_inc", None),
    ("count_inc", None),
)


def _store_map(odir: Path) -> dict:
    return {odir / name: part for name, part in _STORES}


def fold_batch(
    spark: SparkSession,
    out_dir: str | Path,
    batch_df: DataFrame,
    batch_id: int,
    source_col: str,
    text_col: str,
    shingle_n: int = 8,
) -> None:
    """Fold ONE micro-batch into the maintained matrix. Idempotent: the
    membership store's last-id guard skips replays; a crash between the
    increment writes and the membership append replays to identical
    content (history is unchanged until the LAST write lands)."""
    from ..functions.textfn import doc_shingles

    odir = Path(out_dir)
    odir.mkdir(parents=True, exist_ok=True)
    ensure_store_params(
        odir,
        {
            "kind": "source_overlap",
            "source_col": source_col,
            "text_col": text_col,
            "shingle_n": int(shingle_n),
            "n_buckets": _N_BUCKETS,
        },
    )
    sh_store = odir / "shingles"
    if not sequential_fold_guard(
        batch_id, last_batch_id(sh_store), odir, rebuilt=has_rebuilt_marker(odir)
    ):
        return

    batch_sh = doc_shingles(
        batch_df.select(
            F.col(source_col).alias("source"), F.col(text_col).alias("text")
        ),
        shingle_n,
        "source",
    ).withColumn("bucket", prefix_bucket(F.col("s"), _N_BUCKETS))
    batch_sh = batch_sh.cache()
    new = None
    try:
        buckets = sorted(
            r["bucket"] for r in batch_sh.select("bucket").distinct().collect()
        )
        if not buckets:  # empty batch: nothing to fold, guard stays behind
            return
        hist = None
        if any(sh_store.glob("ingest_batch=*")):
            hist = (
                read_batch_store(spark, sh_store)
                .filter(F.col("bucket").isin(buckets))  # partition-pruned
                .drop("ingest_batch")
            )
        new = (
            batch_sh
            if hist is None
            else batch_sh.join(hist, ["bucket", "s", "source"], "left_anti")
        ).cache()

        # new holder × distinct HISTORY holders of the same shingle …
        pairs = None
        if hist is not None:
            hist_holders = hist.join(
                new.select("bucket", "s").distinct(), ["bucket", "s"], "left_semi"
            ).select("s", F.col("source").alias("other"))
            pairs = (
                new.select("s", "source")
                .join(hist_holders, "s")
                .select(
                    F.least("source", "other").alias("s1"),
                    F.greatest("source", "other").alias("s2"),
                )
            )
        # … plus new × new pairs within the batch
        a = new.select("s", F.col("source").alias("sa"))
        b = new.select("s", F.col("source").alias("sb"))
        intra = (
            a.join(b, "s")
            .filter(F.col("sa") < F.col("sb"))
            .select(F.col("sa").alias("s1"), F.col("sb").alias("s2"))
        )
        pairs = intra if pairs is None else pairs.unionByName(intra)
        pair_inc = pairs.groupBy("s1", "s2").agg(
            F.count(F.lit(1)).alias("d")
        )
        count_inc = new.groupBy("source").agg(F.count(F.lit(1)).alias("d"))

        # increments FIRST, membership append LAST (the commit point)
        append_batch_increment(pair_inc, odir / "pair_inc", batch_id)
        append_batch_increment(count_inc, odir / "count_inc", batch_id)
        append_batch_increment(
            new.select("source", "s", "bucket"),
            sh_store,
            batch_id,
            partition_by="bucket",
        )
    finally:
        if new is not None:
            new.unpersist()
        batch_sh.unpersist()


def overlap_report(spark: SparkSession, out_dir: str | Path) -> DataFrame | None:
    """The maintained matrix: per source pair, shared distinct shingles
    and Jaccard — the batch query's exact arithmetic over the summed
    increments, bounded at the membership store's commit point so a
    mid-crash window's orphan increments are invisible. None before the
    first committed batch."""
    from ..operators.overlap import jaccard_matrix

    odir = Path(out_dir)
    tid = last_batch_id(odir / "shingles")
    if tid < 0:
        return None
    if not any((odir / "pair_inc").glob("ingest_batch=*")):
        # every committed batch's pair increment was empty (single-source
        # corpus, or no cross-source shared shingle yet): the matrix is
        # legitimately empty — the store holds only empty-batch sentinels
        # and reading it would throw UNABLE_TO_INFER_SCHEMA
        return spark.createDataFrame(
            [], "s1 string, s2 string, n_shared bigint, jaccard double"
        )
    committed = (F.col("ingest_batch") <= tid) | (F.col("ingest_batch") < 0)
    pairs = (
        read_batch_store(spark, odir / "pair_inc")
        .filter(committed)
        .groupBy("s1", "s2")
        .agg(F.sum("d").alias("n_shared"))
    )
    counts = (
        read_batch_store(spark, odir / "count_inc")
        .filter(committed)
        .groupBy("source")
        .agg(F.sum("d").alias("n"))
    )
    return jaccard_matrix(pairs, counts)


def compact_overlap_store(
    spark: SparkSession, out_dir: str | Path
) -> dict[str, int]:
    """OFFLINE: fold the stores' per-batch dirs (run while the stream is
    not). The two increment stores are bounded at the membership store's
    commit frontier — folding an orphan increment (crash window: written
    but its membership append never landed) into a negative consolidated
    dir would smuggle it past the report's committed-snapshot filter
    (the compact_retrieval_index discipline)."""
    odir = Path(out_dir)
    tid = last_batch_id(odir / "shingles")
    out: dict[str, int] = {}
    for name, part in _STORES:
        store = odir / name
        if store.exists():
            bound = None if name == "shingles" else tid
            out[name] = consolidate_batch_store(
                spark, store, partition_by=part, up_to=bound
            )
    return out


def start_overlap_stream(
    spark: SparkSession,
    corpus_dir: str | Path,
    out_dir: str | Path,
    checkpoint_dir: str | Path,
    schema: str,
    source_col: str,
    text_col: str,
    shingle_n: int = 8,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    consolidate_every: int | None = 64,
) -> StreamingQuery:
    """Stream corpus parquet batches into the maintained overlap matrix.
    ``available_now=True`` drains what's landed and stops."""
    odir = Path(out_dir)
    odir.mkdir(parents=True, exist_ok=True)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(str(corpus_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(
            spark, odir, batch_df, batch_id, source_col, text_col, shingle_n
        )
        maybe_consolidate_in_stream(
            spark, _store_map(odir), batch_id, consolidate_every
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", str(checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

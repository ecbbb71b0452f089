"""Incremental NEAR-dedup (MinHash + LSH) against history — the
probabilistic sibling of ``dedup_stream``.

Maintains a near-duplicate-free corpus under continuous ingestion: a new
document is KEPT iff (a) it survives intra-batch near-dedup (the batch
LSH pipeline: ``minhash_lsh_pairs`` → connected components → min-id
survivor per cluster) and (b) it has no verified near-duplicate
(exact Jaccard ≥ ``min_jaccard``) among previously-KEPT documents. This
is the production corpus-maintenance semantic — dedup against the
retained set, greedy first-arrival-wins — deliberately NOT a global
transitive re-clustering of all history per batch (which would be
O(corpus); offline re-clustering stays the batch operators' job).

Stores under ``out_dir``:

- ``docs/`` — kept documents (id, text, ``doc_prefix`` partition column:
  ``pmod(xxhash64(id), n_prefix)``), so the verification step's
  candidate fetch is a partition-pruned keyed read;
- ``band_index/`` — one (band, bh, doc) row per kept doc per LSH band,
  partitioned by ``bh_prefix = pmod(xxhash64(band, bh), n_prefix)`` —
  the against-history candidate probe.

Per-batch cost is O(batch + collision candidates), never O(corpus):

- signatures/bands for the batch: one shingle pass (the shared
  ``banded_minhash_tables``, bit-identical to the batch operator);
- the probe scans the band index pruned to the batch's touched bucket
  prefixes (driver-literal ``isin`` → ``PartitionFilters``) and
  semi-joins it against the BROADCAST batch bucket set — the index is
  never shuffled;
- per-bucket candidate fan-out is capped (``bucket_cap``, smallest doc
  ids win — deterministic): history holds only KEPT docs, so buckets
  cannot crowd with exact duplicates, but a family of just-distinct
  near-misses could still accrete; the cap bounds the verify join at
  the standard LSH recall trade-off and is recorded honestly here
  rather than hidden;
- verification fetches ONLY candidate old docs (prefix-pruned +
  broadcast-semi keyed read of ``docs/``), re-shingles that bounded
  slice, and runs the shared candidate-restricted exact-Jaccard join
  (``verify_candidate_pairs``).

Exactly-once follows ``dedup_stream``'s recipe: both stores key
increment dirs by micro-batch id (tmp + atomic rename, idempotent
overwrite), ``docs`` is written before ``band_index``, and the replay
guard skips only batches folded into BOTH stores — a crash between the
writes replays against an index without the batch, recomputing the
identical kept set (all winner rules are deterministic). Offline
consolidation (``compact_near_dedup_store``) reuses the batchstore
marker protocol.

Short documents (fewer than ``n`` tokens) have no shingles, hence no
signature or bands: they are always kept and never candidates — the
same blind spot as the batch operator, inherent to shingle sketches.
"""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.streaming import StreamingQuery

from ..batchstore import (
    append_batch_increment,
    consolidate_batch_store,
    ensure_store_params,
    last_batch_id,
    maybe_consolidate_in_stream,
    read_batch_store,
)
from ..operators.dedup import banded_minhash_tables, verify_candidate_pairs
from ..operators.graph import connected_components


def _prefix(col, n_prefix: int):
    from ..batchstore import prefix_bucket

    return prefix_bucket(col, n_prefix)


def _band_prefix(band_col, bh_col, n_prefix: int):
    from ..batchstore import prefix_bucket

    return prefix_bucket(band_col, n_prefix, bh_col)


def current_kept_docs(spark: SparkSession, out_dir: str | Path) -> DataFrame | None:
    """The maintained near-duplicate-free document table MINUS any
    retroactive revocations (funnel eval-generation upgrades write a
    ``revoked`` store here — see
    ``corpus_pipeline_stream.revoke_corpus_eval_generation``), or None
    before the first batch. Revocations are benchmark-contamination-
    sized, so the anti-join broadcasts. The docs/band stores themselves
    are never rewritten: a revoked doc's signature intentionally stays
    in the band index, so near-duplicates of revoked content are still
    recognized instead of being re-admitted."""
    store = Path(out_dir) / "docs"
    if not store.exists() or not any(store.glob("ingest_batch=*")):
        return None
    docs = read_batch_store(spark, store).drop("ingest_batch")
    rev_store = Path(out_dir) / "revoked"
    if rev_store.exists() and any(rev_store.glob("ingest_batch=*")):
        from .decontam_stream import _revocation_key

        rev = read_batch_store(spark, rev_store).drop("ingest_batch")
        key = _revocation_key(rev, rev_store, docs.columns)
        docs = docs.join(
            F.broadcast(rev.select(*key).distinct()), on=key, how="left_anti"
        )
    return docs


def history_buckets(
    spark: SparkSession, out_dir: str | Path, touched_prefixes: list[int]
) -> DataFrame:
    """(band, bh, doc) rows of kept docs in the touched bucket-prefix
    partitions — planning-time pruned (the literal ``isin`` lands in
    ``PartitionFilters``)."""
    store = Path(out_dir) / "band_index"
    return (
        read_batch_store(spark, store)
        .filter(F.col("bh_prefix").isin([int(p) for p in touched_prefixes]))
        .select("band", "bh", "doc")
    )


def compact_near_dedup_store(
    spark: SparkSession, out_dir: str | Path
) -> dict[str, int]:
    """OFFLINE: fold each store's per-batch dirs into one consolidated
    partition (crash-safe marker protocol). Run while the stream is NOT
    running."""
    odir = Path(out_dir)
    out: dict[str, int] = {}
    for name, part in _STORES:
        store = odir / name
        if store.exists():
            out[name] = consolidate_batch_store(spark, store, partition_by=part)
    return out


# store name -> partition columns; shared by offline compaction and the
# in-stream consolidation hook so the two can never disagree on layout.
_STORES: tuple[tuple[str, list[str] | None], ...] = (
    ("docs", ["doc_prefix"]),
    ("band_index", ["bh_prefix"]),
    # Retroactive eval-generation revocations (written only while the
    # stream is stopped; read as an anti-join by current_kept_docs).
    ("revoked", None),
)


def _store_map(odir: Path) -> dict[Path, list[str] | None]:
    return {odir / name: part for name, part in _STORES}


def fold_batch(
    spark: SparkSession,
    out_dir: str | Path,
    batch_df: DataFrame,
    batch_id: int,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_jaccard: float = 0.8,
    n_prefix: int = 256,
    bucket_cap: int = 64,
) -> DataFrame | None:
    """Fold ONE micro-batch through against-history near-dedup — the
    per-batch core, exposed so ``corpus_pipeline_stream`` can chain the
    gates inside a single ``foreachBatch``. Returns this batch's KEPT
    rows read back from the just-written increment dir (the downstream
    stage's input), or None when everything was a duplicate. Idempotent:
    an already-folded batch returns its stored increment without
    re-folding."""
    odir = Path(out_dir)
    odir.mkdir(parents=True, exist_ok=True)
    # The shingle width, signature shape, and prefix modulus are baked
    # into every band-index row and partition ever written; a restart
    # with different values computes incomparable band hashes / probes
    # the wrong partitions — refuse loudly. min_jaccard and bucket_cap
    # are POLICY (tunable per restart): they change verdicts, not the
    # stored layout.
    ensure_store_params(
        odir,
        {
            "n": int(n),
            "num_hashes": int(num_hashes),
            "bands": int(bands),
            "n_prefix": int(n_prefix),
        },
    )
    docs_store = odir / "docs"
    band_store = odir / "band_index"

    def _stored() -> DataFrame | None:
        inc = docs_store / f"ingest_batch={batch_id}"
        return spark.read.parquet(str(inc)) if inc.exists() else None

    if batch_id <= min(last_batch_id(docs_store), last_batch_id(band_store)):
        return _stored()
    # Full rows ride through to the docs store (the kept corpus must not
    # lose metadata columns); the signature tables work on the (id, text)
    # projection only.
    batch_full = batch_df.cache()
    batch = batch_full.select(id_col, text_col)
    cached = [batch_full]
    try:
        sh_new, per_new, banded_new = banded_minhash_tables(
            batch, id_col, text_col, n=n, num_hashes=num_hashes, bands=bands
        )
        cached.append(per_new)  # banded_minhash_tables caches per_doc

        # (a) intra-batch near-dedup: self-join candidates → verified
        # pairs → connected components → min-id survivor per cluster.
        a, b = banded_new.alias("a"), banded_new.alias("b")
        intra_cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col("a.doc") < F.col("b.doc")),
            )
            .select(F.col("a.doc").alias("doc1"), F.col("b.doc").alias("doc2"))
            .distinct()
        )
        intra = verify_candidate_pairs(
            intra_cand, sh_new, per_new, sh_new, per_new,
            num_hashes=num_hashes, min_jaccard=min_jaccard,
        )
        comp = connected_components(
            intra.select(F.col("doc1").alias("src"), F.col("doc2").alias("dst"))
        )
        drop_intra = (
            comp.filter(F.col("vertex") != F.col("component"))
            .select(F.col("vertex").alias("doc"))
        )
        kept = batch_full.join(
            F.broadcast(drop_intra),
            batch_full[id_col] == drop_intra["doc"],
            "left_anti",
        )
        kept_banded = banded_new.join(
            F.broadcast(drop_intra), "doc", "left_anti"
        ).cache()  # reused: touched collect, bucket set, cross-cand, append
        cached.append(kept_banded)

        # (b) against-history probe, only if an index exists.
        if band_store.exists() and any(band_store.glob("ingest_batch=*")):
            touched = sorted(
                r["p"]
                for r in kept_banded.select(
                    _band_prefix(F.col("band"), F.col("bh"), n_prefix).alias("p")
                )
                .distinct()
                .collect()
            )
            if touched:
                batch_buckets = kept_banded.select("band", "bh").distinct()
                hits = history_buckets(spark, odir, touched).join(
                    F.broadcast(batch_buckets), ["band", "bh"], "left_semi"
                )
                # Deterministic per-bucket candidate cap (smallest old
                # ids win) — bounds the verify join under bucket
                # crowding, with per-batch cap-pressure audit (a bucket
                # at the cap can hide a true near-dup's twin: the audit
                # is the operator's recall-loss signal).
                from ..batchstore import CapAudit, cap_per_bucket

                hits = cap_per_bucket(
                    hits, ["band", "bh"], "doc", bucket_cap,
                    audit=CapAudit(odir, "band_index", batch_id),
                )
                cross_cand = (
                    kept_banded.join(
                        F.broadcast(
                            hits.select(
                                "band", "bh", F.col("doc").alias("doc1")
                            )
                        ),
                        ["band", "bh"],
                    )
                    .select("doc1", F.col("doc").alias("doc2"))
                    .distinct()
                    .cache()
                )
                cached.append(cross_cand)
                old_ids = cross_cand.select(
                    F.col("doc1").alias(id_col)
                ).distinct()
                old_prefixes = sorted(
                    r["p"]
                    for r in old_ids.select(
                        _prefix(F.col(id_col), n_prefix).alias("p")
                    )
                    .distinct()
                    .collect()
                )
                old_docs = (
                    read_batch_store(spark, docs_store)
                    .filter(F.col("doc_prefix").isin(old_prefixes))
                    .join(F.broadcast(old_ids), id_col, "left_semi")
                    .select(id_col, text_col)
                )
                sh_old, per_old, _ = banded_minhash_tables(
                    old_docs, id_col, text_col,
                    n=n, num_hashes=num_hashes, bands=bands,
                )
                cached.append(per_old)
                matched = (
                    verify_candidate_pairs(
                        cross_cand, sh_old, per_old, sh_new, per_new,
                        num_hashes=num_hashes, min_jaccard=min_jaccard,
                    )
                    .select(F.col("doc2").alias("doc"))
                    .distinct()
                )
                kept = kept.join(
                    F.broadcast(matched),
                    kept[id_col] == matched["doc"],
                    "left_anti",
                )
                kept_banded = kept_banded.join(
                    F.broadcast(matched), "doc", "left_anti"
                )

        kept = kept.withColumn(
            "doc_prefix", _prefix(F.col(id_col), n_prefix)
        )
        # Re-delivery guard: an at-least-once upstream can re-land a doc
        # under its ORIGINAL id in a later batch. Shingled docs are
        # (mostly) caught by the jaccard probe, but a sub-shingle-width
        # doc has no bands and would re-admit, duplicating its id in the
        # kept store — so drop any kept id already present in history,
        # via the same prefix-pruned + broadcast-keyed read the probes
        # use (bounded by the batch's touched doc prefixes).
        if docs_store.exists() and any(docs_store.glob("ingest_batch=*")):
            kept_prefixes = sorted(
                r["p"]
                for r in kept.select(F.col("doc_prefix").alias("p"))
                .distinct()
                .collect()
            )
            if kept_prefixes:
                resent = (
                    read_batch_store(spark, docs_store)
                    # exclude THIS batch's own increment: a crash between
                    # the docs and band writes replays the batch with
                    # docs/ingest_batch=B already present, and matching
                    # against it would empty the kept set — the replay
                    # must recompute the identical admission instead
                    .filter(F.col("ingest_batch") != batch_id)
                    .filter(F.col("doc_prefix").isin(kept_prefixes))
                    .select(id_col)
                    .join(F.broadcast(kept.select(id_col)), id_col, "left_semi")
                )
                kept = kept.join(F.broadcast(resent), id_col, "left_anti")
                kept_banded = kept_banded.join(
                    F.broadcast(resent.select(F.col(id_col).alias("doc"))),
                    "doc",
                    "left_anti",
                )
        kept = kept.cache()
        cached.append(kept)
        # Materialize BOTH outputs BEFORE any store write: the banded
        # rows' lineage reads docs_store (the old-docs fetch), and an
        # uncheckpointed plan would re-execute that read during the band
        # append — AFTER the docs append just added this batch's own
        # increment to the very store it scans (read-after-write), on
        # top of paying the whole probe twice. localCheckpoint cuts the
        # lineage and pins the pre-write view.
        kept_banded = kept_banded.localCheckpoint(eager=True)
        # docs BEFORE band_index (crash-replay argument above). BOTH
        # stores are recorded every batch — an empty side (all-duplicate
        # batch; kept-but-bandless batch of sub-shingle-width docs)
        # leaves an empty-fold sentinel instead of a data dir, so the
        # min-across-stores guard advances and a fresh-checkpoint
        # renumbered replay skips the batch instead of overwriting
        # committed increments with different content.
        admitted = append_batch_increment(
            kept, docs_store, batch_id, partition_by="doc_prefix"
        )
        append_batch_increment(
            kept_banded.select(
                "band",
                "bh",
                "doc",
                _band_prefix(F.col("band"), F.col("bh"), n_prefix).alias(
                    "bh_prefix"
                ),
            ),
            band_store,
            batch_id,
            partition_by="bh_prefix",
        )
        if not admitted:
            return None
    finally:
        for c in cached:
            c.unpersist()
    return _stored()


def start_near_dedup_stream(
    spark: SparkSession,
    corpus_dir: str | Path,
    out_dir: str | Path,
    checkpoint_dir: str | Path,
    schema: str,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_jaccard: float = 0.8,
    n_prefix: int = 256,
    bucket_cap: int = 64,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    consolidate_every: int | None = 64,
) -> StreamingQuery:
    """Stream corpus parquet files through against-history near-dedup.
    ``available_now=True`` drains what's landed and stops.
    ``consolidate_every=N`` folds the stores' batch dirs in-stream every
    N batches (no stop-the-stream window); ``None`` = offline-only."""
    odir = Path(out_dir)
    odir.mkdir(parents=True, exist_ok=True)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(str(corpus_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(
            spark, odir, batch_df, batch_id,
            id_col=id_col, text_col=text_col, n=n, num_hashes=num_hashes,
            bands=bands, min_jaccard=min_jaccard, n_prefix=n_prefix,
            bucket_cap=bucket_cap,
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

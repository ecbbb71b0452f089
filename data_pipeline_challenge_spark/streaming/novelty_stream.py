"""Novelty gate — boilerplate-share-against-history screening, as a
stream stage.

The at-ingest face of the batch ``boilerplate_share_top20`` score: a doc
whose DISTINCT n-token shingles have mostly been seen before is template
re-flow (syndicated boilerplate, mirrored pages with fresh filler), a
class exact dedup misses (the doc differs somewhere) and MinHash
near-dedup under-weights (the template is diluted). The gate scores each
arriving doc as ``n_seen / n_shingles`` over the maintained seen-shingle
set and diverts docs at-or-above ``max_share``; short docs (< n tokens,
zero shingles) pass with share 0.0 — bounding short docs is the quality
gate's job, not this one's.

Semantics are AGAINST-HISTORY, the dedup_stream precedent: a doc is
scored against the shingles of everything that arrived in PRIOR batches
(admitted or diverted — a template is boilerplate regardless of what
happened to its first carrier), and the batch's own shingles fold in
AFTER scoring, so intra-batch copies of a fresh template all score alike
and the verdict for a given arrival order is deterministic. As with the
dedup gates, the arrival order IS part of the declared semantics.

Scale shape: the seen-shingle store is PARTITIONED by a shingle hash
bucket; the batch joins against history pruned to its own buckets
(driver-side literal ⇒ planning-time pruning), so per-batch cost is
O(batch shingles + matched buckets), never O(history). Shingles are
md5'd (fixed shuffle width); state is O(distinct shingles ever), the
same asymptotic as the exact-dedup fingerprint index.

Exactly-once follows the family recipe: ``docs``/``rejected`` increments
first, the seen-shingle append LAST — its last batch id is the commit
point; a replay below it returns the stored increment, a crash between
the writes replays against UNCHANGED history into the same overwritten
dirs.
"""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..batchstore import (
    account_empty_fold,
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
    ("docs", None),
    ("rejected", None),
    ("shingles", ["bucket"]),
)


def _store_map(odir: Path) -> dict:
    return {odir / name: part for name, part in _STORES}


def fold_batch(
    spark: SparkSession,
    out_dir: str | Path,
    batch_df: DataFrame,
    batch_id: int,
    id_col: str,
    text_col: str,
    shingle_n: int = 8,
    max_share: float = 0.8,
) -> DataFrame | None:
    """Screen ONE micro-batch against the seen-shingle history. Returns
    the admitted rows (with ``n_shingles``/``n_seen``/``novelty_share``
    columns) read back from the just-written increment, or None for an
    empty batch. Idempotent: an already-committed batch returns its
    stored increment."""
    from ..functions.textfn import doc_shingles

    odir = Path(out_dir)
    odir.mkdir(parents=True, exist_ok=True)
    ensure_store_params(
        odir,
        {
            "kind": "novelty_gate",
            "id_col": id_col,
            "text_col": text_col,
            "shingle_n": int(shingle_n),
            "max_share": float(max_share),
            "n_buckets": _N_BUCKETS,
        },
    )
    reserved = {"n_shingles", "n_seen", "novelty_share", "_nid"}
    clash = reserved & set(batch_df.columns)
    if clash:
        raise ValueError(
            f"input column(s) {sorted(clash)} collide with the novelty "
            "gate's score columns — rename them before the gate"
        )
    docs_store = odir / "docs"
    sh_store = odir / "shingles"

    def _stored() -> DataFrame | None:
        inc = docs_store / f"ingest_batch={batch_id}"
        return spark.read.parquet(str(inc)) if inc.exists() else None

    if not sequential_fold_guard(
        batch_id, last_batch_id(sh_store), odir, rebuilt=has_rebuilt_marker(odir)
    ):
        return _stored()

    batch = batch_df.cache()
    try:
        if not batch.take(1):
            # empty micro-batch: sentinel accounting keeps the id
            # sequence gap-free for the sequential guard (r18)
            account_empty_fold(batch, (docs_store, sh_store), batch_id)
            return None
        # ids key the score join: a NULL id would never match it (the
        # doc would be admitted at share 0.0 while its shingles still
        # fold into history) — refuse loudly. Uniqueness is the funnel
        # family's standing contract (retrieval_stream header): two
        # rows sharing an id would get one merged distinct-shingle
        # score here, so run behind exact dedup, as the funnel does.
        if batch.filter(F.col(id_col).isNull()).take(1):
            raise ValueError(
                f"novelty gate requires non-null {id_col!r}: a null id "
                "cannot be scored (it would silently bypass the gate)"
            )
        sh = doc_shingles(
            batch.select(
                F.col(id_col).alias("_nid"), F.col(text_col).alias("text")
            ),
            shingle_n,
            "_nid",
        ).withColumn("bucket", prefix_bucket(F.col("s"), _N_BUCKETS))
        sh = sh.cache()
        hist = None
        try:
            buckets = sorted(
                r["bucket"] for r in sh.select("bucket").distinct().collect()
            )
            if buckets and any(sh_store.glob("ingest_batch=*")):
                # cached: the matched-bucket slice feeds both the score
                # join and the new-shingle anti-join below — one history
                # scan per batch, not two (the dedup_stream discipline)
                hist = (
                    read_batch_store(spark, sh_store)
                    .filter(F.col("bucket").isin(buckets))  # pruned
                    .select("bucket", "s")
                    .cache()
                )
            flagged = (
                sh
                if hist is None
                else sh.join(
                    hist.withColumn("_seen", F.lit(1)).distinct(),
                    ["bucket", "s"],
                    "left",
                )
            )
            if hist is None:
                flagged = flagged.withColumn("_seen", F.lit(None).cast("int"))
            scores = flagged.groupBy("_nid").agg(
                F.count(F.lit(1)).alias("n_shingles"),
                F.coalesce(F.sum("_seen"), F.lit(0))
                .cast("long")
                .alias("n_seen"),
            )
            raw_share = F.coalesce(
                F.col("n_seen").cast("double")
                / F.col("n_shingles").cast("double"),
                F.lit(0.0),  # zero-shingle docs are novel
            )
            # the verdict compares the RAW ratio — rounding first would
            # misclassify shares within half an ulp-of-round(6) of the
            # threshold; the stored evidence column is rounded for the
            # usual cross-engine display stability
            scored = (
                batch.join(
                    scores.withColumnRenamed("_nid", id_col), id_col, "left"
                )
                .select(
                    "*",
                    (raw_share < float(max_share)).alias("_keep"),
                    F.round(raw_share, 6).alias("novelty_share"),
                )
                .withColumn(
                    "n_shingles",
                    F.coalesce("n_shingles", F.lit(0).cast("long")),
                )
                .withColumn(
                    "n_seen", F.coalesce("n_seen", F.lit(0).cast("long"))
                )
                .cache()  # feeds BOTH appends: score once, not twice
            )
            try:
                # docs and rejected first; the seen-shingle append below
                # is the commit point the replay guard keys on
                append_batch_increment(
                    scored.filter(F.col("_keep")).drop("_keep"),
                    docs_store,
                    batch_id,
                )
                append_batch_increment(
                    scored.filter(~F.col("_keep")).drop("_keep"),
                    odir / "rejected",
                    batch_id,
                )
                new_sh = (
                    sh.select("bucket", "s").distinct()
                    if hist is None
                    else sh.select("bucket", "s")
                    .distinct()
                    .join(hist, ["bucket", "s"], "left_anti")
                )
                append_batch_increment(
                    new_sh, sh_store, batch_id, partition_by="bucket"
                )
            finally:
                scored.unpersist()
        finally:
            sh.unpersist()
            if hist is not None:
                hist.unpersist()
    finally:
        batch.unpersist()
    return _stored()


def current_admitted_docs(
    spark: SparkSession, out_dir: str | Path
) -> DataFrame | None:
    """Rows the gate admitted so far (with their scores), or None before
    the first non-empty batch."""
    store = Path(out_dir) / "docs"
    if not store.exists() or not any(store.glob("ingest_batch=*")):
        return None
    return read_batch_store(spark, store).drop("ingest_batch")


def rejected_log(spark: SparkSession, out_dir: str | Path) -> DataFrame | None:
    """Diverted rows with the score evidence, or None if nothing was
    ever diverted."""
    store = Path(out_dir) / "rejected"
    if not store.exists() or not any(store.glob("ingest_batch=*")):
        return None
    return read_batch_store(spark, store).drop("ingest_batch")


def compact_novelty_store(
    spark: SparkSession, out_dir: str | Path
) -> dict[str, int]:
    """OFFLINE: fold the stores' per-batch dirs (run while the stream is
    not). The doc stores are bounded at the seen-shingle commit frontier
    so a crash-window orphan increment cannot be folded past the replay
    guard's reach (the compact_retrieval_index discipline)."""
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


def start_novelty_stream(
    spark: SparkSession,
    corpus_dir: str | Path,
    out_dir: str | Path,
    checkpoint_dir: str | Path,
    schema: str,
    id_col: str,
    text_col: str,
    shingle_n: int = 8,
    max_share: float = 0.8,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    consolidate_every: int | None = 64,
) -> StreamingQuery:
    """Stream corpus parquet files through the novelty gate.
    ``available_now=True`` drains what's landed and stops."""
    odir = Path(out_dir)
    odir.mkdir(parents=True, exist_ok=True)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(str(corpus_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(
            spark, odir, batch_df, batch_id, id_col, text_col,
            shingle_n, max_share,
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

"""Structured Streaming surface.

Ingestion: ``ingest_stream`` (file-source ingest, foreachBatch = the
batch pipeline). Event-time analytics: ``windows`` (tumbling / sliding /
session builders, batch/stream-agnostic), ``stateful``
(applyInPandasWithState / transformWithStateInPandas running aggregates).
Maintained structures, all on the per-batch increment / versioned-publish
exactly-once recipes: ``rollup_stream`` (continuous aggregate),
``packing_stream`` (incremental packed table), ``index_stream``
(persisted-ANN-index increments). Screening gates for a training-data
corpus — each exposing an idempotent per-batch ``fold_batch`` core:
``filter_gate_stream`` (stateless predicate / Gopher quality),
``decontam_stream`` (benchmark overlap), ``dedup_stream`` (exact,
against history), ``near_dedup_stream`` (MinHash+LSH), and
``embedding_dedup_stream`` (cosine over a servable LSH index) — composed
end-to-end by ``corpus_pipeline_stream``. Maintained analytics over the
same recipes: ``heavy_stream`` (mergeable Misra-Gries heavy hitters with
exact candidate recount), ``retrieval_stream`` (BM25 inverted-stats
index; searches never rescan text), ``quantile_stream`` /
``cms_stream`` / ``kmv_stream`` (exact distributions, Count-Min
frequencies, bottom-k cardinalities — every sketch store folds by its
own mergeability law), ``transition_stream`` (cross-batch sequence
stitching via a per-user frontier; pair it with ``resequence`` — the
watermarked event-time resequencer — when arrivals can run out of
order), ``retention_stream`` (day-granular activity set serving
any cohort granularity), and ``paths_stream`` (per-user-day first-3
path prefixes — bottom-k merge with payload).
"""

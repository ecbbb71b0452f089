"""Measure the composed corpus funnel's steady-state throughput
(VERDICT r8 #4).

Runs the REAL stream (``start_corpus_pipeline_stream`` with the
canonical configuration: PII-scrub transform → Gopher quality →
decontamination → exact dedup → near dedup) over parquet batches of two
sizes and reports docs/sec plus per-stage wall share, substantiating —
or refuting — the README's claim that the ~25-30s/batch fixed job
overhead amortizes at production batch sizes.

Input docs are deterministic chimeras of the sf0.1 ``documents`` table
(front half of doc ``i % N`` + back half of a Knuth-hash-chosen second
doc, fresh ids): built FROM the testdata generation (results are keyed
to its fingerprint) but unique at every id and pairwise below the
near-dup threshold, so every stage does real per-doc work at any batch
size instead of the dedup gates collapsing the corpus back to the 5k
source residues.

Per-stage share is measured by wrapping each stage module's
``fold_batch`` — the exact functions the stream's foreachBatch calls.
Each stage materializes its own increment write, so a stage's share
includes the lazy upstream work of its own plan (the stateless
transform's cost lands in the quality stage's first action).

Usage: python tools/bench_funnel.py [--sizes 2500,25000] [--batches 3]
Prints one JSON line; paste the numbers into README.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"


FILES_PER_BATCH = 8  # executor parallelism within a micro-batch


def _chimera_batches(out: Path, sizes: list[int], n_batches: int) -> dict[int, Path]:
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(Path(SF_DIR) / "documents.parquet", columns=["text"])
    texts = [t.as_py() for t in src["text"]]
    n_src = len(texts)

    def chimera(i: int) -> str:
        # Back-parent offset grows with the id RANGE (i // N), so the
        # (front, back) parent pair is unique for every i below N² —
        # every doc is UNIQUE text (no exact dups) and any two docs
        # share at most one half (Jaccard ~1/3, below the 0.8 near-dup
        # threshold). Both batch sizes then see the same per-doc stage
        # composition, instead of one run being mostly duplicates of
        # the other's id residues (any pairing that is a function of
        # i % N alone repeats exactly every N ids).
        a = texts[i % n_src]
        b = texts[(i + 1 + i // n_src) % n_src]
        return a[: len(a) // 2] + " " + b[len(b) // 2 :]

    dirs: dict[int, Path] = {}
    next_id = 0
    mtime = 1_700_000_000
    for size in sizes:
        d = out / f"corpus_{size}"
        d.mkdir(parents=True)
        for bi in range(n_batches):
            ids = list(range(next_id, next_id + size))
            next_id += size
            per = max(1, size // FILES_PER_BATCH)
            mtime += 10
            for fi in range(0, size, per):
                chunk = ids[fi : fi + per]
                tbl = pa.table(
                    {
                        "doc_id": pa.array(chunk, pa.int64()),
                        "text": pa.array([chimera(i) for i in chunk]),
                    }
                )
                p = d / f"batch_{bi}_{fi // per}.parquet"
                pq.write_table(tbl, str(p))
                # Same mtime for all files of one batch: FileStreamSource
                # batches by mtime, maxFilesPerTrigger=FILES_PER_BATCH
                # groups them into one micro-batch.
                os.utime(p, (mtime, mtime))
        dirs[size] = d
    return dirs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2500,25000")
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument(
        "--min-input-partitions",
        type=int,
        default=None,
        help="forward to start_corpus_pipeline_stream: lift each "
        "micro-batch's scan parallelism to this floor (the 100k-docs/"
        "batch point uses 32 so 8 landing files don't starve 32 cores)",
    )
    ap.add_argument(
        "--retrieval-index",
        action="store_true",
        help="also maintain the BM25 retrieval index per batch "
        "(retrieval_index_dir) — measures the index-maintenance tax on "
        "funnel throughput as its own 'retrieval' stage line",
    )
    ap.add_argument(
        "--novelty",
        type=float,
        default=None,
        metavar="MAX_SHARE",
        help="also run the novelty stage at this max boilerplate share "
        "(novelty_max_share) — measures the seen-shingle gate's tax as "
        "its own 'novelty' stage line",
    )
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .appName("bench_funnel")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import pyspark.sql.functions as F

    from bench import _testdata_fingerprint  # provenance stamp
    from data_pipeline_challenge_spark.functions.textfn import scrub_pii
    from data_pipeline_challenge_spark.streaming import corpus_pipeline_stream as cps
    from data_pipeline_challenge_spark.streaming.filter_gate_stream import gopher_keep

    # Wrap each stage's fold_batch (the exact callables foreachBatch runs)
    # with a wall-clock accumulator.
    stage_wall: dict[str, float] = defaultdict(float)
    from data_pipeline_challenge_spark.streaming import (
        novelty_stream,
        retrieval_stream,
    )

    stage_mods = {
        "quality": cps.filter_gate_stream,
        "decontam": cps.decontam_stream,
        "exact": cps.dedup_stream,
        "novelty": novelty_stream,
        "near": cps.near_dedup_stream,
        "retrieval": retrieval_stream,
    }
    for name, mod in stage_mods.items():
        orig = mod.fold_batch

        def timed(*a, _orig=orig, _name=name, **kw):
            t0 = time.perf_counter()
            try:
                return _orig(*a, **kw)
            finally:
                stage_wall[_name] += time.perf_counter() - t0

        mod.fold_batch = timed

    eval_df = (
        spark.read.parquet(str(Path(SF_DIR) / "documents.parquet"))
        .filter(F.pmod(F.col("doc_id"), F.lit(100)) == 0)
        .select("doc_id", "text")
    )

    results = []
    with tempfile.TemporaryDirectory(prefix="funnel_bench_") as td:
        work = Path(td)
        dirs = _chimera_batches(work, sizes, args.batches)
        for size in sizes:
            stage_wall.clear()
            out_dir = work / f"out_{size}"
            t0 = time.perf_counter()
            q = cps.start_corpus_pipeline_stream(
                spark,
                dirs[size],
                out_dir,
                work / f"ckpt_{size}",
                "doc_id long, text string",
                "doc_id",
                "text",
                # The bounds quality_gopher_filter fits to the synthetic
                # corpus — the defaults (min 50 tokens) reject most docs
                # and would starve the downstream stages being measured.
                quality_expr=gopher_keep("text", min_tokens=20, max_tokens=80),
                eval_df=eval_df,
                transform_exprs={"text": scrub_pii(F.col("text"))},
                max_files_per_trigger=FILES_PER_BATCH,
                min_input_partitions=args.min_input_partitions,
                # The synthetic corpus is templated, so docs share many
                # trigrams with ANY 50-doc eval set; the default
                # min_shared=2 diverts ~90% and starves the dedup stages.
                # 8 shared distinct trigrams ≈ 16% diversion — a
                # realistic decontamination rate for this corpus.
                min_shared=8,
                retrieval_index_dir=(
                    work / f"idx_{size}" if args.retrieval_index else None
                ),
                novelty_max_share=args.novelty,
            )
            q.awaitTermination()
            wall = time.perf_counter() - t0
            docs = size * args.batches
            kept = cps.current_corpus(spark, out_dir)
            stages_s = {k: round(v, 2) for k, v in stage_wall.items()}
            overhead = round(wall - sum(stage_wall.values()), 2)
            results.append(
                {
                    "batch_size": size,
                    "n_batches": args.batches,
                    "docs_in": docs,
                    "docs_kept": 0 if kept is None else kept.count(),
                    "wall_s": round(wall, 2),
                    "docs_per_s": round(docs / wall, 1),
                    "stage_wall_s": stages_s,
                    "stream_overhead_s": overhead,
                    "min_input_partitions": args.min_input_partitions,
                    "retrieval_index": bool(args.retrieval_index),
                    "novelty_max_share": args.novelty,
                }
            )
            print(json.dumps(results[-1]), file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "funnel_throughput",
                "testdata": _testdata_fingerprint(SF_DIR),
                "runs": results,
            }
        )
    )


if __name__ == "__main__":
    main()

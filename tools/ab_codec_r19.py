"""Alternating-SESSION A/B for session-level configs (VERDICT r18 #9).

``spark.io.compression.codec`` is a SparkConf (not runtime-settable), so
a within-session interleave is impossible; the next-best causal design
is alternating fresh sessions A,B,A,B,... on one box, each session
running the same shuffle-heaviest queries with the noop sink after a
warmup. The artifact records every per-run second per session so
session-order effects are visible.

Usage:
    python tools/ab_codec_r19.py --conf spark.io.compression.codec \\
        --a lz4 --b zstd --sessions 3 --runs 2 \\
        --queries dedup_duplicated_spans_top20,dedup_ngram_jaccard_top20 \\
        --out plans/r19/ab/io_codec.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _run_session(conf_key: str, conf_val: str, queries: list[str], runs: int,
                 sf_dir: str) -> dict[str, list[float]]:
    from pyspark.sql import SparkSession

    from data_pipeline_challenge_spark.plans import all_queries
    from data_pipeline_challenge_spark.session import RUNTIME_CONFS

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(f"ab-codec-{conf_val}")
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config(conf_key, conf_val)
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.sparkContext.getConf().get(conf_key) == conf_val
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).write.format(
        "noop"
    ).mode("overwrite").save()
    qs = all_queries()
    out: dict[str, list[float]] = {}
    for name in queries:
        qs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        series = []
        for _ in range(runs):
            t0 = time.perf_counter()
            qs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            series.append(round(time.perf_counter() - t0, 3))
        out[name] = series
    spark.stop()
    return out


def main() -> None:
    argv = sys.argv[1:]

    def _opt(flag, default=None):
        return argv[argv.index(flag) + 1] if flag in argv else default

    conf_key = _opt("--conf")
    val_a, val_b = _opt("--a"), _opt("--b")
    n_sessions = int(_opt("--sessions", "3"))
    runs = int(_opt("--runs", "2"))
    queries = _opt("--queries").split(",")
    out_path = _opt("--out")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    series: dict[str, dict[str, list[float]]] = {
        val_a: {q: [] for q in queries},
        val_b: {q: [] for q in queries},
    }
    for i in range(n_sessions):
        for val in (val_a, val_b):
            got = _run_session(conf_key, val, queries, runs, sf_dir)
            for q, xs in got.items():
                series[val][q].extend(xs)
            print(f"session {i} {val}: {got}", file=sys.stderr)
    meds = {
        val: {q: statistics.median(xs) for q, xs in per.items()}
        for val, per in series.items()
    }
    artifact = {
        "ab": f"session_conf:{conf_key}",
        "arm_a": val_a,
        "arm_b": val_b,
        "design": "alternating fresh sessions, per-session warmup, noop sink",
        "sf_dir": sf_dir,
        "series": series,
        "medians": meds,
        "ratio_b_over_a": {
            q: round(meds[val_b][q] / meds[val_a][q], 3) for q in queries
        },
        "load_avg_end": [round(x, 2) for x in os.getloadavg()],
    }
    line = json.dumps(artifact)
    print(line)
    if out_path:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        Path(out_path).write_text(line + "\n")


if __name__ == "__main__":
    main()

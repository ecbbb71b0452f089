"""Dump the formatted physical plan of one A/B arm (module:callable
taking (spark, sf_dir) -> DataFrame) to a file — used to archive the
``plans/r19/<query>_{before,after}.txt`` evidence for shapes that no
longer exist in the registry (the *_r17/*_r18 arms in
tools/ab_arms_r19.py).

Usage:
    python tools/dump_arm_plan.py tools.ab_arms_r19:pagerank_r18 \\
        plans/r19/pagerank_trade_graph_top20_before.txt
"""

from __future__ import annotations

import importlib
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_pipeline_challenge_spark.session import get_spark


def main() -> None:
    spec, out = sys.argv[1], sys.argv[2]
    mod_name, _, fn_name = spec.partition(":")
    fn = getattr(importlib.import_module(mod_name), fn_name)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("dump-arm-plan", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    df = fn(spark, sf_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    Path(out).write_text(plan)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Plan-metric sweep over every declared query (guide §7.2, VERDICT
r18 #5): count Exchange / scan / SortMergeJoin / Cartesian / Python
nodes in each formatted physical plan at a small SF and print the
worst offenders. Construction-only — no query executes (queries whose
construction itself materializes pins do run those pins).

Usage: python tools/plan_sweep.py [--top 20] [--out plans/r19/plan_sweep.json]
"""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_pipeline_challenge_spark.plans import all_queries
from data_pipeline_challenge_spark.session import get_spark


def main() -> None:
    argv = sys.argv[1:]

    def _opt(flag, default):
        return argv[argv.index(flag) + 1] if flag in argv else default

    top = int(_opt("--top", "20"))
    out = _opt("--out", None)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("plan-sweep", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, qd in sorted(all_queries().items()):
        try:
            df = qd.fn(spark, sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — sweep must survive one bad query
            rows.append({"query": name, "error": str(exc)[:200]})
            continue
        rows.append(
            {
                "query": name,
                "exchanges": len(re.findall(r"\bExchange\b", plan)),
                "scans": len(re.findall(r"Scan parquet|Scan text|Scan json", plan)),
                "smj": len(re.findall(r"SortMergeJoin", plan)),
                "cartesian": len(re.findall(r"CartesianProduct", plan)),
                "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
                "python": len(
                    re.findall(
                        r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow"
                        r"|FlatMapGroupsInPandas",
                        plan,
                    )
                ),
            }
        )
    ok = [r for r in rows if "error" not in r]
    ok.sort(key=lambda r: (-r["exchanges"], -r["scans"]))
    print(f"{'query':45s} exch scan smj cart bnlj py")
    for r in ok[:top]:
        print(
            f"{r['query']:45s} {r['exchanges']:4d} {r['scans']:4d} "
            f"{r['smj']:3d} {r['cartesian']:4d} {r['bnlj']:4d} {r['python']:2d}"
        )
    errs = [r for r in rows if "error" in r]
    for r in errs:
        print(f"ERROR {r['query']}: {r['error']}")
    if out:
        Path(out).parent.mkdir(parents=True, exist_ok=True)
        Path(out).write_text(json.dumps(rows, indent=1) + "\n")
        print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Materialize an ~sf1 dataset by replicating sf0.1 N× with
domain-consistent key shifts — the one-off scale spot-run input
(VERDICT r12 #8: the sf0.1 bench cannot expose quadratic blow-ups; a
10× run with per-query timings can).

Every key column is shifted by ``copy_idx * (domain_max + 1)`` with ONE
shift per key DOMAIN (custkey shifts identically in customer and orders,
orderkey in orders and lineitem, …), so referential joins hold and the
copies are disjoint subgraphs. Non-key payloads (text, embeddings,
timestamps) repeat verbatim — which makes dedup/text workloads strictly
HARDER than organic data (every doc gains 9 exact twins), an acceptable
bias for a scaling smoke test.

Usage: python tools/make_scaled_sf.py [src_sf_dir] [out_dir] [copies]
Defaults: /root/testdata/sf0.1  /tmp/sf1x  10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from data_pipeline_challenge_spark.catalog import TABLES
from data_pipeline_challenge_spark.session import get_spark

# key column -> shift domain (same domain = same shift everywhere)
KEY_DOMAIN = {
    "c_custkey": "cust",
    "o_custkey": "cust",
    "o_orderkey": "ord",
    "l_orderkey": "ord",
    "s_suppkey": "supp",
    "l_suppkey": "supp",
    "p_partkey": "part",
    "l_partkey": "part",
    "event_id": "ev",
    "doc_id": "doc",
    "vec_id": "vec",
}
DOMAIN_SOURCE = {  # domain -> (table, column) holding the full key range
    "cust": ("customer", "c_custkey"),
    "ord": ("orders", "o_orderkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "ev": ("events", "event_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark("make-scaled-sf")
    spans: dict[str, int] = {}
    for dom, (tbl, col) in DOMAIN_SOURCE.items():
        mx = (
            spark.read.parquet(f"{src}/{tbl}.parquet")
            .agg(F.max(F.col(col).cast("long")))
            .first()[0]
        )
        spans[dom] = int(mx) + 1

    for tbl in TABLES:
        df = spark.read.parquet(f"{src}/{tbl}.parquet")
        keyed = [c for c in df.columns if c in KEY_DOMAIN]
        if not keyed:  # region/nation: shared dimensions, copy once
            df.coalesce(1).write.mode("overwrite").parquet(
                f"{out}/{tbl}.parquet"
            )
            print(f"{tbl}: copied (shared dim)")
            continue
        rep = df.crossJoin(
            spark.range(copies).withColumnRenamed("id", "_copy")
        )
        for c in keyed:
            dtype = dict(df.dtypes)[c]
            rep = rep.withColumn(
                c,
                (
                    F.col(c).cast("long")
                    + F.col("_copy") * F.lit(spans[KEY_DOMAIN[c]])
                ).cast(dtype),
            )
        rep.drop("_copy").write.mode("overwrite").parquet(
            f"{out}/{tbl}.parquet"
        )
        print(f"{tbl}: x{copies} ({rep.count()} rows)")
    spark.stop()


if __name__ == "__main__":
    main()

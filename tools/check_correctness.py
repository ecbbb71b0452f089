"""Local mirror of the driver's correctness gate.

Runs every declared query on Spark and (when an oracle exists) on DuckDB at
the given sf dir, then compares row count, column names, and
order-insensitive values (floats rounded to 9 significant-ish decimals
before comparison — both sides already round inside the queries, so any
mismatch here is real).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from data_pipeline_challenge_spark.catalog import TABLES
from data_pipeline_challenge_spark.plans import all_queries
from data_pipeline_challenge_spark.session import get_spark


def norm_val(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, bool):
        return int(v)
    return v


_ARROW_NORM = {
    "int8": "i32", "int16": "i32", "int32": "i32", "int64": "i64",
    "float": "f64", "double": "f64", "float32": "f64", "float64": "f64",
    "string": "str", "large_string": "str", "bool": "bool",
    "date32[day]": "date", "date64[ms]": "date",
}
_SPARK_NORM = {
    "tinyint": "i32", "smallint": "i32", "int": "i32", "bigint": "i64",
    "float": "f64", "double": "f64", "string": "str", "boolean": "bool",
    "date": "date",
}


def duck_types(res_arrow):
    out = {}
    for f in res_arrow.schema:
        s = str(f.type)
        out[f.name] = _ARROW_NORM.get(s, "ts" if s.startswith("timestamp") else s)
    return out


def spark_types(df):
    out = {}
    for f in df.schema.fields:
        s = f.dataType.simpleString()
        out[f.name] = _SPARK_NORM.get(s, "ts" if s.startswith("timestamp") else s)
    return out


def norm_rows(cols, rows):
    # sort columns by name, then rows by value tuple (stringified for mixed nulls)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(repr(x) for x in t))
    return [cols[i] for i in order], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = all_queries()
    n_pass = n_fail = n_rows_only = 0
    for name, qd in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qd.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        if qd.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            arrow_tbl = con.execute(qd.oracle).arrow()
            dcols = arrow_tbl.schema.names
            drows = [tuple(r.values()) for r in arrow_tbl.to_pylist()]
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(list(dcols), drows)
        if sc != dc:
            print(f"FAIL  {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
        st, dt_ = spark_types(sdf), duck_types(arrow_tbl)
        type_mismatch = {c: (st.get(c), dt_.get(c)) for c in sc if st.get(c) != dt_.get(c)}
        if type_mismatch:
            print(f"FAIL  {name}: type mismatch {type_mismatch}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL  {name}: rowcount spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            print(f"FAIL  {name}: {len(bad)}/{len(sr)} rows differ; first: {bad[0]}")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(sr)} rows [{time.time()-t0:.1f}s]")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

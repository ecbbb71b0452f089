"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in ``data_pipeline_challenge_spark.plans`` —
each entry is a DataFrame builder paired (where SQL can express it) with a
DuckDB oracle; sketch/LSH operators are declared without oracles and get
the weaker rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_challenge_spark.plans import oracles, queries_callables
from data_pipeline_challenge_spark.plans.relational import q1_pricing_summary
from data_pipeline_challenge_spark.session import tune

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: TPC-H Q1-style pricing summary."""
    tune(spark)
    return q1_pricing_summary(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + north-star."""
    return queries_callables()


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for every SQL-expressible query."""
    return oracles()

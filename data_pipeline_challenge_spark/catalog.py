"""Table catalog over the driver-generated parquet test data.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings, one parquet file/dir per table under an sf dir.

Scale notes (100 TB design): these loaders are plain ``spark.read.parquet``
so Catalyst keeps predicate pushdown / column pruning / partition pruning.
The one special case is ``events`` whose parquet physical type is
INT64(TIMESTAMP_NANOS) — Spark has no nanosecond timestamp, so we read the
raw long (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to
microseconds, which is exactly what DuckDB/Arrow do when converting ns→µs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table; normalizes the events timestamp."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as a proper TimestampType (µs, truncated from ns).

    Also keeps ``ts_ns`` (the raw nanosecond epoch long) so downstream
    windowing can emit timezone-agnostic epoch values with pure arithmetic.
    """
    tune(spark)  # ensure nanosAsLong is on even on an externally built session
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(raw.dtypes)["ts"] == "bigint":
        return raw.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long"))
        )
    # already a timestamp (e.g. future driver regenerates with µs precision)
    return raw.withColumn("ts_ns", (F.unix_micros(F.col("ts")) * F.lit(1000)).cast("long"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register all tables as temp views (used by tests and the SQL surface)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(prefix + t)

"""SparkSession construction and tuning.

The reference pipeline scales horizontally by running more worker containers
(``/root/reference/README.md:87-93``); here the executor pool plays that
role. Defaults are chosen for correctness-at-scale: AQE on (runtime join
strategy + skew splitting), UTC session time, Arrow for any pandas exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs we also (re-)apply at runtime when handed an externally built session
# (e.g. the verification driver's): these are all runtime-settable SQL confs.
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized reader
    # rejects; read as long and convert explicitly (see catalog.load_events).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Runtime re-planning: broadcast-join conversion, partition coalescing,
    # skew-join splitting — all essential at 100 TB where static estimates
    # of shuffle sizes are wrong.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for the few pandas_udf/mapInPandas operators.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def get_spark(
    app_name: str = "data-pipeline-challenge-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract) or
    ``local[*]``. ``shuffle_partitions`` defaults to the core count in local
    mode — on a real cluster you would leave it to AQE's coalescing with a
    high initial partition count instead.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to a session we did not build.

    Deliberately does NOT touch ``spark.sql.session.timeZone``: query outputs
    are designed to be timezone-agnostic (epoch arithmetic / NTZ / dates), so
    we never need to mutate the caller's timezone.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build — defaults still correct
    return spark

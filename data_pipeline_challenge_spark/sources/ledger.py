"""Ingestion ledger — the ``uploaded_files`` collection re-expressed.

Reference (/root/reference/app/models.py:35-47): one mutable document per
file with status + counters, updated by atomic ``$inc`` from concurrent
workers (data_processor.py:115-141). Spark design: an **append-only event
table** (LEDGER_SCHEMA) — each status transition appends a row, and the
"current" ledger is the latest event per file_id (row_number window).
Counters are computed by aggregation over the bronze layer, so the
reference's total=0 completion race (file_splitter.py:72 vs
data_processor.py:126-141 — SURVEY §2 op 14) cannot exist here: the batch
job is the unit of completion. Intentional, documented divergence.
"""

from __future__ import annotations

import datetime as dt
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..schema import LEDGER_SCHEMA


class LedgerStore:
    """Parquet-backed append-only ledger under ``<warehouse>/ledger``."""

    def __init__(self, spark: SparkSession, warehouse_dir: str | Path):
        self.spark = spark
        self.path = str(Path(warehouse_dir) / "ledger")

    def exists(self) -> bool:
        return Path(self.path).exists() and any(Path(self.path).iterdir())

    def read_events(self) -> DataFrame:
        if not self.exists():
            return self.spark.createDataFrame([], LEDGER_SCHEMA)
        return self.spark.read.schema(LEDGER_SCHEMA).parquet(self.path)

    def append(self, rows: list[dict]) -> None:
        """Append status-event rows; fills event_ts if absent."""
        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        full = [{"event_ts": now, **r} for r in rows]
        df = self.spark.createDataFrame(
            [tuple(r.get(f.name) for f in LEDGER_SCHEMA.fields) for r in full],
            LEDGER_SCHEMA,
        )
        df.write.mode("append").parquet(self.path)

    def current(self) -> DataFrame:
        """Latest event per file_id — the queryable ledger state
        (GET /upload/status equivalent, api/main.py:106-127)."""
        w = Window.partitionBy("file_id").orderBy(
            F.col("event_ts").desc(), F.col("status").desc()
        )
        return (
            self.read_events()
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    def status_of(self, file_id: str) -> dict | None:
        rows = self.current().filter(F.col("file_id") == file_id).collect()
        return rows[0].asDict() if rows else None

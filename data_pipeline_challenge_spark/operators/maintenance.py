"""Table maintenance — small-file compaction for parquet directories.

Every long-lived ingest loop accretes small files (each micro-batch, each
retry, each late partition writes a few), and at 100 TB the scan cost is
dominated by file-open overhead and lost min/max pruning long before raw
bytes matter. Compaction rewrites a directory to ~target-sized files,
optionally re-sorting so each output file owns a disjoint key range (the
layout the point-lookup path prunes against, see
pipeline._overwrite_products).

The rewrite is write-new + atomic swap: a crash mid-compaction can never
leave a half-written table (the original survives until the swap). It is
an OFFLINE utility, though — the swap renames the live directory, so a
reader scanning during the swap loses its planned file paths. Run it in a
maintenance window (or on a snapshot), unlike the engine's versioned
tables (products / ledger state / streaming sinks), whose symlink publish
plus two-version retention serves concurrent readers. On a lakehouse
table this whole utility is OPTIMIZE / rewrite_data_files, where the
format's commit protocol makes it safe online.
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import SparkSession


@dataclass
class CompactionReport:
    files_before: int
    files_after: int
    bytes_total: int
    rows: int


def compact_parquet_dir(
    spark: SparkSession,
    path: str | Path,
    target_file_bytes: int = 128 << 20,
    sort_col: str | None = None,
) -> CompactionReport:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(total_bytes / target_file_bytes)`` files (atomic swap).

    With ``sort_col``, output is range-partitioned + sorted on it so every
    file owns a disjoint range (min/max pruning works); without it, a plain
    coalesce-style rewrite (no shuffle — AQE folds the scan into the
    writer's partitioning).
    """
    path = Path(path)
    parts = [p for p in path.rglob("*.parquet") if p.is_file()]
    total = sum(p.stat().st_size for p in parts)
    n_out = max(1, -(-total // target_file_bytes))

    df = spark.read.parquet(str(path))
    if sort_col is not None:
        out = df.repartitionByRange(n_out, sort_col).sortWithinPartitions(sort_col)
    else:
        out = df.coalesce(n_out)

    tmp = path.with_name(path.name + ".compact.tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    out.write.mode("overwrite").parquet(str(tmp))
    rows = spark.read.parquet(str(tmp)).count()

    old = path.with_name(path.name + ".compact.old")
    if old.exists():
        shutil.rmtree(old)
    path.rename(old)
    tmp.rename(path)
    shutil.rmtree(old)

    after = len([p for p in path.rglob("*.parquet") if p.is_file()])
    return CompactionReport(len(parts), after, total, rows)

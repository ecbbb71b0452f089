"""Product-JSON parsing + normalization to the bronze layer.

Reference behavior being reproduced (SURVEY §2 ops 4,9,10,11):

- input is a top-level JSON **array** of objects, parsed incrementally
  (file_splitter.py:117-120); malformed JSON fails the whole file and the
  landing file is retained (file_splitter.py:74-81);
- external ``id``/``_id`` keys are dropped (data_processor.py:82-88);
- a record is valid iff ``code`` is present and a JSON string, and
  ``product_name`` is absent/null or a string (pydantic Product,
  data_processor.py:57-73) — note a JSON *number* code is invalid, which is
  why normalization must see raw JSON types, not a Spark-inferred schema
  (inference would silently stringify numeric codes);
- everything beyond the spine is preserved verbatim (models.py:15-16) — we
  keep it as canonical-JSON strings in the ``attrs`` map.

Execution model: ``binaryFiles`` hands each landing file to an executor
(Hadoop FS API → works identically on HDFS/S3); the parse is executor-side
Python over whole files. The parser is built as a **self-contained nested
closure** so cloudpickle ships it by value — executors do not need this
package on their PYTHONPATH (no --py-files requirement). This is the
ingestion edge, not a query path — records are parsed exactly once, then
live in columnar parquet. At 100 TB the landing format should be JSONL so
files split; the parser accepts both (array + JSONL) and the array parse
documents this delta (SURVEY §2 op 4 "JSONL preferred at scale").
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schema import BRONZE_SCHEMA

MALFORMED_SEQ = -1  # sentinel bronze row emitted for an unparseable file


def _make_normalizer():
    """Build the record normalizer closure. Fully self-contained (stdlib
    only, no references to this module's globals) so it pickles by value —
    shared by the whole-file parser and the envelope-line parser."""
    import json as _json

    DROPPED = ("id", "_id")

    def canon(value):
        # canonical JSON for attrs values: type-preserving, deterministic
        return _json.dumps(value, sort_keys=True, separators=(",", ":"), ensure_ascii=False)

    def normalize(rec, file_id, seq):
        if not isinstance(rec, dict):
            return (file_id, seq, None, None, None, False, "not_an_object")
        rec = {k: v for k, v in rec.items() if k not in DROPPED}
        code = rec.get("code")
        name = rec.get("product_name")
        if not isinstance(code, str):
            # missing/null/non-string code → reject; log id is code-or-MISSING
            # (data_processor.py:63-68)
            reason = "missing_code" if code is None else "non_string_code"
            return (
                file_id,
                seq,
                None if code is None else canon(code),
                None,
                None,
                False,
                reason,
            )
        if name is not None and not isinstance(name, str):
            return (file_id, seq, code, None, None, False, "non_string_product_name")
        attrs = {k: canon(v) for k, v in rec.items() if k not in ("code", "product_name")}
        return (file_id, seq, code, name, attrs, True, None)

    return normalize


def _make_file_parser():
    """Build the executor-side whole-file parser (ships by value)."""
    import json as _json
    import posixpath as _pp

    normalize = _make_normalizer()

    def parse_file(kv):
        path, payload = kv
        file_id = _pp.basename(path)
        try:
            text = payload.decode("utf-8", errors="strict")
            stripped = text.lstrip()
            if stripped.startswith("["):
                data = _json.loads(text)
                if not isinstance(data, list):
                    raise ValueError("top-level JSON is not an array")
                for seq, rec in enumerate(data):
                    yield normalize(rec, file_id, seq)
            else:
                # JSONL: one object per line (the splittable at-scale format)
                seq = 0
                for line in text.splitlines():
                    if not line.strip():
                        continue
                    yield normalize(_json.loads(line), file_id, seq)
                    seq += 1
        except (ValueError, UnicodeDecodeError) as exc:  # incl. JSONDecodeError
            yield (file_id, MALFORMED_SEQ, None, None, None, False, f"malformed_file:{exc}")

    return parse_file


# Driver-side conveniences (unit tests, tooling) over the same closure.
def parse_bytes(path: str, payload: bytes) -> list[tuple]:
    return list(_make_file_parser()((path, payload)))


def normalize_record(rec: object, file_id: str, seq: int) -> tuple:
    """Normalize a single already-parsed record (driver-side/unit-test use)."""
    import json

    (out,) = parse_bytes(file_id, json.dumps([rec], ensure_ascii=False).encode())
    return (out[0], seq, *out[2:])


def read_bronze(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Parse + normalize landing files into the bronze DataFrame.

    One executor task per file (minPartitions=len(paths)); order within a
    file is preserved in ``seq`` — required by the ordered-upsert semantics
    (data_processor.py:101-113).
    """
    if not paths:
        return spark.createDataFrame([], BRONZE_SCHEMA)
    parser = _make_file_parser()
    rdd = spark.sparkContext.binaryFiles(",".join(paths), minPartitions=len(paths))
    rows = rdd.flatMap(parser)
    return spark.createDataFrame(rows, BRONZE_SCHEMA)


# -- splittable parse: array → envelope-JSONL fan-out ------------------------

SPLIT_THRESHOLD_BYTES = 4 << 20  # array files above this are chunked
CHUNK_RECORDS = 100_000  # records per JSONL chunk file (upload granularity)


def _looks_like_array(path: str) -> bool:
    with open(path, "rb") as fh:
        return fh.read(64).lstrip()[:1] == b"["


def _make_envelope_parser():
    """Parse one envelope-JSONL line ``{"f","q","r"}`` into a bronze tuple
    (self-contained closure: ships by value)."""
    import json as _json

    normalize = _make_normalizer()

    def parse_line(line):
        env = _json.loads(line)
        return normalize(env["r"], env["f"], env["q"])

    return parse_line


def _make_envelope_batch_parser():
    """Arrow-batched envelope parser for ``mapInPandas``: one pandas
    DataFrame of bronze columns per input batch of text lines. Batch
    transfer (Arrow) instead of per-row pickling — the envelope parse is
    the ingest hot path. Self-contained closure: ships by value."""
    import pandas as _pd

    parse_line = _make_envelope_parser()
    cols = ["file_id", "seq", "code", "product_name", "attrs", "valid", "reject_reason"]

    def parse_batches(batches):
        for pdf in batches:
            yield _pd.DataFrame(
                [parse_line(v) for v in pdf["value"]], columns=cols
            )

    return parse_batches


def read_bronze_splittable(
    spark: SparkSession,
    paths: list[str],
    scratch_dir,
    threshold_bytes: int = SPLIT_THRESHOLD_BYTES,
    chunk_records: int = CHUNK_RECORDS,
) -> tuple[DataFrame, list[str]]:
    """read_bronze with large-array fan-out — the at-scale parse path.

    A top-level JSON array is ONE parse unit (a 100 GB weekly delivery
    would run on one core — sources/jsonl.py docstring). Array files above
    ``threshold_bytes`` are stream-rewritten (constant memory, the
    reference's ijson discipline: file_splitter.py:117-120) into
    envelope-JSONL chunks in ``scratch_dir``: every line carries its own
    ``(file_id, global_seq, record)``, so the chunks are read back with
    Spark's native newline-splitting text source — parallelism comes from
    ``spark.sql.files.maxPartitionBytes``, NOT the file count, and a
    single huge delivery fans out across every executor while keeping the
    original file identity and the global record order the ordered-upsert
    semantics need.

    A file that fails conversion (malformed JSON) never reaches the
    executors; its id is returned in the second element so the caller can
    apply the whole-file-failure contract (status=failed, file retained).

    Returns ``(bronze_df, conversion_failed_file_ids)``.
    """
    import posixpath
    from pathlib import Path

    from .jsonl import array_to_jsonl

    whole_files: list[str] = []
    chunk_paths: list[str] = []
    conv_failed: list[str] = []
    for p in map(str, paths):
        try:
            is_big_array = os.path.getsize(p) >= threshold_bytes and _looks_like_array(p)
        except OSError:
            is_big_array = False
        if not is_big_array:
            whole_files.append(p)
            continue
        try:
            chunks = array_to_jsonl(
                p,
                scratch_dir,
                records_per_file=chunk_records,
                basename=Path(p).name,
                envelope_file_id=Path(p).name,
            )
            chunk_paths.extend(str(c) for c in chunks)
        except ValueError:  # incl. JSONDecodeError/UnicodeDecodeError
            conv_failed.append(posixpath.basename(p))

    chunk_df = None
    if chunk_paths:
        lines = spark.read.text(chunk_paths)
        # Big batches split naturally into maxPartitionBytes-sized scan
        # tasks; a small batch would land on a handful of partitions and
        # parse on a handful of cores — fan it out (the shuffle is tiny by
        # construction of the branch).
        target = spark.sparkContext.defaultParallelism
        total_bytes = sum(os.path.getsize(p) for p in chunk_paths)
        if total_bytes < 32 << 20 and lines.rdd.getNumPartitions() < target:
            lines = lines.repartition(target)
        chunk_df = lines.mapInPandas(_make_envelope_batch_parser(), BRONZE_SCHEMA)
    if chunk_df is None:
        return read_bronze(spark, whole_files), conv_failed
    if not whole_files:
        return chunk_df, conv_failed
    return read_bronze(spark, whole_files).unionByName(chunk_df), conv_failed

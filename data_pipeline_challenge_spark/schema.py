"""Schemas + status constants for the ingestion engine.

Reference data model (/root/reference/app/models.py:7-47): a ``products``
collection with 2 typed fields + ``extra = "allow"``, and an
``uploaded_files`` ledger with status + counters. Spark mapping (SURVEY.md
§1.3): a fixed "spine" of queried columns plus an ``attrs``
map<string,string> holding every other incoming field JSON-serialized —
stays columnar, schema never drifts, "store everything, query a core".
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- products table ---------------------------------------------------------

# Spine columns mirror app/models.py:8-13; attrs carries the `extra="allow"`
# fields (models.py:15-16) as canonical JSON strings (json.dumps sort_keys),
# so "5" (number) and "\"5\"" (string) remain distinguishable.
PRODUCT_SCHEMA = StructType(
    [
        StructField("code", StringType(), nullable=False),  # PK, leading zeros significant
        StructField("product_name", StringType(), nullable=True),
        StructField("file_id", StringType(), nullable=False),
        StructField("last_modified_at_company", TimestampType(), nullable=False),
        StructField("attrs", MapType(StringType(), StringType()), nullable=False),
    ]
)

# Bronze layer: normalized records before the valid/invalid split, with
# provenance + intra-file ordering (the ordered-bulk-write semantics of
# data_processor.py:101-113 need a deterministic within-file sequence).
BRONZE_SCHEMA = StructType(
    [
        StructField("file_id", StringType(), nullable=False),
        StructField("seq", LongType(), nullable=False),  # 0-based index within file
        StructField("code", StringType(), nullable=True),
        StructField("product_name", StringType(), nullable=True),
        StructField("attrs", MapType(StringType(), StringType()), nullable=True),
        StructField("valid", BooleanType(), nullable=False),
        StructField("reject_reason", StringType(), nullable=True),
    ]
)

# --- ledger table -----------------------------------------------------------

# app/models.py:27-32
STATUS_UPLOADED = "uploaded"
STATUS_PROCESSING = "processing"
STATUS_FAILED = "failed"
STATUS_PROCESSED = "processed"
STATUS_PROCESSED_WITH_ERRORS = "processed_with_errors"
ALL_STATUSES = (
    STATUS_UPLOADED,
    STATUS_PROCESSING,
    STATUS_FAILED,
    STATUS_PROCESSED,
    STATUS_PROCESSED_WITH_ERRORS,
)

# Append-only status-event rows (models.py:35-47 equivalent). The "current"
# ledger is the latest event per file_id (see sources/ledger.py) — counters
# are derived by aggregation, never mutated in place (SURVEY §2 ops 2,7,13,14).
LEDGER_SCHEMA = StructType(
    [
        StructField("file_id", StringType(), nullable=False),
        StructField("filename", StringType(), nullable=False),
        StructField("location", StringType(), nullable=False),
        StructField("uploaded_at", TimestampType(), nullable=False),
        StructField("content_type", StringType(), nullable=True),
        StructField("status", StringType(), nullable=False),
        StructField("total_records", LongType(), nullable=True),
        StructField("records_processed", LongType(), nullable=True),
        StructField("records_failed", LongType(), nullable=True),
        StructField("event_ts", TimestampType(), nullable=False),
    ]
)

SPINE_FIELDS = ("code", "product_name")
DROPPED_EXTERNAL_IDS = ("id", "_id")  # data_processor.py:82-88

"""Custom Spark 4 Python DataSource for the landing JSON-array format.

Exposes the reference's upload format (one top-level JSON array per file,
file_splitter.py:117-120) as a first-class ``spark.read.format(...)``
source:

    spark.dataSource.register(JsonArrayDataSource)
    df = (spark.read.format("json_array")
          .option("paths", "/landing/a.json,/landing/b.json").load())
    # -> (file_id string, seq bigint, value string)  one row per element

Each row carries the element's canonical JSON in ``value`` (parse further
with ``from_json`` / ``parse_json``); ``seq`` preserves in-file order (the
ordered-upsert contract). A malformed file yields its successfully parsed
prefix plus one sentinel row ``(file_id, -1, NULL)`` instead of failing
the Spark job; consumers implement the whole-file-failure contract
(file_splitter.py:74-81) by dropping every row of a file that has a
sentinel — exactly how ``pipeline.ingest_paths`` treats ``MALFORMED_SEQ``
(the streaming parse cannot know a file is bad before its end without
buffering it whole).

Planning: one input partition per file (a top-level JSON array is not
byte-splittable; the splittable at-scale path is the envelope-JSONL
conversion in sources/jsonl.py — this source documents that delta rather
than hiding it). The per-partition read streams the file through the
constant-memory tokenizer, so a huge array never materializes in worker
memory.

Deployment note: unlike the repo's ad-hoc executor closures (which ship
by value), a custom data source is an installed component — Spark's own
model for Python data sources is that the defining package is distributed
to workers (``--py-files`` / image). Classes here are module-level
accordingly.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

MALFORMED_SEQ = -1


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonArrayReader(DataSourceReader):
    def __init__(self, options):
        raw = options.get("paths") or options.get("path") or ""
        self.paths = [p for p in raw.split(",") if p]
        if not self.paths:
            raise ValueError("json_array source requires option 'paths' (comma-separated)")

    def partitions(self):
        return [_FilePartition(p) for p in self.paths]

    def read(self, partition):
        import json
        import posixpath

        from data_pipeline_challenge_spark.sources.jsonl import iter_json_array

        file_id = posixpath.basename(partition.path)
        try:
            for seq, rec in enumerate(iter_json_array(partition.path)):
                yield (
                    file_id,
                    seq,
                    json.dumps(rec, sort_keys=True, separators=(",", ":"), ensure_ascii=False),
                )
        except FileNotFoundError:
            # Replay of a committed range can race the pipeline's own
            # landing GC (a file is deleted after its batch is ingested):
            # the rows were already delivered in the original run, so a
            # vanished file yields nothing rather than wedging every
            # stream restart with an uncaught error. Other OSErrors
            # (EIO, EACCES — transient environment faults, not data
            # errors) still propagate: the malformed⇒failed contract is
            # for bad DATA only, and the consumer's bounded retry owns
            # transient faults.
            return
        except ValueError:
            yield (file_id, MALFORMED_SEQ, None)


class JsonArrayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "json_array"

    def schema(self) -> str:
        return "file_id string, seq bigint, value string"

    def reader(self, schema) -> JsonArrayReader:
        return JsonArrayReader(self.options)

    def simpleStreamReader(self, schema) -> "JsonArrayStreamReader":
        return JsonArrayStreamReader(self.options)


class JsonArrayStreamReader(SimpleDataSourceStreamReader):
    """Streaming flavor: tail a landing directory, one micro-batch per
    newly arrived set of ``*.json`` files.

    Offsets are the sorted list of files already consumed — exactly the
    durable equivalent of the reference's ``file_uploaded`` queue (the
    filename is the message, `{ts}_{token}_{orig}` names make the order
    arrival order). ``readBetweenOffsets`` replays a committed range
    deterministically (the same files re-parse to the same rows), which is
    what gives the stream exactly-once semantics after restart. The
    offset list grows with the directory; production landing zones rotate
    (GC processed files — sources/landing.py), which bounds it.
    """

    def __init__(self, options):
        self.dir = options.get("dir")
        if not self.dir:
            raise ValueError("json_array streaming requires option 'dir'")

    def _listing(self):
        import os

        return sorted(
            f for f in os.listdir(self.dir) if f.endswith(".json")
        )

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _rows_for(self, names):
        # Materialized (not a generator): the simple-reader protocol
        # pickles the batch for driver-side prefetch/replay caching. The
        # simple API is for modest per-batch volumes by design; bulk
        # history goes through the batch reader's per-file partitions.
        import os

        rows = []
        for name in names:
            rows.extend(
                JsonArrayReader({"paths": os.path.join(self.dir, name)}).read(
                    _FilePartition(os.path.join(self.dir, name))
                )
            )
        return rows

    def read(self, start: dict):
        current = self._listing()
        seen = set(start.get("seen", []))  # hoisted: O(n), not O(n²)
        new = [f for f in current if f not in seen]
        end = {"seen": current}
        return self._rows_for(new), end

    def readBetweenOffsets(self, start: dict, end: dict):
        seen = set(start.get("seen", []))
        new = [f for f in end.get("seen", []) if f not in seen]
        return self._rows_for(new)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint; nothing external to ack

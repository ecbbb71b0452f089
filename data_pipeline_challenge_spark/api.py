"""Thin HTTP shim — the reference's API surface over the Spark engine.

Binds the engine's library operators to the reference's four routes with
their exact response shapes and 404 semantics
(/root/reference/app/api/main.py:59-184, app/schemas.py:18-56):

- ``POST /upload``                            → landing.upload + an
  ``uploaded`` ledger event (UploadedFile.insert equivalent)
- ``GET /upload/status/{file_id}``            → ledger.status_of
- ``GET /product/find/code/{code}``           → operators.find.find_by_code
- ``GET /product/find/name/partial/{name}``   → find_name_partial (top 20,
  live regex metacharacters — the reference's injection quirk)
- ``GET /product/find/name/exact/{name}``     → find_name_exact (no limit;
  the reference's code, not its docstring)

Wire-format fidelity notes:

- the find-name responses are ``{"products": [...]}`` with NO search_term
  key: the reference code builds one, but FastAPI's
  ``response_model=MultipleProducts`` strips it before serialization —
  we reproduce the wire shape, not the dead code;
- the ``uploaded`` status serializes as the reference enum VALUE
  ``"uploaded - waiting for processing"`` (models.py:28-33);
- product JSON carries every preserved attr, decoded from the canonical
  attrs map (the reference's ``extra = "allow"`` behavior).

Async processing parity: the reference's ``POST /upload`` returns
immediately and RabbitMQ consumers process in the background
(api/main.py:90-103, mq.py:162-181). ``ApiServer(auto_process=True)``
reproduces that topology in-process — a daemon consumer thread drains the
landing dir on a poll interval (the prefetch-loop analog), so a client
sees ``uploaded - waiting for processing`` flip to ``processed`` without
any extra call. The explicit ``POST /admin/ingest`` (engine extension)
remains for deployments that schedule ingestion externally, and
production-scale deployments run ``streaming/ingest_stream.py`` against
the same landing dir instead.

Stdlib-only (http.server); one Spark driver serves all handler threads.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import unquote

from pyspark.sql import SparkSession

from .operators.find import find_by_code, find_name_exact, find_name_partial
from .pipeline import ProductWarehouse
from .schema import STATUS_FAILED, STATUS_UPLOADED
from .sources.landing import discover_new_files, upload as land_upload

# Internal status → reference wire value (models.py:28-33: only the
# pending state has a decorated enum value).
_WIRE_STATUS = {STATUS_UPLOADED: "uploaded - waiting for processing"}


#: Request bodies are read from the socket in chunks of this size and
#: streamed straight to the landing tmp file — the reference's 1 MiB
#: discipline (api/main.py:73-75). Handler memory stays O(chunk) no
#: matter the upload size.
_UPLOAD_CHUNK = 1 << 20
#: A multipart part's header block larger than this is rejected (422):
#: headers are supposed to be a few lines; an unbounded scan here would
#: reintroduce the whole-body buffer for a hostile body.
_MAX_PART_HEADER = 64 << 10


class _MultipartError(ValueError):
    """Body is not a well-formed multipart/form-data with a ``file``
    field — maps to the reference's 422 upload error contract."""


class _BoundedReader:
    """File-like over ``rfile`` capped at Content-Length, reading at most
    ``chunk`` bytes per call (never the whole body)."""

    def __init__(self, rfile, length: int, chunk: int = _UPLOAD_CHUNK):
        self._rfile = rfile
        self._remaining = max(0, length)
        self._chunk = chunk

    def read(self, n: int = -1) -> bytes:
        if self._remaining <= 0:
            return b""
        want = self._chunk if n is None or n < 0 else min(n, self._chunk)
        data = self._rfile.read(min(want, self._remaining))
        self._remaining -= len(data)
        return data

    def drain(self) -> None:
        while self.read(self._chunk):
            pass


class _PartPayloadReader:
    """File-like over ONE multipart part's payload: yields bytes up to
    (not including) the next ``\\r\\n--boundary``, pulling from the body
    reader as needed. Buffers at most chunk + len(delimiter) bytes.
    ``read(n)`` honors the at-most-n file-object contract (ADVICE r11);
    ``read()``/``read(-1)`` honors the unsized-read contract too (ADVICE
    r12): it accumulates the ENTIRE remaining payload, not one buffered
    chunk. Flushed-but-unreturned payload waits in ``_pending``."""

    def __init__(self, body: _BoundedReader, buf: bytes, delim: bytes):
        self._body = body
        self._buf = buf
        self._delim = delim
        self._pending = b""
        self._done = False
        #: bytes following the closing delimiter's CRLF (i.e. starting at
        #: the boundary token) — lets the caller resume scanning the next
        #: part after skipping a non-file part
        self.tail = b""

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            # unsized read: everything up to the part's closing delimiter
            # (_read_chunk returns b"" only at end-of-part)
            parts = []
            while True:
                chunk = self._read_chunk(-1)
                if not chunk:
                    return b"".join(parts)
                parts.append(chunk)
        return self._read_chunk(n)

    def _read_chunk(self, n: int) -> bytes:
        while True:
            if self._pending:
                if n is None or n < 0 or len(self._pending) <= n:
                    out, self._pending = self._pending, b""
                else:
                    out, self._pending = self._pending[:n], self._pending[n:]
                return out
            if self._done:
                return b""
            k = self._buf.find(self._delim)
            if k >= 0:
                self._pending = self._buf[:k]
                self._done = True
                self.tail = self._buf[k + 2:]
                self._buf = b""
                if not self._pending:
                    return b""
                continue
            # all but a delimiter-sized tail is guaranteed payload (the
            # delimiter may straddle the chunk edge)
            flushable = len(self._buf) - (len(self._delim) - 1)
            if flushable > 0:
                self._pending, self._buf = (
                    self._buf[:flushable],
                    self._buf[flushable:],
                )
                continue
            more = self._body.read()
            if not more:
                raise _MultipartError("unterminated multipart part")
            self._buf += more


def _open_multipart_file_part(body: _BoundedReader, content_type: str):
    """Incrementally scan a multipart/form-data body for the ``file``
    field WITHOUT buffering the body: parts are walked with a bounded
    rolling window, non-file parts are skipped in O(chunk) memory, and
    the file part's payload comes back as a streaming reader the caller
    copies to disk in 1 MiB chunks (the reference streams the upload the
    same way: api/main.py:73-75).

    Returns ``(filename, part_content_type, payload_reader)``.
    Raises _MultipartError when there is no boundary parameter or no
    ``file`` part — the 422 contract."""
    m = re.search(r"boundary=([^;]+)", content_type)
    if not m:
        raise _MultipartError("missing boundary")
    boundary = b"--" + m.group(1).strip().strip('"').encode()
    delim = b"\r\n" + boundary

    buf = body.read()
    while True:
        # 1) locate the next boundary line
        while True:
            i = buf.find(boundary)
            if i >= 0:
                buf = buf[i + len(boundary):]
                break
            keep = len(boundary) - 1
            more = body.read()
            if not more:
                raise _MultipartError("no multipart boundary in body")
            buf = buf[-keep:] + more if keep else more
        # 2) terminal boundary ("--boundary--") before any file part?
        while len(buf) < 2:
            more = body.read()
            if not more:
                raise _MultipartError("truncated multipart body")
            buf += more
        if buf.startswith(b"--"):
            raise _MultipartError("no file part in multipart body")
        # 3) part headers run to the first blank line
        while True:
            j = buf.find(b"\r\n\r\n")
            if j >= 0:
                break
            if len(buf) > _MAX_PART_HEADER:
                raise _MultipartError("part header block too large")
            more = body.read()
            if not more:
                raise _MultipartError("truncated part headers")
            buf += more
        headtext = buf[:j].decode("utf-8", "replace")
        buf = buf[j + 4:]
        reader = _PartPayloadReader(body, buf, delim)
        if 'name="file"' in headtext:
            fn = re.search(r'filename="([^"]*)"', headtext)
            ct = re.search(r"Content-Type:\s*([^\r\n]+)", headtext, re.I)
            return (
                fn.group(1) if fn else "upload.json",
                ct.group(1).strip() if ct else "application/octet-stream",
                reader,
            )
        # skip a non-file part's payload with the same bounded reader —
        # SIZED reads so a hostile oversized form field stays O(chunk)
        # in memory (read() would now accumulate the whole part) — then
        # resume the scan at the boundary token it stopped on
        while reader.read(_UPLOAD_CHUNK):
            pass
        buf = reader.tail


def _product_dict(row) -> dict:
    """Serialize a product row the way the reference serializes a Product
    document: spine fields + every preserved extra attr (decoded from the
    canonical-JSON attrs map)."""
    ts = row["last_modified_at_company"]
    d = {
        "code": row["code"],
        "product_name": row["product_name"],
        "file_id": row["file_id"],
        "last_modified_at_company": ts.isoformat() if ts is not None else None,
    }
    for k, v in (row["attrs"] or {}).items():
        d[k] = json.loads(v)
    return d


class ApiServer:
    """The shim server. ``port=0`` picks a free port (tests)."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse_dir: str | Path,
        landing_dir: str | Path,
        host: str = "127.0.0.1",
        port: int = 0,
        auto_process: bool = False,
        poll_interval: float = 0.5,
        max_attempts: int = 3,
    ):
        self.warehouse = ProductWarehouse(spark, warehouse_dir)
        self.landing_dir = Path(landing_dir)
        self._httpd = ThreadingHTTPServer((host, port), _make_handler(self))
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: threading.Thread | None = None
        self._auto_process = auto_process
        self._poll_interval = poll_interval
        self._max_attempts = max_attempts
        # file_id -> (attempts_so_far, monotonic time of next allowed try)
        self._retry_state: dict[str, tuple[int, float]] = {}
        # fid -> frozenset of merge keys (codes) or None=undeterminable;
        # filled only in the isolation path to let healthy files with
        # DISJOINT keys merge ahead of a backing-off file (key-aware
        # head-of-line, ADVICE r7). Pruned alongside _retry_state.
        self._codes_cache: dict[str, frozenset | None] = {}
        self._stop_evt = threading.Event()
        self._consumer: threading.Thread | None = None

    # -- lifecycle -----------------------------------------------------------

    def start(self) -> "ApiServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        if self._auto_process:
            self._consumer = threading.Thread(target=self._consume_loop, daemon=True)
            self._consumer.start()
        return self

    def stop(self) -> None:
        self._stop_evt.set()
        if self._consumer:
            self._consumer.join(timeout=60)
        if self._thread:  # shutdown() blocks forever unless serve_forever ran
            self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    def _consume_loop(self) -> None:
        """The queue-consumer analog: drain pending landed files each tick.

        Failure classification (the bounded middle between the reference's
        two extremes):

        - **malformed JSON** is a deterministic data error: the pipeline
          marks the file ``failed`` on its FIRST attempt and retains it
          (file_splitter.py:74-81 semantics) — no retry, it can never
          succeed;
        - **any other exception** (a transient Spark hiccup — OOM, torn
          external read) is retried up to ``max_attempts`` times with
          exponential backoff, then marked terminally ``failed``. The
          reference instead nack-requeues an unhandled consumer exception
          and redelivers FOREVER (mq.py:162-181, prefetch-1: one poison
          message wedges the consumer permanently); bounding the retries
          keeps the transient-recovery behavior without the wedge.

        After a batch-level failure the tick degrades to per-file
        ingestion, so the failure is attributed to the file that caused it
        and healthy files in the same batch still process.
        """
        import sys
        import traceback

        # Startup janitor: resolve 'uploaded' events orphaned by a crash
        # in the append-then-rename publish window of a PREVIOUS process
        # (finish surviving tmp renames; fail aged eventless uploads) so
        # no status is stuck pending forever. In-flight uploads of THIS
        # process are protected by the age guard.
        try:
            self.warehouse.reap_orphaned_uploads(self.landing_dir)
        except Exception:  # noqa: BLE001 - janitor must not kill the consumer
            traceback.print_exc(file=sys.stderr)
        while not self._stop_evt.wait(self._poll_interval):
            self._consume_once()

    def _consume_once(self) -> None:
        """One consumer tick (factored out so tests can drive it directly)."""
        import sys
        import time as _time
        import traceback

        led = self.warehouse.ledger
        if not self._retry_state:
            # Fast path: whole pending batch in one idempotent job.
            try:
                self.warehouse.ingest(self.landing_dir)
                return
            except Exception:  # noqa: BLE001 - consumer must outlive bad rounds
                traceback.print_exc(file=sys.stderr)
        # Isolation path: a batch failed (now or in a previous tick) —
        # process one file at a time so the failure is attributed to the
        # poison file and everything else still drains.
        try:
            pending = discover_new_files(
                self.landing_dir, led.current() if led.exists() else None
            )
        except Exception:  # noqa: BLE001
            traceback.print_exc(file=sys.stderr)
            return
        # Prune retry entries whose file is no longer pending (removed
        # out-of-band, or ingested/terminally marked by another process):
        # a leaked entry would pin this consumer in the slow per-file
        # isolation path forever, since only a local ingest/mark pops it.
        pending_ids = {Path(p).name for p in pending}
        for fid in list(self._retry_state):
            if fid not in pending_ids:
                self._retry_state.pop(fid, None)
        for fid in list(self._codes_cache):
            if fid not in pending_ids:
                self._codes_cache.pop(fid, None)
        # Landing names are timestamp-prefixed, so sorted order IS upload
        # order. A file in backoff holds the files behind it ONLY when
        # they share merge keys: skipping a key-sharing file ahead would
        # merge newer data first and a later successful retry of the
        # older file would then overwrite it — cross-batch last-wins must
        # follow upload order per code, as it does within a batch
        # (__ford). Files whose key sets are provably DISJOINT from every
        # held file commute with them, so they merge ahead and a single
        # poison upload no longer stalls every other tenant's data
        # (ADVICE r7). A file whose keys can't be determined (unreadable
        # mid-backoff) conservatively holds everything behind it. The
        # hold is bounded either way: retries exhaust in max_attempts
        # ticks and the poison file goes terminal, draining the queue —
        # the reference's prefetch-1 consumer semantics, minus its
        # infinite-redelivery wedge.
        held_codes: set[str] = set()
        held_unknown = False  # a held file with undeterminable keys
        for path in sorted(pending):
            fid = Path(path).name
            n_prev, next_try = self._retry_state.get(fid, (0, 0.0))
            backing_off = _time.monotonic() < next_try
            if backing_off or held_unknown or held_codes:
                codes = self._file_codes(fid, path)
                # An EMPTY known key set (e.g. a malformed file, which
                # ingest terminal-fails without upserting) cannot overlap
                # anything — not even an unknown held set — so it
                # commutes past held_unknown too.
                if backing_off or codes is None or (
                    codes & held_codes
                ) or (held_unknown and codes):
                    # Hold this file too; its keys join the held set so
                    # anything overlapping IT also waits.
                    if codes is None:
                        held_unknown = True
                    else:
                        held_codes |= codes
                    continue
            try:
                self.warehouse.ingest_paths([path])
                self._retry_state.pop(fid, None)
                self._codes_cache.pop(fid, None)
            except Exception:  # noqa: BLE001
                traceback.print_exc(file=sys.stderr)
                n = n_prev + 1
                if n >= self._max_attempts:
                    self._retry_state.pop(fid, None)
                    self._codes_cache.pop(fid, None)
                    self._mark_failed_terminal(fid, path)
                else:
                    backoff = self._poll_interval * (2 ** (n - 1))
                    self._retry_state[fid] = (n, _time.monotonic() + backoff)
                    # Later files this tick only proceed if disjoint.
                    codes = self._file_codes(fid, path)
                    if codes is None:
                        held_unknown = True
                    else:
                        held_codes |= codes

    def _file_codes(self, fid: str, path: str) -> frozenset | None:
        """Merge-key set (``code`` values of records that would upsert) of
        one landing file, parsed DRIVER-side and cached per fid for the
        life of its pending-ness. Only consulted in the isolation path, so
        the cost is one bounded parse per blocked/queued file, not per
        tick. None = undeterminable (unreadable right now) → callers must
        assume overlap."""
        if fid in self._codes_cache:
            return self._codes_cache[fid]
        try:
            # Driver-side parse is memory-bounded: past the whole-parse
            # bound, JSONL files STREAM their exact key set line-by-line
            # (VERDICT r8 #8 — a large upload with disjoint keys no
            # longer holds every unrelated tenant) and only array
            # containers stay unknown (conservative hold).
            if Path(path).stat().st_size > self._WHOLE_PARSE_MAX_BYTES:
                codes = self._stream_codes_bounded(path)
            else:
                payload = Path(path).read_bytes()
                from .sources.json_ingest import parse_bytes

                codes = frozenset(
                    t[2] for t in parse_bytes(path, payload) if t[5]  # ok rows
                )
        except Exception:  # noqa: BLE001 - unreadable → unknown, hold queue
            codes = None
        self._codes_cache[fid] = codes
        return codes

    # Bound for loading a whole payload into driver memory to parse its
    # key set; larger files stream (JSONL) or stay unknown (array).
    _WHOLE_PARSE_MAX_BYTES = 64 << 20
    _STREAM_MAX_CODES = 1 << 18  # key-SET size bound (driver memory)
    _STREAM_MAX_LINE_CHARS = 32 << 20  # one-giant-line JSONL guard
    _STREAM_CHUNK_CHARS = 1 << 20  # probe read granularity (test-tunable)

    def _stream_codes_bounded(self, path: str) -> frozenset | None:
        """EXACT merge-key set of a LARGE landing file in bounded driver
        memory. A sampled/partial key set would be unsound here — a
        later upload disjoint from the sample could still overlap the
        unseen keys and merge ahead of a dependent upsert — so largeness
        is handled by STREAMING the exact set, never truncating it.

        Parse-parity with ingest is load-bearing (ADVICE r9): a file the
        probe judges malformed (empty key set, commutes past every hold)
        but ingest parses as valid would upsert keys the probe never
        declared, breaking per-code upload ordering. So the probe
        replays ``json_ingest.parse_file``'s exact decisions, streamed:
        the array sniff lstrips the WHOLE text (not a 64-byte prefix),
        and JSONL lines break on ``str.splitlines`` boundaries (\\v, \\f,
        \\x1c-\\x1e, \\x85, \\u2028, \\u2029 too — not just \\n/\\r), through
        the same normalizer and the same strict-utf-8 decode. A
        malformed line / bad UTF-8 therefore makes the file malformed
        exactly IFF ingest treats it so — zero upserts — and its key set
        is EMPTY, commuting with everything. Array containers above the
        bound stay unknown (``json.loads`` would hold the whole
        document), as do degenerate shapes (one giant line, more than
        ``_STREAM_MAX_CODES`` distinct keys): a conservative hold, never
        a wrong merge."""
        import json as _json

        from .sources.json_ingest import _make_normalizer

        normalize = _make_normalizer()
        codes: set = set()
        seq = 0
        try:
            # newline='' : no translation — str.splitlines below is the
            # ONLY boundary authority, exactly as in parse_file.
            with open(path, encoding="utf-8", errors="strict", newline="") as fh:
                # Array sniff, ingest semantics: text.lstrip().startswith('[')
                # — stream past leading whitespace (any amount, not 64
                # bytes) to the first non-whitespace character.
                first = fh.read(1)
                while first and first.isspace():
                    first = fh.read(1)
                if first == "[":
                    return None  # array container: conservative hold
                buf = first
                while True:
                    chunk = fh.read(self._STREAM_CHUNK_CHARS)
                    if chunk:
                        buf += chunk
                    parts = buf.splitlines(keepends=True)
                    buf = ""
                    if chunk and parts:
                        last = parts[-1]
                        # Hold back an unterminated final line, and a
                        # trailing '\r' that may be half of '\r\n'.
                        if last == last.splitlines()[0] or last.endswith("\r"):
                            buf = parts.pop()
                            if len(buf) > self._STREAM_MAX_LINE_CHARS:
                                return None
                    for part in parts:
                        line = part.splitlines()[0]
                        if len(line) > self._STREAM_MAX_LINE_CHARS:
                            return None
                        if not line.strip():
                            continue
                        try:
                            t = normalize(_json.loads(line), "probe", seq)
                        except ValueError:
                            return frozenset()  # malformed: ingest upserts nothing
                        seq += 1
                        if t[5]:
                            codes.add(t[2])
                        if len(codes) > self._STREAM_MAX_CODES:
                            return None
                    if not chunk:
                        break
        except UnicodeDecodeError:
            return frozenset()  # malformed file: zero upserts
        return frozenset(codes)

    def _mark_failed_terminal(self, file_id: str, path: str) -> None:
        """Exhausted retries: terminal ``failed`` event; the landing file
        is retained for inspection (same contract as malformed files)."""
        import datetime as dt
        import sys
        import traceback

        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        try:
            self.warehouse.ledger.append(
                [
                    {
                        "file_id": file_id,
                        "filename": file_id.split("_", 2)[-1],
                        "location": str(path),
                        "uploaded_at": now,
                        "content_type": "application/json",
                        "status": STATUS_FAILED,
                        "total_records": 0,
                        "records_processed": 0,
                        "records_failed": 0,
                    }
                ],
                # Evaluated inside the ledger's write locks: a concurrent
                # process may have ingested this file successfully while
                # this consumer was backing off — an unconditional append
                # would commit a later-timestamped 'failed' over its
                # 'processed' (landing file already GC'd, so the janitor
                # could never resurrect it).
                skip_if_terminal=True,
            )
        except Exception:  # noqa: BLE001 - next tick will retry the mark
            traceback.print_exc(file=sys.stderr)
            self._retry_state[file_id] = (self._max_attempts - 1, 0.0)

    # -- route bodies (plain dict in / dict+status out) ----------------------

    def do_upload(self, filename: str, payload: bytes, content_type: str):
        import datetime as dt

        # UploadedFile.insert() equivalent: the pending ledger event that
        # makes GET /upload/status work before processing runs. It MUST be
        # appended before the file becomes visible in the landing dir —
        # otherwise the background consumer can discover/process/gc the
        # file first, and this later-timestamped 'uploaded' event would win
        # the latest-per-file fold, leaving the status pending forever.
        def ledger_insert(lf) -> None:
            self.warehouse.ledger.append(
                [
                    {
                        "file_id": lf.file_id,
                        "filename": lf.filename,
                        "location": lf.location,
                        "uploaded_at": dt.datetime.fromtimestamp(
                            lf.uploaded_at, dt.timezone.utc
                        ).replace(tzinfo=None),
                        "content_type": lf.content_type,
                        "status": STATUS_UPLOADED,
                        "total_records": 0,
                        "records_processed": 0,
                        "records_failed": 0,
                    }
                ]
            )

        lf = land_upload(
            payload,
            self.landing_dir,
            orig_name=filename,
            content_type=content_type,
            before_visible=ledger_insert,
        )
        return 200, {
            "message": "File uploaded successfully!",
            "filename": filename,
            "file_id": lf.file_id,
            "status_url": f"http://{self.host}:{self.port}/upload/status/{lf.file_id}",
        }

    def do_status(self, file_id: str):
        s = self.warehouse.ledger.status_of(file_id)
        if s is None:
            return 404, {"detail": "There is no file with this id"}
        return 200, {
            "filename": s["filename"],
            "status": _WIRE_STATUS.get(s["status"], s["status"]),
            "uploaded_at": s["uploaded_at"].isoformat() if s["uploaded_at"] else None,
            "total_records": s["total_records"],
            "records_processed": s["records_processed"],
            "records_failed": s["records_failed"],
        }

    def do_find_code(self, code: str):
        rows = find_by_code(self.warehouse.products(), code).collect()
        if not rows:
            return 404, {"detail": "There is no product with this code."}
        return 200, _product_dict(rows[0])

    def do_find_partial(self, term: str):
        rows = find_name_partial(self.warehouse.products(), term).collect()
        return 200, {"products": [_product_dict(r) for r in rows]}

    def do_find_exact(self, term: str):
        rows = find_name_exact(self.warehouse.products(), term).collect()
        return 200, {"products": [_product_dict(r) for r in rows]}

    def do_ingest(self):
        report = self.warehouse.ingest(self.landing_dir)
        return 200, {"files": report.files, "total_processed": report.total_processed}


def _make_handler(server: ApiServer):
    routes_get = (
        (re.compile(r"^/upload/status/([^/]+)$"), server.do_status),
        (re.compile(r"^/product/find/code/([^/]+)$"), server.do_find_code),
        (re.compile(r"^/product/find/name/partial/([^/]+)$"), server.do_find_partial),
        (re.compile(r"^/product/find/name/exact/([^/]+)$"), server.do_find_exact),
    )

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, status: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 - http.server contract
            for pat, fn in routes_get:
                m = pat.match(self.path)
                if m:
                    # one retry, defense-in-depth: products and ledger state
                    # are version-published with two-version retention, so a
                    # torn read now needs a scan spanning TWO background
                    # publishes; if that ever happens, the second resolution
                    # pins the fresh version
                    for attempt in range(2):
                        try:
                            result = fn(unquote(m.group(1)))
                            break
                        except Exception as exc:  # noqa: BLE001
                            if attempt == 1:  # pragma: no cover - defensive
                                self._send(500, {"detail": str(exc)})
                                return
                    self._send(*result)
                    return
            self._send(404, {"detail": "Not Found"})

        def do_POST(self):  # noqa: N802 - http.server contract
            # The body is NEVER buffered whole: it streams from the socket
            # to the landing tmp file in _UPLOAD_CHUNK pieces (the
            # reference's 1 MiB shutil.copyfileobj discipline,
            # api/main.py:73-75) — handler memory is O(chunk) for a
            # multi-GB weekly delivery.
            length = int(self.headers.get("Content-Length") or 0)
            body = _BoundedReader(self.rfile, length, _UPLOAD_CHUNK)
            try:
                if self.path == "/upload":
                    ctype = self.headers.get("Content-Type", "")
                    try:
                        if ctype.startswith("multipart/form-data"):
                            fn, part_ct, payload = _open_multipart_file_part(body, ctype)
                            result = server.do_upload(fn, payload, part_ct)
                        else:
                            # raw-body convenience: filename via X-Filename
                            fn = self.headers.get("X-Filename", "upload.json")
                            result = server.do_upload(fn, body, ctype or "application/json")
                    except _MultipartError:
                        self._send(
                            422,
                            {
                                "detail": "There was an error while uploading "
                                "your file. Please try again."
                            },
                        )
                        return
                    finally:
                        body.drain()  # socket hygiene: consume trailers
                    self._send(*result)
                elif self.path == "/admin/ingest":
                    body.drain()
                    self._send(*server.do_ingest())
                else:
                    body.drain()
                    self._send(404, {"detail": "Not Found"})
            except Exception as exc:  # pragma: no cover - defensive
                self._send(500, {"detail": str(exc)})

    return Handler

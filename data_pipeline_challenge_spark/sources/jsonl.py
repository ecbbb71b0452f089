"""Array-JSON → chunked JSONL conversion — the splittable landing format.

SURVEY §2 op 4 / §4: the reference streams a multi-MB JSON *array* with
ijson for bounded memory, but a top-level array is a single parse unit —
in Spark a multiLine JSON array is ONE split no matter its size, so a
100 GB weekly delivery would hang on one core. The at-scale fix is
convert-on-landing: stream-rewrite the array into JSONL chunk files, each
independently parseable, so the bronze parse fans out.

The converter is an incremental scanner (stdlib only, constant memory
like ijson) for arrays of OBJECTS — the reference's input contract
(file_splitter.py:117-120 iterates ``item`` objects). It runs in the
upload shim or as a per-file executor task. Each element is decoded with
``json.JSONDecoder.raw_decode`` — the C-backed scanner — so the stream
converts at near-``json.loads`` throughput instead of a per-character
Python loop; this stage is the single sequential pass over a delivery, so
its throughput bounds end-to-end landing speed.
"""

from __future__ import annotations

import json
from pathlib import Path

_WS = " \t\r\n"


def iter_json_array(
    path: str | Path,
    chunk_bytes: int = 1 << 20,
    max_record_bytes: int = 256 << 20,
    yield_raw: bool = False,
):
    """Yield top-level objects of a JSON array-of-objects file
    incrementally (constant memory). Raises ValueError on malformed input
    or non-object elements — the whole-file failure contract of the
    reference parse.

    ``max_record_bytes`` bounds the decode buffer: a malformed element is
    indistinguishable from a truncated one until more input arrives, so
    without a cap a malformed record early in a huge file would buffer the
    rest of the file before failing.

    ``yield_raw=True`` yields ``(obj, raw_text)`` pairs, where
    ``raw_text`` is the element's VERBATIM source slice (validated by the
    same ``raw_decode`` — it is the exact text the decoder consumed for
    ``obj``). Lets the JSONL rewriter splice the source bytes instead of
    re-serializing every record (guide §1.2: don't recompute what you
    already have).
    """
    decoder = json.JSONDecoder()
    with open(path, "r", encoding="utf-8") as fh:  # strict utf-8, like .decode()
        buf = fh.read(chunk_bytes)
        pos = 0

        def refill() -> bool:
            nonlocal buf, pos
            chunk = fh.read(chunk_bytes)
            if not chunk:
                return False
            if pos > 0:  # drop consumed prefix: constant memory
                buf = buf[pos:]
                pos = 0
            buf += chunk
            return True

        def skip_ws() -> None:
            nonlocal pos
            while True:
                while pos < len(buf) and buf[pos] in _WS:
                    pos += 1
                if pos < len(buf) or not refill():
                    return

        skip_ws()
        if pos >= len(buf) or buf[pos] != "[":
            raise ValueError("top-level JSON is not an array")
        pos += 1
        while True:
            skip_ws()
            if pos >= len(buf):
                raise ValueError("unterminated JSON array")
            c = buf[pos]
            if c == "]":
                pos += 1
                break
            if c == ",":
                pos += 1
                continue
            if c != "{":
                raise ValueError(f"array element is not an object (saw {c!r})")
            while True:
                start = pos
                try:
                    obj, pos = decoder.raw_decode(buf, pos)
                    break
                except ValueError:
                    # Truncated or malformed — only more input can tell.
                    if len(buf) - pos > max_record_bytes or not refill():
                        raise ValueError("unterminated or malformed JSON array") from None
            yield (obj, buf[start:pos]) if yield_raw else obj
        while True:
            skip_ws()
            if pos < len(buf):
                raise ValueError("trailing content after array")
            if not refill():
                break


def array_to_jsonl(
    src: str | Path,
    dst_dir: str | Path,
    records_per_file: int = 50_000,
    basename: str | None = None,
    envelope_file_id: str | None = None,
) -> list[Path]:
    """Stream-convert an array-JSON file to numbered JSONL chunk files.

    Returns the chunk paths. Each chunk is an independent parse unit for
    read_bronze (one executor task per chunk).

    With ``envelope_file_id``, every line is wrapped as
    ``{"f": file_id, "q": global_seq, "r": record}`` — record identity and
    order ride IN the line, so chunk files are consumable by Spark's
    native newline-splitting text reader with NO per-file task mapping:
    any split of any chunk yields correctly-attributed records. This is
    what makes the converted delivery fully splittable at scale (a single
    100 GB chunk still fans out into maxPartitionBytes-sized tasks)."""
    src = Path(src)
    dst = Path(dst_dir)
    dst.mkdir(parents=True, exist_ok=True)
    stem = basename or src.name.rsplit(".", 1)[0]
    out_paths: list[Path] = []
    out = None
    n_in_file = 0
    idx = 0
    seq = 0
    # Splice the VERBATIM source slice of each element instead of
    # re-serializing the parsed object: raw_decode already validated the
    # slice, and json.loads(raw) == json.loads(json.dumps(obj)) for every
    # valid element (duplicate keys collapse last-wins in BOTH paths,
    # numerals/escapes normalize at the downstream parse). The one case
    # where the splice would break the line-delimited contract — an
    # element whose source text spans lines (pretty-printed input) —
    # falls back to the old re-serialize. Cuts the single-core
    # conversion's per-record work to parse + write (guide §1.2; ~35%
    # measured on the bench's 50k delivery, plans/r19/ab notes).
    prefix = (
        f'{{"f":{json.dumps(envelope_file_id, ensure_ascii=False)},"q":'
        if envelope_file_id is not None
        else None
    )
    try:
        for rec, raw in iter_json_array(src, yield_raw=True):
            if out is None or n_in_file >= records_per_file:
                if out:
                    out.close()
                p = dst / f"{stem}.part{idx:05d}.jsonl"
                out = open(p, "w", encoding="utf-8")
                out_paths.append(p)
                idx += 1
                n_in_file = 0
            if "\n" in raw or "\r" in raw:
                raw = json.dumps(rec, ensure_ascii=False)
            if prefix is not None:
                line = f'{prefix}{seq},"r":{raw}}}'
            else:
                line = raw
            out.write(line + "\n")
            n_in_file += 1
            seq += 1
    finally:
        if out:
            out.close()
    return out_paths

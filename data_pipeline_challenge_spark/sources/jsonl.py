"""Array-JSON → chunked JSONL conversion — the splittable landing format.

SURVEY §2 op 4 / §4: the reference streams a multi-MB JSON *array* with
ijson for bounded memory, but a top-level array is a single parse unit —
in Spark a multiLine JSON array is ONE split no matter its size, so a
100 GB weekly delivery would hang on one core. The at-scale fix is
convert-on-landing: stream-rewrite the array into JSONL chunk files, each
independently parseable, so the bronze parse fans out.

The converter is a pure-Python incremental tokenizer (stdlib only,
constant memory like ijson) for arrays of OBJECTS — the reference's input
contract (file_splitter.py:117-120 iterates ``item`` objects). It runs in
the upload shim or as a per-file executor task.
"""

from __future__ import annotations

import json
from pathlib import Path


def iter_json_array(path: str | Path, chunk_bytes: int = 1 << 20):
    """Yield top-level objects of a JSON array-of-objects file
    incrementally (constant memory). Raises ValueError on malformed input
    or non-object elements — the whole-file failure contract of the
    reference parse."""
    buf = bytearray()
    depth = 0
    in_string = False
    escape = False
    seen_open = False
    closed = False
    with open(path, "rb") as fh:
        while True:
            chunk = fh.read(chunk_bytes)
            if not chunk:
                break
            for byte in chunk:
                c = chr(byte)
                if closed:
                    if not c.isspace():
                        raise ValueError("trailing content after array")
                    continue
                if not seen_open:
                    if c == "[":
                        seen_open = True
                    elif not c.isspace():
                        raise ValueError("top-level JSON is not an array")
                    continue
                if depth == 0:
                    # between elements: only whitespace, commas, '{' or ']'
                    if c == "{":
                        depth = 1
                        buf.append(byte)
                    elif c == "]":
                        closed = True
                    elif c == "," or c.isspace():
                        continue
                    else:
                        raise ValueError(f"array element is not an object (saw {c!r})")
                    continue
                buf.append(byte)
                if in_string:
                    if escape:
                        escape = False
                    elif c == "\\":
                        escape = True
                    elif c == '"':
                        in_string = False
                    continue
                if c == '"':
                    in_string = True
                elif c in "{[":
                    depth += 1
                elif c in "}]":
                    depth -= 1
                    if depth == 0:
                        yield json.loads(bytes(buf))
                        buf.clear()
    if not closed:
        raise ValueError("unterminated JSON array")


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
    try:
        for rec in iter_json_array(src):
            if out is None or n_in_file >= records_per_file:
                if out:
                    out.close()
                p = dst / f"{stem}.part{idx:05d}.jsonl"
                out = open(p, "w", encoding="utf-8")
                out_paths.append(p)
                idx += 1
                n_in_file = 0
            if envelope_file_id is not None:
                line = json.dumps(
                    {"f": envelope_file_id, "q": seq, "r": rec}, ensure_ascii=False
                )
            else:
                line = json.dumps(rec, ensure_ascii=False)
            out.write(line + "\n")
            n_in_file += 1
            seq += 1
    finally:
        if out:
            out.close()
    return out_paths

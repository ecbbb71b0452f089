#!/usr/bin/env python3
"""Record per-round query source fingerprints for verification freshness.

For every ``CORRECTNESS_r{N}.json`` at the repo root, find the commit that
ADDED it; the code the driver verified that round is that commit's PARENT
(the round's final code commit — the driver commits artifacts on top).
Extract every registered query's source fingerprint at that revision
(``plans/_source_hash.query_hashes`` over ``git show rev:path`` snapshots)
and write the full map to ``tools/verified_query_hashes.json``::

    {"r01": {"q1_pricing_summary": "<sha256>", ...}, ...}

``plans/registry._driver_verified_names`` then counts a green driver row
from round N only when the round-N fingerprint equals the current one, so
edited queries re-sort first in the driver's capped sample (VERDICT r7 #1).

Run this at the START of each round, before editing any query — the
current HEAD is exactly the code the latest CORRECTNESS artifact attests
to. Re-running is idempotent (history is reconstructed from git every
time); ``tests/test_registry_freshness.py`` fails if the file falls behind
the CORRECTNESS artifacts.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from data_pipeline_challenge_spark.plans._source_hash import PACKAGE, query_hashes

OUT = ROOT / "tools" / "verified_query_hashes.json"


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=ROOT, check=True, capture_output=True, text=True
    ).stdout


def _round_revs() -> dict[str, str]:
    """round tag ('r07') -> revision whose code the artifact attests to."""
    revs: dict[str, str] = {}
    for p in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        m = re.match(r"CORRECTNESS_(r\d+)\.json", p.name)
        if not m:
            continue
        tag = m.group(1)
        log = _git(
            "log", "--format=%H", "--diff-filter=A", "--", p.name
        ).split()
        if not log:
            continue
        add_commit = log[-1]
        try:
            parent = _git("rev-parse", f"{add_commit}^").strip()
        except subprocess.CalledProcessError:
            parent = add_commit
        revs[tag] = parent
    return revs


def _files_at(rev: str) -> dict[str, str]:
    """Package-relative path -> text for every package .py at ``rev``."""
    paths = [
        line
        for line in _git("ls-tree", "-r", "--name-only", rev).splitlines()
        if line.startswith(f"{PACKAGE}/") and line.endswith(".py")
    ]
    files: dict[str, str] = {}
    for path in paths:
        rel = path[len(PACKAGE) + 1 :]
        try:
            files[rel] = _git("show", f"{rev}:{path}")
        except subprocess.CalledProcessError:
            continue
    return files


def main() -> None:
    out: dict[str, dict[str, str]] = {}
    for tag, rev in sorted(_round_revs().items()):
        hashes = query_hashes(_files_at(rev))
        out[tag] = hashes
        print(f"{tag}: rev {rev[:12]}  {len(hashes)} queries fingerprinted")
    OUT.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

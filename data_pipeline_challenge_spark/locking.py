"""Cross-process file locking — the warehouse writers' mutual exclusion.

One implementation shared by every read-merge-publish critical section
(ledger appends + state compaction, products merges + compaction): an
exclusive ``flock`` held for the duration of the ``with`` block. A second
writer process BLOCKS (not fails), and because each critical section
re-reads the published state inside the lock, serialized writers fold
each other's work instead of clobbering the publish symlink. flock dies
with the process, so a crashed writer can never wedge the warehouse.
No-op on platforms without ``fcntl``.
"""

from __future__ import annotations

import contextlib
import os
from pathlib import Path


def file_lock(lock_path: str | Path):
    """Context manager: exclusive ``flock`` on ``lock_path`` (created if
    absent). Distinct open file descriptions conflict even within one
    process, so two store instances in the same process serialize too."""
    try:
        import fcntl
    except ImportError:  # pragma: no cover - non-POSIX fallback

        @contextlib.contextmanager
        def _noop():
            yield

        return _noop()

    @contextlib.contextmanager
    def _locked():
        path = Path(lock_path)
        path.parent.mkdir(parents=True, exist_ok=True)
        fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    return _locked()

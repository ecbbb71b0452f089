"""Shared retention for symlink-published versioned tables.

Every version-published table here (products, ledger state, ledger
history, online compaction) follows the same publish protocol: write
``<prefix>.v{N}`` whole, atomically repoint the symlink, then delete old
versions. Retention's contract is *a reader that resolved the symlink (or
the no-symlink fallback) just before this publish must keep scanning its
pinned version safely*, so exactly two directories must survive a
publish: the NEW version and the directory readers could have been
pinned to immediately before it (the previously-published target — or,
when no symlink existed, the newest complete version the fallback reader
ranks first).

Ranking "the two newest complete versions" instead — the protocol's
previous form — is subtly wrong: a crash in this protocol's own window
(between the version rename and the symlink replace) leaves a COMPLETE
but never-published higher version. The next publish would then rank
that remnant above the still-live previous version and delete the very
directory a pinned reader is scanning. Keeping {new, previously-read}
by identity instead of by rank is immune: stale remnants — torn or
complete — were never readable (symlink readers resolve the link;
fallback readers only exist when there is no symlink, and then the
previously-read dir IS the newest complete version), so they are deleted
outright.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path
from typing import Iterable


def swap_symlink(state: Path, target_name: str) -> None:
    """Atomically repoint ``state`` (the published-table symlink) at a
    sibling directory: create a ``.swap`` symlink beside it, then
    ``os.replace`` over the live name — readers resolve strictly the old
    or the new target, never a missing or half-made link. The ONE shared
    implementation of the publish commit step (products, ledger state,
    ledger history, stream sinks, online compaction) — five hand-rolled
    copies of a crash-safety-critical dance drift; one does not."""
    swap = state.parent / f"{state.name}.swap"
    if swap.is_symlink() or swap.exists():
        swap.unlink()
    swap.symlink_to(target_name)
    os.replace(swap, state)


def retire_versions(
    all_versions: Iterable[Path], keep: Iterable[Path | None]
) -> None:
    """Delete every version directory not in ``keep``.

    ``keep`` is {the just-published dir, the previously-read dir (None if
    the table had no readable version before this publish)}. Writers are
    serialized by the table's writer lock, so nothing outside ``keep``
    can be in-flight; everything else is a retired or crash-stale dir no
    reader can reach."""
    keep_set = {Path(p).resolve() for p in keep if p is not None}
    for p in all_versions:
        if Path(p).resolve() in keep_set:
            continue
        shutil.rmtree(p, ignore_errors=True)

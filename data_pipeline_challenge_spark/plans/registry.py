"""Declared query inventory — the contract surface the driver verifies.

Each :class:`QueryDef` pairs a Spark DataFrame builder with an equivalent
ANSI-SQL oracle (DuckDB dialect) over the same parquet tables. The driver
runs both at sf=0.01 and compares row count + schema + order-insensitive
value hash, so:

- every computed column is aliased identically on both sides;
- float aggregates are rounded on both sides (summation order differs
  between engines — rounding makes the comparison stable);
- LIMIT queries carry a deterministic ORDER BY on a unique key;
- no output column depends on the session timezone (epoch arithmetic /
  NTZ-derived dates only).

Queries whose semantics SQL cannot express (hash-seeded MinHash/SimHash
sketches, LSH bucketing) set ``oracle=None`` → the driver records a weaker
rows-only check, which is the honest label for them.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, QueryDef] = {}


def query(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name, fn, oracle, doc or (fn.__doc__ or ""), tags, bench)
        return fn

    return deco


import functools


@functools.lru_cache(maxsize=1)
def _driver_verified_names() -> frozenset[str]:
    """Names with a FRESH green driver row in some past round. Cached for
    the process lifetime: the CORRECTNESS artifacts only change between
    driver rounds (i.e. between processes), and the natural
    queries_callables()/oracles()/bench_queries() sequence re-derived
    the identical frozenset from a full glob+parse three times.

    The driver's per-round correctness run is capped (50 queries), so
    enumeration order decides what gets checked. Rather than a
    hand-maintained list that goes stale each round (the round-3 failure
    mode), read the driver's own ``CORRECTNESS_r*.json`` artifacts at the
    repo root: a query counts as verified iff some round recorded it with
    no error and matching rows (hash too, when an oracle was present).

    **Freshness (VERDICT r7 #1):** a green row from round N only counts if
    the query's source fingerprint at round N (recorded in
    ``tools/verified_query_hashes.json`` by
    ``tools/update_verified_hashes.py``; covers the query fn, its
    same-module constants, and one level of package callees — see
    ``plans/_source_hash.py``) equals the CURRENT fingerprint. A query
    whose definition changed since its last green round therefore drifts
    back to unverified and re-sorts first, so the next driver sample
    re-checks the NEW semantics instead of trusting a row that attests to
    the old ones. Rounds missing from the hash file (tool not yet re-run)
    fall back to name-only matching — the pre-r8 behavior — so a lapse
    degrades gracefully instead of churning the whole inventory.
    """
    import json

    from ._source_hash import current_query_hashes

    root = Path(__file__).resolve().parents[2]
    try:
        round_hashes: dict[str, dict[str, str]] = json.loads(
            (root / "tools" / "verified_query_hashes.json").read_text()
        )
    except (OSError, ValueError):
        round_hashes = {}
    current = current_query_hashes()

    seen: set[str] = set()
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        tag = p.stem.replace("CORRECTNESS_", "")  # e.g. "r07"
        recorded = round_hashes.get(tag)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if recorded is not None and recorded.get(name) != current.get(name):
                # Definition drifted since this round (or fingerprints are
                # missing for it) — this green row no longer attests to the
                # current semantics.
                continue
            if row.get("err") == "no_oracle":
                # rows-only-by-design query whose weaker check already ran;
                # require at least one row so an errored/empty later run
                # re-prioritizes (ADVICE r4)
                rows = row.get("spark_rows")
                if isinstance(rows, int) and rows > 0:
                    seen.add(name)
            elif not row.get("err") and row.get("rows_match") and row.get(
                "hash_match", True
            ):
                seen.add(name)
    return frozenset(seen)


@functools.lru_cache(maxsize=1)
def _edited_since_latest_round() -> frozenset[str]:
    """Names whose CURRENT fingerprint differs from the latest recorded
    round's (or that the latest round has no fingerprint for) — i.e.
    queries new or semantically edited since the most recent CORRECTNESS
    artifact. With the transitive-closure fingerprint the unverified set
    can exceed the driver's 50-query sample cap, so ordering must spend
    the cap on the queries whose semantics are most likely untested:
    just-edited ones first, then the rest of the unverified backlog
    (which rotates in over subsequent rounds as earlier samples go
    green)."""
    import json

    from ._source_hash import current_query_hashes

    root = Path(__file__).resolve().parents[2]
    try:
        round_hashes: dict[str, dict[str, str]] = json.loads(
            (root / "tools" / "verified_query_hashes.json").read_text()
        )
    except (OSError, ValueError):
        return frozenset()
    if not round_hashes:
        return frozenset()
    latest = round_hashes[max(round_hashes)]
    current = current_query_hashes()
    return frozenset(
        name for name, h in current.items() if latest.get(name) != h
    )


def all_queries() -> dict[str, QueryDef]:
    # Import side-effect modules on first use so the registry is populated.
    from . import (  # noqa: F401
        corpus,
        events,
        relational,
        relational_deep,
        similarity,
        stats,
        text,
    )

    # The driver's capped sample takes queries in enumeration order, so:
    # (1) queries edited since the latest verified round (their green
    # rows, if any, attest to OLD semantics), then (2) the rest of the
    # unverified backlog, then (3) verified queries for re-confirmation.
    verified = _driver_verified_names()
    edited = _edited_since_latest_round()
    ordered: dict[str, QueryDef] = {}
    for name, qd in _REGISTRY.items():
        if name in edited and name not in verified:
            ordered[name] = qd
    for name, qd in _REGISTRY.items():
        if name not in verified:
            ordered.setdefault(name, qd)
    for name, qd in _REGISTRY.items():
        ordered.setdefault(name, qd)
    return ordered


def queries_callables() -> dict[str, QueryFn]:
    return {name: qd.fn for name, qd in all_queries().items()}


def oracles() -> dict[str, str]:
    return {name: qd.oracle for name, qd in all_queries().items() if qd.oracle is not None}


def bench_queries() -> dict[str, QueryDef]:
    return {name: qd for name, qd in all_queries().items() if qd.bench}
